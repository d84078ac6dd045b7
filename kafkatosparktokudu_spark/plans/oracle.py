"""DuckDB oracle SQL — one entry per query in plans.queries.

Rules that keep value-hashes identical between engines:

- Every double aggregation uses DECIMAL arithmetic (exact in both engines)
  and casts the result to DOUBLE at the end — bit-identical regardless of
  partial-aggregation order.
- No division or rounding on decimals (engines differ); multiply by a
  decimal constant instead (e.g. *0.001 as DECIMAL(4,3)).
- Integer SUMs are cast to BIGINT (DuckDB returns HUGEINT).
- Small-int scalar functions are cast to INTEGER where Spark returns int.
- Column aliases match the Spark side exactly (the driver sorts columns by
  name before hashing).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# CDC fold oracle: replays /root/repo/fixtures/ogg_changes.jsonl with the
# same last-write-wins sort key the Spark fold uses (current_ts # zero-padded
# arrival pos), via arg_max ... FILTER — semantically identical to Spark's
# max-over-(order,value)-struct aggregation.
# ---------------------------------------------------------------------------
_FIXTURE = "/root/repo/fixtures/ogg_changes.jsonl"
_NOW = "2024-06-01 00:00:00"

_CDC_VALID = f"""
    raw AS (
        SELECT * FROM read_json('{_FIXTURE}',
            format='newline_delimited',
            columns={{"table": 'VARCHAR', "op_type": 'VARCHAR',
                      "current_ts": 'VARCHAR', "pos": 'BIGINT',
                      "after": 'MAP(VARCHAR,VARCHAR)'}},
            ignore_errors=true)
    ),
    valid AS (
        SELECT lower(string_split("table", '.')[2]) AS tab_name,
               after['ID'][1] AS id, op_type, current_ts,
               current_ts || '#' || lpad(CAST(pos AS VARCHAR), 12, '0') AS ord,
               after
        FROM raw
        WHERE "table" IS NOT NULL
          AND after IS NOT NULL
          AND after['ID'][1] IS NOT NULL
    )
"""


def _cdc_fold_sql(table: str, cols: dict[str, str]) -> str:
    """Final-state SQL for one target table; cols = {name: duckdb_type}
    excluding the id/convention columns."""
    col_exprs = ",\n               ".join(
        f"TRY_CAST(arg_max(after['{c.upper()}'][1], ord)"
        f" FILTER (WHERE op_type <> 'D' AND after['{c.upper()}'][1] IS NOT NULL)"
        f" AS {t}) AS {c}"
        for c, t in cols.items()
    )
    return f"""
        WITH {_CDC_VALID}
        SELECT id,
               {col_exprs},
               CASE WHEN arg_max(op_type, ord) = 'D' THEN '1' ELSE '0' END AS delete_state,
               '{_NOW}' AS time_stamp
        FROM valid WHERE tab_name = '{table}'
        GROUP BY id
    """


# shared fragments
_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,6))"
)

ORACLE_SQL: dict[str, str] = {
    "cdc_emp_state": _cdc_fold_sql(
        "emp",
        {
            "name": "VARCHAR",
            "salary": "DOUBLE",
            "dept_id": "INTEGER",
            "active": "BOOLEAN",
            "hire_ts": "TIMESTAMP",
        },
    ),
    "cdc_dept_state": _cdc_fold_sql("dept", {"dname": "VARCHAR", "budget": "FLOAT"}),
    # streaming path must agree with the batch fold bit-for-bit
    "cdc_stream_emp_state": _cdc_fold_sql(
        "emp",
        {
            "name": "VARCHAR",
            "salary": "DOUBLE",
            "dept_id": "INTEGER",
            "active": "BOOLEAN",
            "hire_ts": "TIMESTAMP",
        },
    ),
    "cdc_pub_event": f"""
        WITH {_CDC_VALID}
        SELECT id, tab_name AS name,
               max(replace(current_ts, 'T', ' ')) AS current_ts,
               '0' AS delete_state,
               '0' AS his_delete_state,
               '{_NOW}' AS time_stamp
        FROM valid
        GROUP BY id, tab_name
    """,
    "q01_sync_report": """
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(value) AS avg_value
        FROM events GROUP BY event_type
    """,
    "q02_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM({_DISC_PRICE}) AS DECIMAL(27,6)) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST({_DISC_PRICE} AS DECIMAL(30,8))
                        * CAST(1 + l_tax AS DECIMAL(8,6))) AS DECIMAL(27,6)) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1997-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q03_filter_project": f"""
        SELECT l_orderkey, l_linenumber,
               CAST({_DISC_PRICE} AS DOUBLE) AS net_price,
               concat_ws('/', l_returnflag, l_linestatus) AS flag_status
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 00:00:00'
          AND l_returnflag IN ('R', 'A')
          AND l_quantity > 30
    """,
    "q04_revenue_by_nation": f"""
        SELECT r_name, n_name,
               CAST(CAST(SUM({_DISC_PRICE}) AS DECIMAL(27,6)) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "q05_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
        )
        GROUP BY o_orderpriority
    """,
    "q06_customer_order_coverage": """
        WITH w AS (
            SELECT c_nationkey, COUNT(*) AS n_with_orders
            FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_nationkey
        ),
        wo AS (
            SELECT c_nationkey, COUNT(*) AS n_without_orders
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_nationkey
        )
        SELECT n_name,
               COALESCE(w.n_with_orders, 0) AS n_with_orders,
               COALESCE(wo.n_without_orders, 0) AS n_without_orders
        FROM nation
        LEFT JOIN w  ON n_nationkey = w.c_nationkey
        LEFT JOIN wo ON n_nationkey = wo.c_nationkey
    """,
    "q07_top_customers": """
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 10
    """,
    "q08_top_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    "q09_running_user_totals": """
        SELECT user_id, event_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_value,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_event_type,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS INTEGER) AS seq
        FROM events
    """,
    "q10_rollup_region_nation": """
        SELECT COALESCE(r_name, '(all)') AS r_name,
               COALESCE(n_name, '(all)') AS n_name,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "q11_cube_events": """
        SELECT COALESCE(event_type, '(all)') AS event_type,
               CAST(COALESCE(dow, -1) AS INTEGER) AS dow,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM (
            SELECT event_type, date_part('dow', ts) + 1 AS dow, value
            FROM events
        )
        GROUP BY CUBE (event_type, dow)
    """,
    "q12_setops_segments": """
        WITH building AS (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ),
        rich AS (
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        )
        SELECT c_custkey, 'only_building' AS tag
        FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM rich)
        UNION ALL
        SELECT c_custkey, 'both' AS tag
        FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich)
        UNION ALL
        SELECT c_custkey, 'only_rich' AS tag
        FROM (SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM building)
    """,
    "q13_distinct_users": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
    "q14_scalar_functions": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(month(o_orderdate) AS INTEGER) AS o_month,
               upper(o_orderstatus) AS status_upper,
               substring(o_orderpriority, 1, 1) AS prio_code,
               CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
               concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
               CAST(CAST(o_totalprice AS DECIMAL(12,2))
                    * CAST(0.001 AS DECIMAL(4,3)) AS DOUBLE) AS price_k,
               o_orderkey % 7 AS key_mod7,
               abs(o_totalprice - 1000) AS abs_diff
        FROM orders
    """,
    "q15_json_extract": """
        SELECT event_type,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               COUNT(CASE WHEN k > 50 THEN 1 END) AS n_high,
               CAST(MIN(k) AS INTEGER) AS min_k,
               CAST(MAX(k) AS INTEGER) AS max_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        GROUP BY event_type
    """,
    "q16_balance_buckets": """
        SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                    WHEN c_acctbal < 3000 THEN 'low'
                    WHEN c_acctbal < 7000 THEN 'mid'
                    ELSE 'high' END AS balance_bucket,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        GROUP BY 1
    """,
    "q17_sessionize": """
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, event_id, ts,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_idx
            FROM flagged
        )
        SELECT user_id, session_idx,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end
        FROM sessions
        GROUP BY user_id, session_idx
    """,
    "q18_latest_event_per_user": """
        SELECT user_id, event_id, ts, event_type, value
        FROM (
            SELECT *,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    "q19_hourly_event_rollup": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "q20_pivot_returnflag": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN l_returnflag = 'A'
                             THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_a,
               CAST(SUM(CASE WHEN l_returnflag = 'N'
                             THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_n,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                             THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_r
        FROM lineitem
        GROUP BY l_linestatus
    """,
    "q21_brand_supply_stats": """
        SELECT p_brand,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(DISTINCT s_suppkey) AS n_suppliers,
               COUNT(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY p_brand
    """,
}
