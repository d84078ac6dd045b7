"""Declarative data-quality constraint checks (Deequ / dbt-test style).

A pipeline feeding a 100 TB training run needs the same gate a warehouse
does: key uniqueness, referential integrity, null/range/domain contracts —
asserted IN the engine, as one report, before anything downstream trusts
the data. The reference pipeline validates per-record shape only
(ConsumerMain.scala's malformed-record drop); this module is the
table-level complement.

Check algebra (all declarative, all single-pass per check class):

- ``NotNull`` / ``InRange`` / ``AcceptedValues`` — row predicates. All
  row checks against the SAME table share ONE scan/agg (conditional
  sums), so adding a 10th column contract costs zero extra reads.
- ``Unique`` — duplicate-key ROW count via one groupBy(keys) + one
  re-agg (map-side partial both times; never a self-join).
- ``ForeignKey`` — orphan count via one left join against the parent's
  distinct keys + conditional agg (AQE broadcasts small parents; at
  scale it's a plain shuffle join keyed on the FK).

``constraint_report`` returns one row per check:
``(check_id, check_type, table_name, target, n_violations, n_rows,
passed)`` — the whole report is one DataFrame plan (union of the
per-class plans), so an orchestrator can sink/alert on it like any
other query result.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class NotNull:
    table: str
    column: str


@dataclass(frozen=True)
class InRange:
    """Violations = non-null values outside [lo, hi] (nulls are
    ``NotNull``'s business)."""

    table: str
    column: str
    lo: float
    hi: float


@dataclass(frozen=True)
class AcceptedValues:
    table: str
    column: str
    values: tuple[str, ...]


@dataclass(frozen=True)
class Unique:
    """Violations = rows whose key tuple occurs more than once (0 for a
    clean key; 2+ whenever any dup exists)."""

    table: str
    columns: tuple[str, ...]


@dataclass(frozen=True)
class ForeignKey:
    """Violations = child rows with a NON-NULL key absent from the
    parent (null FKs are ``NotNull``'s business)."""

    table: str
    column: str
    parent: str
    parent_key: str


@dataclass(frozen=True)
class Freshness:
    """Timeliness contract: violations = 1 if the table's newest
    ``ts_column`` value is older than ``max_lag_seconds`` before
    ``as_of`` (an ISO timestamp string — passed explicitly, never
    wall-clock, so checks are deterministic and replayable), else 0.
    An empty/all-null table is maximally stale (violation)."""

    table: str
    ts_column: str
    max_lag_seconds: int
    as_of: str


Check = NotNull | InRange | AcceptedValues | Unique | ForeignKey | Freshness

_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("check_id", T.StringType(), False),
        T.StructField("check_type", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("target", T.StringType(), False),
        T.StructField("n_violations", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("passed", T.BooleanType(), False),
    ]
)


def _row_condition(c: Check) -> F.Column:
    if isinstance(c, NotNull):
        return F.col(c.column).isNull()
    if isinstance(c, InRange):
        col = F.col(c.column)
        return col.isNotNull() & ((col < F.lit(c.lo)) | (col > F.lit(c.hi)))
    if isinstance(c, AcceptedValues):
        col = F.col(c.column)
        return col.isNotNull() & ~col.isin(*c.values)
    raise TypeError(f"not a row check: {c}")


def check_id(c: Check) -> str:
    if isinstance(c, NotNull):
        return f"not_null:{c.table}.{c.column}"
    if isinstance(c, InRange):
        return f"in_range:{c.table}.{c.column}"
    if isinstance(c, AcceptedValues):
        return f"accepted:{c.table}.{c.column}"
    if isinstance(c, Unique):
        return f"unique:{c.table}.{','.join(c.columns)}"
    if isinstance(c, Freshness):
        return f"fresh:{c.table}.{c.ts_column}"
    return f"fk:{c.table}.{c.column}->{c.parent}.{c.parent_key}"


def _finish(df: DataFrame) -> DataFrame:
    return df.select(
        "check_id",
        "check_type",
        "table_name",
        "target",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def constraint_report(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    checks: list[Check],
) -> DataFrame:
    """One report row per check; see module docstring for the plan shape
    of each check class."""
    for c in checks:
        refs = [c.table] + ([c.parent] if isinstance(c, ForeignKey) else [])
        for t in refs:
            if t not in tables:
                raise ValueError(
                    f"check {check_id(c)} references unknown table {t!r} "
                    f"(have: {sorted(tables)})"
                )
    parts: list[DataFrame] = []

    # --- row checks: one shared scan+agg per table -----------------------
    by_table: dict[str, list[Check]] = {}
    for c in checks:
        if isinstance(c, (NotNull, InRange, AcceptedValues)):
            by_table.setdefault(c.table, []).append(c)
    for tname, tchecks in by_table.items():
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.when(_row_condition(c), 1).otherwise(0)).alias(f"v{i}")
            for i, c in enumerate(tchecks)
        ]
        one = tables[tname].agg(*aggs)
        rows = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(check_id(c)).alias("check_id"),
                            F.lit(type(c).__name__.lower()).alias("check_type"),
                            F.lit(c.table).alias("table_name"),
                            F.lit(c.column).alias("target"),
                            F.col(f"v{i}").alias("n_violations"),
                            F.col("n_rows").alias("n_rows"),
                        )
                        for i, c in enumerate(tchecks)
                    ]
                )
            ).alias("r")
        ).select("r.*")
        parts.append(_finish(rows))

    # --- unique / fk: one small plan each --------------------------------
    for c in checks:
        if isinstance(c, Unique):
            grouped = (
                tables[c.table]
                .groupBy(*c.columns)
                .agg(F.count(F.lit(1)).alias("n"))
            )
            one = grouped.agg(
                F.coalesce(
                    F.sum(F.when(F.col("n") > 1, F.col("n"))), F.lit(0)
                ).alias("n_violations"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("n_rows"),
            )
            parts.append(
                _finish(
                    one.select(
                        F.lit(check_id(c)).alias("check_id"),
                        F.lit("unique").alias("check_type"),
                        F.lit(c.table).alias("table_name"),
                        F.lit(",".join(c.columns)).alias("target"),
                        "n_violations",
                        "n_rows",
                    )
                )
            )
        elif isinstance(c, Freshness):
            one = tables[c.table].agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.max(F.col(c.ts_column).cast("timestamp")).alias("_mx"),
            )
            stale = F.col("_mx").isNull() | (
                F.col("_mx")
                < F.lit(c.as_of).cast("timestamp")
                - F.expr(f"INTERVAL {int(c.max_lag_seconds)} SECONDS")
            )
            parts.append(
                _finish(
                    one.select(
                        F.lit(check_id(c)).alias("check_id"),
                        F.lit("freshness").alias("check_type"),
                        F.lit(c.table).alias("table_name"),
                        F.lit(c.ts_column).alias("target"),
                        F.when(stale, F.lit(1)).otherwise(F.lit(0)).alias(
                            "n_violations"
                        ),
                        "n_rows",
                    )
                )
            )
        elif isinstance(c, ForeignKey):
            # Join-free key census (r14, the dq06 fk_integrity_report
            # recipe — guide §2.4): child keys tagged (1,0) unionAll
            # parent keys tagged (0,1), one groupBy(key) with map-side
            # partial agg, then a 1-row rollup. The old shape (parent
            # distinct + left join + conditional agg) shuffled the child
            # by the FK and degraded to a multi-pass shuffle join once
            # the parent outgrew the broadcast threshold. Semantics
            # carry exactly: n_rows = Σ child tags (every child row is
            # one census contribution, NULL keys included in the NULL
            # group); orphans = Σ child tags over non-null keys no
            # parent key matches (NULL parent keys can never match —
            # they stay in the NULL group).
            census = (
                tables[c.table]
                .select(
                    F.col(c.column).alias("_k"),
                    F.lit(1).cast("bigint").alias("_c"),
                    F.lit(0).cast("bigint").alias("_p"),
                )
                .unionAll(
                    tables[c.parent].select(
                        F.col(c.parent_key).alias("_k"),
                        F.lit(0).cast("bigint").alias("_c"),
                        F.lit(1).cast("bigint").alias("_p"),
                    )
                )
                .groupBy("_k")
                .agg(F.sum("_c").alias("_cc"), F.sum("_p").alias("_pc"))
            )
            one = census.agg(
                F.coalesce(F.sum("_cc"), F.lit(0)).alias("n_rows"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("_k").isNotNull() & (F.col("_pc") == 0),
                            F.col("_cc"),
                        )
                    ),
                    F.lit(0),
                ).alias("n_violations"),
            )
            parts.append(
                _finish(
                    one.select(
                        F.lit(check_id(c)).alias("check_id"),
                        F.lit("foreignkey").alias("check_type"),
                        F.lit(c.table).alias("table_name"),
                        F.lit(f"{c.column}->{c.parent}.{c.parent_key}").alias(
                            "target"
                        ),
                        "n_violations",
                        "n_rows",
                    )
                )
            )

    if not parts:
        return spark.createDataFrame([], _REPORT_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def column_profile(
    tables: dict[str, DataFrame],
    columns: dict[str, dict[str, str]],
    mean_decimal: str = "decimal(12,2)",
) -> DataFrame:
    """Deequ-style column profiling — the observe side of the quality
    gate: per (table, column), completeness / cardinality / distribution
    metrics in LONG format ``(table_name, column_name, metric, value)``
    with value always DOUBLE (counts are < 2^53, so the cast is exact).

    ``columns``: {table: {column: 'numeric' | 'string'}}.
    numeric → n_rows, n_nulls, n_distinct, min, max, mean
    string  → n_rows, n_nulls, n_distinct, min_len, max_len, avg_len
    mean/avg_len are DECIMAL-exact sums divided once in double (oracle-
    stable); min/max are exact. ``mean_decimal`` sets the cast for the
    mean's sum — the default 2dp money grade keeps the scaled integer
    under 2^53 at any realistic table size (single-rounding on the
    decimal→double cast, the functions/exact.py rule); raise the scale
    for finer-grained columns and lower it for astronomically large sums.

    Scale shape: ONE agg per table covers every profiled column (shared
    scan). The exact count_distinct per column makes Spark plan an Expand
    (input duplicated per distinct column) — the right call at audit
    scales; for 100 TB continuous profiling swap in
    approx_count_distinct (HLL) per column, which collapses the Expand
    back to one pass. Everything else is map-side partial aggregation.
    """
    if not columns or not any(columns.values()):
        raise ValueError("column_profile needs at least one (table, column)")
    for t in columns:
        if t not in tables:
            raise ValueError(f"profile references unknown table {t!r}")
    parts: list[DataFrame] = []
    for tname, cols in columns.items():
        aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n_rows")]
        metric_cols: list[tuple[str, str, str]] = []  # (column, metric, agg alias)
        for i, (cname, kind) in enumerate(cols.items()):
            col = F.col(cname)
            per: list[tuple[str, F.Column]] = [
                ("n_nulls", F.sum(F.when(col.isNull(), 1).otherwise(0))),
                ("n_distinct", F.count_distinct(col)),
            ]
            if kind == "numeric":
                per += [
                    ("min", F.min(col).cast("double")),
                    ("max", F.max(col).cast("double")),
                    (
                        "mean",
                        F.sum(col.cast(mean_decimal)).cast("double")
                        / F.count(col),
                    ),
                ]
            elif kind == "string":
                ln = F.length(col)
                per += [
                    ("min_len", F.min(ln).cast("double")),
                    ("max_len", F.max(ln).cast("double")),
                    ("avg_len", F.sum(ln).cast("double") / F.count(col)),
                ]
            else:
                raise ValueError(f"unknown column kind {kind!r}")
            for m, expr in per:
                alias = f"__m{i}_{m}"
                aggs.append(expr.alias(alias))
                metric_cols.append((cname, m, alias))
        one = tables[tname].agg(*aggs)
        structs = []
        for cname, m, alias in metric_cols:
            structs.append(
                F.struct(
                    F.lit(cname).alias("column_name"),
                    F.lit(m).alias("metric"),
                    F.col(alias).cast("double").alias("value"),
                )
            )
            if m == "n_nulls":  # emit n_rows once per column alongside
                structs.append(
                    F.struct(
                        F.lit(cname).alias("column_name"),
                        F.lit("n_rows").alias("metric"),
                        F.col("__n_rows").cast("double").alias("value"),
                    )
                )
        rows = one.select(F.explode(F.array(*structs)).alias("r")).select(
            F.lit(tname).alias("table_name"), "r.*"
        )
        parts.append(rows)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def distribution_drift(
    baseline: DataFrame, current: DataFrame, columns: list[str]
) -> DataFrame:
    """Categorical distribution drift between a baseline and a current
    slice — the train/serve-skew monitor every production ML pipeline
    runs: per column, the total variation distance between the two value
    distributions plus the single worst-drifting value. All arithmetic is
    exact integer ppm (share = n·10^6 div total), so the report is
    oracle-stable with no float aggregation at all.

    Returns one row per column: ``(column_name, n_baseline, n_current,
    n_values, tvd_ppm, top_value, top_diff_ppm)`` — tvd_ppm =
    Σ|share_a − share_b| // 2 over values (0 = identical, 1e6 =
    disjoint); top_value picks the max |diff| with value-DESC tie-break
    (Spark struct-max == SQL ORDER BY diff DESC, val DESC).

    Scale shape: per column — two hash aggs (one per slice, map-side
    partial), a full-outer join on the value domain (categorical, small),
    and one final agg. Row counts never leave the cluster; nulls are
    folded to a '<null>' sentinel so both engines join them as a value.
    """
    if not columns:
        raise ValueError("distribution_drift needs at least one column")
    parts: list[DataFrame] = []
    for c in columns:

        def _counts(df: DataFrame, alias: str) -> DataFrame:
            return (
                df.select(
                    F.coalesce(F.col(c).cast("string"), F.lit("<null>")).alias(
                        "val"
                    )
                )
                .groupBy("val")
                .agg(F.count(F.lit(1)).alias(alias))
            )

        j = (
            _counts(baseline, "n_a")
            .join(_counts(current, "n_b"), "val", "full_outer")
            .select(
                "val",
                F.coalesce("n_a", F.lit(0)).alias("n_a"),
                F.coalesce("n_b", F.lit(0)).alias("n_b"),
            )
        )
        tot = j.agg(
            F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
        )
        # Empty-slice contract: an empty slice must SIGNAL, not go NULL
        # (the fresh-deployment / dead-feed case is exactly when drift
        # monitoring matters). One side empty, other not → sentinel
        # tvd_ppm = 1000000 (total shift); both empty → 0.
        s = j.crossJoin(F.broadcast(tot)).select(
            "val",
            "n_a",
            "n_b",
            "ta",
            "tb",
            F.abs(
                F.when(
                    F.col("ta") > 0,
                    F.expr("n_a * CAST(1000000 AS BIGINT) div ta"),
                ).otherwise(F.lit(0))
                - F.when(
                    F.col("tb") > 0,
                    F.expr("n_b * CAST(1000000 AS BIGINT) div tb"),
                ).otherwise(F.lit(0))
            ).alias("d"),
        )
        one = s.agg(
            F.max("ta").alias("n_baseline"),
            F.max("tb").alias("n_current"),
            F.count(F.lit(1)).cast("int").alias("n_values"),
            F.expr("sum(d) div 2").alias("tvd_raw"),
            F.max(F.struct(F.col("d"), F.col("val"))).alias("top"),
        )
        parts.append(
            one.select(
                F.lit(c).alias("column_name"),
                F.coalesce(F.col("n_baseline"), F.lit(0))
                .cast("bigint")
                .alias("n_baseline"),
                F.coalesce(F.col("n_current"), F.lit(0))
                .cast("bigint")
                .alias("n_current"),
                "n_values",
                F.coalesce(
                    F.when(
                        (F.col("n_baseline") > 0) != (F.col("n_current") > 0),
                        F.lit(1000000),
                    ).otherwise(F.col("tvd_raw")),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("tvd_ppm"),
                F.col("top.val").alias("top_value"),
                F.col("top.d").cast("bigint").alias("top_diff_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def robust_outlier_report(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 3,
) -> DataFrame:
    """Median/MAD robust outlier gate (the Hampel-filter rule): per group,
    an outlier is a row with |x - median| > k * MAD. Mean/stddev gates
    break exactly when outliers are present (the outliers inflate the
    spread that is supposed to catch them); median and MAD have a 50%
    breakdown point, the standard robust alternative for data-quality
    monitoring.

    Exactness contract: the interpolated medians are pinned to
    DECIMAL(18,4) (round-then-cast, the q65 rule), deviations are
    decimal subtractions, and the gate compares decimals against
    k * MAD — no float boundary can flip a count across engines.

    Scale shape: two keyed median aggregations (sort-based within group)
    + two joins back on the group key (all four stages share one hash
    partitioning) + one final agg. Nothing global; groups are processed
    independently, so skew follows the group sizes.
    """
    med = df.groupBy(*group_cols).agg(
        F.round(F.median(value_col), 4).cast("decimal(18,4)").alias("__med")
    )
    dev = df.join(med, group_cols).withColumn(
        "__adev",
        F.abs(F.col(value_col).cast("decimal(18,4)") - F.col("__med")),
    )
    # median INPUT cast to double on both engines: DuckDB's median on
    # DECIMAL is quantile_disc (lower middle value), on DOUBLE it
    # interpolates like Spark — the double cast of a 4-dp decimal is the
    # same IEEE rounding on both sides, and round(4)+decimal re-pin
    # absorbs the interpolation ulp.
    mad = dev.groupBy(*group_cols).agg(
        F.round(F.median(F.col("__adev").cast("double")), 4)
        .cast("decimal(18,4)")
        .alias("__mad")
    )
    return (
        dev.join(mad, group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("__adev") > k * F.col("__mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.max("__med").cast("double").alias("med"),
            F.max("__mad").cast("double").alias("mad"),
        )
    )


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 20,
) -> DataFrame:
    """Shuffle-key skew diagnosis — the operational pre-check before any
    big groupBy/join on ``key_cols``: the ``top_n`` heaviest keys with
    their exact integer-ppm share of all rows and their x100 ratio to
    the uniform per-key mean (200 = this key carries 2x its fair share;
    the classic salting trigger is >> 100).

    Plan shape: one groupBy(keys) count, a broadcast of the two global
    scalars (total rows, distinct keys — both from the SAME aggregated
    frame, no second scan), and TakeOrdered for the top-N — no global
    sort, no second pass over the data.
    """
    counts = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").cast("bigint").alias("_total"),
        F.count(F.lit(1)).cast("bigint").alias("_n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            F.expr(
                "CAST(CAST(n_rows AS DECIMAL(38,0)) * 1000000"
                " div _total AS BIGINT)"
            ).alias("share_ppm"),
            # DECIMAL(38,0) product: n_rows * _n_keys alone exceeds int64
            # at the very scale this report targets (a ~1e8-row hot key
            # over ~1e9 distinct keys is ~1e19) — under ANSI mode the
            # BIGINT product would abort the job. The 38-digit decimal
            # holds any product of two int64s; the quotient is floored
            # identically, and DuckDB's HUGEINT oracle arithmetic agrees.
            F.expr(
                "CAST(CAST(n_rows AS DECIMAL(38,0)) * _n_keys * 100"
                " div _total AS BIGINT)"
            ).alias("skew_x100"),
        )
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top_n)
    )


def rolling_zscore_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    lookback: int = 20,
    min_window: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection — the streaming-metrics
    shape of data-quality monitoring (flag a value that breaks out of its
    own recent distribution), computed batch-side over keyed ROWS frames:
    for each event, mean/std over the previous ``lookback`` events of the
    same key (strictly BEFORE the current row — no self-inclusion bias),
    flag |z| >= threshold.

    Exactness contract (the q89 DECIMAL convention): the value enters as
    DECIMAL(12,2); windowed sums of v and v² are exact decimals, and the
    z-score algebra is arranged so every intermediate stays exact until
    one final double expression:

        num    = n·v − Σv              (exact decimal)
        varnum = n·Σv² − (Σv)²         (exact decimal, >= 0 by C-S)
        z      = num · sqrt((n−1) / (n · varnum))   (double, round 6)

    Both engines evaluate the identical double sequence, so the rounded
    z hash-matches. Decimal headroom is sized for |v| <= ~2e6 and
    lookback <= 99 (casts below: sums (12,2), squares (18,4)) — ANSI
    overflow fails loudly beyond.

    Scale shape: ONE keyed window (hash-partition by key, sort by ts
    within partition) computing both sums in the same frame pass; no
    join, no global sort, no driver state. 100 TB: partition count
    follows the key cardinality; a hot key is bounded by its own event
    count, and the frame is O(lookback) per row.
    """
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(key_col)
        .orderBy(ts_col, "event_id")
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col).cast("decimal(12,2)")
    d = events.select(
        "event_id", F.col(key_col), F.col(ts_col), v.alias("_v")
    ).select(
        "event_id",
        key_col,
        ts_col,
        "_v",
        F.count("_v").over(w).cast("decimal(2,0)").alias("_n"),
        F.sum("_v").over(w).cast("decimal(12,2)").alias("_s1"),
        F.sum(F.col("_v") * F.col("_v")).over(w).cast("decimal(18,4)").alias("_s2"),
    ).filter(F.col("_n") >= min_window)
    num = (F.col("_n") * F.col("_v")) - F.col("_s1")
    varnum = (F.col("_n") * F.col("_s2")) - (F.col("_s1") * F.col("_s1"))
    z = F.round(
        num.cast("double")
        * F.sqrt(
            (F.col("_n").cast("double") - 1.0)
            / (F.col("_n").cast("double") * varnum.cast("double"))
        ),
        6,
    )
    return (
        d.withColumn("zscore", F.when(varnum.cast("double") > 0, z))
        .filter(F.abs(F.col("zscore")) >= threshold)
        .select(
            "event_id",
            key_col,
            F.col("_v").cast("double").alias("value"),
            F.col("_n").cast("bigint").alias("n_window"),
            "zscore",
        )
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact grouped WEIGHTED median (q96): the smallest value v in each
    group with ``2·cumweight(v) >= total_weight`` — the lower weighted
    median, the robust location estimate quantity-weighted price/metric
    reporting needs (an unweighted median over line items answers a
    different question than "the price at which half the VOLUME trades").

    Exactness: values and weights enter as DECIMAL(12,2); per-value
    weight sums, the running sum and the doubling are all exact decimal
    integer arithmetic — no float compare anywhere; the returned median
    is the value's one-time decimal→double cast. Ties in ``value_col``
    are aggregated BEFORE the running sum, so the result is
    order-independent by construction.

    Scale shape: one (group, value) hash aggregation, then ONE keyed
    window (hash-partition by group, sort by value within partition)
    computing running and total weight in the same pass, then a final
    group agg. No join, no global sort, no driver state.
    """
    from pyspark.sql import Window as W

    v = F.col(value_col).cast("decimal(12,2)")
    w = F.col(weight_col).cast("decimal(12,2)")
    per_value = (
        df.select(F.col(group_col), v.alias("_v"), w.alias("_w"))
        .groupBy(group_col, "_v")
        .agg(F.sum("_w").cast("decimal(18,2)").alias("_wv"))
    )
    win = W.partitionBy(group_col).orderBy("_v")
    cum = F.sum("_wv").over(win.rowsBetween(W.unboundedPreceding, 0))
    tot = F.sum("_wv").over(
        win.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        per_value.select(
            F.col(group_col),
            "_v",
            cum.alias("_cum"),
            tot.alias("_tot"),
        )
        .groupBy(group_col)
        .agg(
            F.min(
                F.when(F.col("_cum") * 2 >= F.col("_tot"), F.col("_v"))
            )
            .cast("double")
            .alias("w_median"),
            F.max("_tot").cast("double").alias("total_weight"),
        )
    )


def fk_integrity_report(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit (dq06): for each declared
    ``(name, child, child_key, parent, parent_key)`` relation report
    child row count, NULL-key rows, ORPHAN rows (non-null key absent
    from the parent) and parent coverage (distinct parent keys actually
    referenced, in ppm) — the cross-TABLE data-quality check next to
    dq01's per-column constraints; run on every CDC sink to catch
    out-of-order parent/child application.

    Scale shape per relation (r13 restructure, guide §2.4/§1.2): ONE
    key census — child keys tagged (1,0) unioned with parent keys
    tagged (0,1), groupBy(key) summing both tags (map-side partial agg:
    the exchange carries one narrow (key, c_cnt, p_cnt) row per
    distinct key per map task, never a payload), then a 1-row
    conditional rollup derives every report column. Each table is
    scanned ONCE per relation and there are NO joins — the previous
    shape (anti-join for orphans + distinct/semi-join for coverage +
    three scalar-count cross joins) scanned the child 3x and the
    parent 3x and degraded to multi-pass shuffle joins whenever the
    parent outgrew the broadcast threshold. NULL semantics carry
    unchanged: all NULL keys (child and parent) land in the single
    NULL census group, whose c_cnt is exactly n_null_keys and whose
    p_cnt can never be referenced (SQL equality never matches NULL).
    All counts BIGINT; empty inputs yield zero rows in the census, so
    every sum is COALESCEd to 0 (the COUNT(*)-of-empty contract).
    """
    if not relations:
        raise ValueError("relations must be non-empty")
    outs = []
    for name, child, ckey, parent, pkey in relations:
        # UNION (not join) aligns the key types through the analyzer's
        # set-operation widening — the same coercion the old join got.
        # Key types with NO common wider type fail the union at analysis;
        # re-raise with the relation and both types named so the caller
        # sees a constraint violation, not a union plumbing error
        # (ADVICE r13).
        try:
            census = (
                child.select(
                    F.col(ckey).alias("_k"),
                    F.lit(1).cast("bigint").alias("_c"),
                    F.lit(0).cast("bigint").alias("_p"),
                )
                .unionAll(
                    parent.select(
                        F.col(pkey).alias("_k"),
                        F.lit(0).cast("bigint").alias("_c"),
                        F.lit(1).cast("bigint").alias("_p"),
                    )
                )
                .groupBy("_k")
                .agg(F.sum("_c").alias("_cc"), F.sum("_p").alias("_pc"))
            )
        except Exception as exc:
            ctype = dict(child.dtypes).get(ckey)
            ptype = dict(parent.dtypes).get(pkey)
            raise TypeError(
                f"fk_integrity_report relation {name!r}: child key "
                f"{ckey!r} ({ctype}) and parent key {pkey!r} ({ptype}) "
                "have no common wider type — cast one side to the "
                "other's type before declaring the relation"
            ) from exc
        k_null = F.col("_k").isNull()
        stats = census.agg(
            F.coalesce(F.sum("_cc"), F.lit(0)).cast("bigint").alias("n_child"),
            F.coalesce(F.sum(F.when(k_null, F.col("_cc"))), F.lit(0))
            .cast("bigint")
            .alias("n_null_keys"),
            F.coalesce(
                F.sum(
                    F.when(~k_null & (F.col("_pc") == 0), F.col("_cc"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_orphans"),
            F.coalesce(
                F.sum(F.when(~k_null & (F.col("_cc") > 0), F.col("_pc"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("_n_ref"),
            F.coalesce(F.sum("_pc"), F.lit(0))
            .cast("bigint")
            .alias("_n_parent"),
        ).select(
            F.lit(name).alias("relation"),
            "n_child",
            "n_null_keys",
            "n_orphans",
            F.expr(
                "CASE WHEN _n_parent = 0 THEN CAST(0 AS BIGINT) "
                "ELSE _n_ref * CAST(1000000 AS BIGINT) div _n_parent END"
            ).alias("parent_coverage_ppm"),
        )
        outs.append(stats)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def fd_profile(
    specs: list[tuple[str, DataFrame, str, str]],
) -> DataFrame:
    """Functional-dependency profiler (dq07) — does X → Y hold in the
    data? For each (table_name, df, lhs, rhs) candidate, the exact
    dependency census: distinct LHS values, distinct (LHS, RHS) pairs,
    the number of LHS values mapping to MORE than one RHS (violators),
    the violation fraction in integer ppm of distinct LHS, and the
    verdict. ppm = 0 ⇔ the FD holds; small ppm = an "approximate FD"
    (the schema-inference / anomaly-detection signal profilers like
    Metanome's TANE surface). Complements dq06's FK integrity (inclusion
    dependency) with the FUNCTIONAL dependency — together they are the
    two constraint families schema discovery mines.

    NULL semantics: rows with NULL in lhs or rhs are excluded (SQL's
    countDistinct convention) — an FD claim over NULLs is undefined.

    Scale: one groupBy(lhs) per candidate (map-side partial aggregation;
    the shuffle carries one row per distinct LHS, not per input row) +
    a 1-row rollup; candidates run independently and union bounded
    (|specs|) rows."""
    outs: list[DataFrame] = []
    for name, df, lhs, rhs in specs:
        base = df.filter(F.col(lhs).isNotNull() & F.col(rhs).isNotNull())
        per_lhs = base.groupBy(lhs).agg(
            F.countDistinct(rhs).alias("n_rhs")
        )
        outs.append(
            per_lhs.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_distinct_lhs"),
                F.sum("n_rhs").cast("bigint").alias("n_distinct_pairs"),
                F.sum((F.col("n_rhs") > 1).cast("int"))
                .cast("bigint")
                .alias("n_violating_lhs"),
            ).select(
                F.lit(name).alias("table_name"),
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_distinct_lhs",
                "n_distinct_pairs",
                "n_violating_lhs",
                F.expr("(1000000 * n_violating_lhs) div n_distinct_lhs")
                .cast("bigint")
                .alias("violation_ppm"),
                (F.col("n_violating_lhs") == 0).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("table_name", "lhs", "rhs")


def embedding_drift(
    baseline: DataFrame, current: DataFrame, n_dims: int = 8
) -> DataFrame:
    """EMBEDDING-space drift between a baseline and a current slice —
    the dense sibling of ``distribution_drift`` (dq03): per (label,
    dimension), how far the per-label centroid has moved. The
    ML-ops check behind "did the upstream encoder / corpus mix shift
    under my ANN index or classifier?" — categorical TVD can't see a
    drift that keeps label frequencies constant but moves WHERE each
    label's vectors sit.

    Exactness contract (the ss02 recipe, applied twice): per slice the
    centroid component is ``CAST(SUM(DECIMAL(18,9)) AS DOUBLE) /
    COUNT`` — exact decimal aggregation, then ONE IEEE double division,
    bit-identical in Spark and DuckDB; drift = |base − cur| is one
    IEEE subtraction of bit-equal operands, so the whole report is
    hash-stable with no rounding step at all.

    Returns one row per (label, pos): ``(label, pos, n_baseline,
    n_current, base_centroid, cur_centroid, drift)`` — bounded output
    (|labels| × n_dims rows). Scale shape: two posexplode hash-aggs
    (map-side partial over n·n_dims rows) + one small join; row counts
    never leave the cluster."""

    from ..functions.vectors import as_double

    def _cents(df: DataFrame, n_col: str, c_col: str) -> DataFrame:
        e = df.select(
            "label",
            F.posexplode(F.slice(as_double(F.col("embedding")), 1, n_dims)),
        ).select(
            "label",
            F.col("pos"),
            F.col("col").cast("decimal(18,9)").alias("val"),
        )
        return e.groupBy("label", "pos").agg(
            F.count("val").cast("bigint").alias(n_col),
            (F.sum("val").cast("double") / F.count("val")).alias(c_col),
        )

    j = _cents(baseline, "n_baseline", "base_centroid").join(
        _cents(current, "n_current", "cur_centroid"), ["label", "pos"]
    )
    return j.select(
        "label",
        F.col("pos").cast("int").alias("pos"),
        "n_baseline",
        "n_current",
        "base_centroid",
        "cur_centroid",
        F.abs(F.col("base_centroid") - F.col("cur_centroid")).alias("drift"),
    ).orderBy("label", "pos")
