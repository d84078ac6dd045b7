"""Oracle-schema lint: the three recurring driver-compare hazards, killed
mechanically instead of remembered.

1. HUGEINT (px08 round 5, q91 round 6): DuckDB promotes integer
   aggregates/window sums to HUGEINT (INT128); the driver canonicalizes
   HUGEINT differently than BIGINT, so a value-identical result
   hash-mismatches.  Round-trip every oracle at sf0.001, fail on
   HUGEINT/UHUGEINT output columns.
2. Collection columns in query OUTPUT (q59 round 4): the driver's pandas
   `sort_values` canonicalizer dies on array/map cells (`unhashable type:
   'list'`).  Fail on LIST/MAP/STRUCT/UNION output columns — explode or
   stringify before returning.
3. Cross-engine type-CLASS drift (the date_trunc lesson: DuckDB's
   date_trunc returns DATE, Spark's returns TIMESTAMP — values equal,
   reprs differ, hash mismatches).  For every oracled query, build the
   Spark DataFrame and compare each output column's coarse type class
   (num/str/bool/date/timestamp/binary/nested) against the DuckDB relation
   by column name.  This also catches hazards 1–2 on the SPARK side.

Each hazard has a deliberately-broken fixture test proving the lint is
live.  DECIMAL vs DOUBLE is NOT drift — the compare normalizes Decimal to
float on both sides, so both classify as "num".
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")

BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _oracle_items():
    return sorted(entrymod.oracle_sql().items())


def _hugeint_violations(rel) -> list[tuple[str, str]]:
    return [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if any(b in str(typ).upper() for b in BANNED)
    ]


_NESTED_MARKERS = ("[]", "LIST", "MAP(", "STRUCT(", "UNION(")


def _nested_violations(rel) -> list[tuple[str, str]]:
    return [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if any(m in str(typ).upper() for m in _NESTED_MARKERS)
    ]


def _duck_class(typ: str) -> str:
    s = str(typ).upper()
    if any(b in s for b in BANNED):
        return "banned-hugeint"
    if any(m in s for m in _NESTED_MARKERS):
        return "nested"
    if s.startswith("DECIMAL") or s in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT",
        "UINTEGER", "UBIGINT", "FLOAT", "DOUBLE", "REAL",
    ):
        return "num"
    if s == "VARCHAR":
        return "str"
    if s == "BOOLEAN":
        return "bool"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s == "BLOB":
        return "binary"
    return f"other:{s}"


def _spark_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "nested"
    if isinstance(dt, T.NumericType):
        return "num"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    return f"other:{dt.simpleString()}"


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_has_no_hugeint_columns(con, name, sql):
    bad = _hugeint_violations(con.sql(sql))
    assert not bad, (
        f"oracle {name} emits HUGEINT column(s) {bad}; wrap the expression in "
        f"CAST(... AS BIGINT) — the driver hashes HUGEINT differently than "
        f"BIGINT even when values are identical"
    )


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_has_no_collection_columns(con, name, sql):
    bad = _nested_violations(con.sql(sql))
    assert not bad, (
        f"oracle {name} emits collection column(s) {bad}; the driver's pandas "
        f"canonicalizer can't sort array/map cells (q59 lesson) — explode or "
        f"stringify before returning"
    )


def test_oracle_spark_type_class_parity(spark, con):
    """Hazard 3: per-column coarse type classes must agree across engines
    (num/str/bool/date/timestamp/binary) — catches DuckDB date_trunc DATE
    vs Spark TIMESTAMP and any Spark-side nested output.  One test, not
    parametrized: it reuses one session and only builds Spark schemas
    (queries with internal driver collects still run those small jobs)."""
    qs = entrymod.queries()
    drift: list[str] = []
    for name, sql in _oracle_items():
        sdf = qs[name](spark, SF_DIR)
        sclasses = {f.name: _spark_class(f.dataType) for f in sdf.schema.fields}
        rel = con.sql(sql)
        oclasses = {c: _duck_class(t) for c, t in zip(rel.columns, rel.types)}
        if sorted(sclasses) != sorted(oclasses):
            drift.append(f"{name}: column names differ {sorted(sclasses)} vs {sorted(oclasses)}")
            continue
        for col in sclasses:
            if sclasses[col] != oclasses[col]:
                drift.append(
                    f"{name}.{col}: spark={sclasses[col]} oracle={oclasses[col]}"
                )
    assert not drift, "type-class drift (value-hash would mismatch):\n" + "\n".join(drift)


def test_lint_catches_hugeint(con):
    """DuckDB promotes SUM(INTEGER) to HUGEINT — the lint must see it."""
    rel = con.sql("SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)")
    assert _hugeint_violations(rel), "HUGEINT lint is dead"
    assert not _hugeint_violations(
        con.sql("SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)")
    )


def test_lint_catches_collections(con):
    rel = con.sql("SELECT [1, 2] AS a, MAP(['k'], [1]) AS m")
    assert len(_nested_violations(rel)) == 2, "collection lint is dead"
    assert not _nested_violations(con.sql("SELECT 1 AS a"))


def test_lint_catches_date_timestamp_drift(con):
    """date_trunc: DuckDB yields DATE where Spark yields TIMESTAMP — the
    class comparator must distinguish them (and agree on the rest)."""
    from pyspark.sql import types as T

    rel = con.sql("SELECT date_trunc('month', DATE '2024-02-15') AS d")
    assert [_duck_class(t) for t in rel.types] == ["date"]
    assert _spark_class(T.TimestampType()) == "timestamp"
    assert _spark_class(T.DateType()) == "date"
    assert _duck_class("DECIMAL(18,2)") == _spark_class(T.DoubleType()) == "num"
