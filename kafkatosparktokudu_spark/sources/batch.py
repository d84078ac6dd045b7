"""Batch sources: the fixture parquet tables.

The reference has no file-format scans (its only source is Kafka,
KafkaManager.scala:39-47); the analytic query surface our driver contract
requires reads the TPC-H-ish parquet fixtures. Plain ``spark.read.parquet``
gives predicate pushdown + column pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import FIXTURE_TABLES

# Columns stored as parquet TIMESTAMP(NANOS): Spark has no nanosecond
# timestamp type, so we read them as raw int64 (legacy conf) and truncate to
# microseconds — exactly what DuckDB does when it reads the same file, so
# oracle comparison stays bit-identical.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # DuckDB timestamps are UTC-naive; pin the session TZ so collected
    # timestamps agree even when the caller's session (e.g. the driver's)
    # didn't set it and the host TZ isn't UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nano_cols = _NANO_TS_COLS.get(name, ())
    if nano_cols:
        # runtime SQL conf — safe to set lazily so it also holds in the
        # driver's own session, not just ours
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in nano_cols:
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = FIXTURE_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = FIXTURE_TABLES
) -> None:
    """Register each fixture as a temp view so queries can use spark.sql.

    Catalyst produces the same plan for SQL and DataFrame code; views keep
    SQL-shaped operators (rollup, grouping sets) readable.
    """
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_file(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
):
    """Format-agnostic batch scan (parquet / csv / json / orc).

    Parquet and ORC carry their own types; CSV and JSON must be given an
    explicit ``schema`` for type fidelity (schema inference costs an extra
    pass over the data and guesses — never infer at 100 TB). Filters and
    projections push into every one of these readers via the DataSource V2
    scan, same as the parquet fixture path. ``fmt="avro"`` works as-is on a
    cluster with the external spark-avro module deployed (absent here).
    """
    reader = spark.read.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
