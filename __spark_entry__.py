"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the per-event-type sync report —
the DataFrame analogue of the reference pipeline's per-batch reporting,
/root/reference/.../ConsumerMain.scala:113-116 + LoggerManager.scala:41-57)
at sf0.001. ``queries()`` / ``oracle_sql()`` expose the full operator surface
per SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafkatosparktokudu_spark.plans.oracle import ORACLE_SQL
from kafkatosparktokudu_spark.plans.queries import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_sync_report"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted keys → rows-only check)."""
    return dict(ORACLE_SQL)
