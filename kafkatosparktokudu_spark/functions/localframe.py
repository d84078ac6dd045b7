"""Arrow-backed construction of SMALL driver-local DataFrames.

Measured pathology (r10, local[32], Spark 4.1): a plain
``spark.createDataFrame(list_of_tuples, ...)`` builds a frame backed by a
pickled Python RDD — every ACTION that consumes it re-runs a Python
worker pass (~0.4 s), and the parquet WRITE path re-evaluates it
repeatedly (~4.5-5.0 s for a 10-ROW frame, reproducibly, warm). Routing
the same rows through a pandas/Arrow batch makes creation+write ~0.5 s
and follow-up actions JVM-cheap.

That tax sat on real paths: every two-stage-offsets broadcast frame
(q90/q91/px15/px17/px19/px21/px22) paid ~0.4 s per action, and the st04
counter snapshot / st05 register snapshot paid ~4.5 s PER EPOCH on a
10-row write. Use ``local_frame`` for any bounded driver-side result
that becomes a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_frame(spark: SparkSession, rows, schema: str | T.StructType) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` routed through pandas/Arrow.

    ``rows``: iterable of tuples (or Rows); ``schema``: DDL string or
    StructType. Intended for BOUNDED driver-side sets (offsets, counters,
    registers, seeds, collected top-k) — the k-means-seed convention."""
    import pandas as pd

    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    rows = list(rows)
    if not rows:
        # empty frames are plain local relations either way; the Arrow
        # path rejects an empty pandas frame with object dtypes
        return spark.createDataFrame([], schema)
    names = [f.name for f in schema.fields]
    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    try:
        cols = list(zip(*rows))
        data = {}
        for i, f in enumerate(schema.fields):
            vals = list(cols[i])
            # An int column containing a None is upcast by pandas to
            # float64, which SILENTLY rounds values >= 2^53 instead of
            # erroring (so the except-fallback below never fires). Build
            # such columns with dtype=object — Arrow converts object
            # int/None cells to the schema's integer type losslessly.
            # (ADVICE r10; pinned by test_local_frame_bigint_none_exact.)
            if isinstance(f.dataType, int_types) and any(v is None for v in vals):
                data[f.name] = pd.Series(vals, dtype=object)
            else:
                data[f.name] = pd.Series(vals)
        pdf = pd.DataFrame(data, columns=names)
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:  # noqa: BLE001 — exotic element types (nested
        # arrays/maps, mixed None) can defeat the pandas conversion;
        # correctness beats the speedup, so fall back to the plain path
        return spark.createDataFrame(rows, schema)
