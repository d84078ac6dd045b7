"""Local mimic of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side, canonicalizes both
result sets (columns sorted by name, rows sorted, values normalized), and
compares them EXACTLY — stricter than the driver's value-hash, so passing
here implies passing there.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from kafkatosparktokudu_spark.config import FIXTURE_TABLES


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def canonical(rows: list, colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def run_oracle(sql: str, sf_dir: str) -> tuple[list, list[str]]:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return rows, cols


def compare(spark, query_fn, sql: str, sf_dir: str) -> tuple[bool, str]:
    sdf = query_fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    orows, ocols = run_oracle(sql, sf_dir)

    if sorted(scols) != sorted(ocols):
        return False, f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"row count mismatch: spark={len(srows)} oracle={len(orows)}"
    a = canonical([tuple(r) for r in srows], scols)
    b = canonical(orows, ocols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
