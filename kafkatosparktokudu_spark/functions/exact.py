"""Exact-arithmetic column helpers for oracle-parity aggregation.

Summing doubles is order-dependent (Spark's partial aggregation order differs
from DuckDB's sequential scan), so double SUM/AVG can differ in the last ulp
and break value-hash comparison. Casting to DECIMAL first makes the
aggregation exact and engine-independent; casting the final result back to
DOUBLE is a deterministic IEEE round-to-nearest in both engines, so results
are bit-identical.

At 100 TB scale this costs nothing extra: decimal sum is still a map-side
partial aggregation, and Tungsten handles decimals in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# money-ish doubles (prices, balances, quantities): 2 fractional digits
MONEY = "decimal(12,2)"
# small rates like discount/tax in [0,1]: 6 fractional digits
RATE = "decimal(8,6)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: Column | str, typ: str = MONEY) -> Column:
    """Exact SUM: decimal-cast, sum, back to double."""
    return F.sum(dec(col, typ)).cast("double")


def prod_sum_double(sum_col: Column) -> Column:
    """Final cast for SUMs of decimal *products* (scale 8-14).

    DuckDB's wide-decimal→double cast double-rounds (int128→double, then a
    divide), so values can differ from Spark's correctly-rounded
    BigDecimal→double in the last ulp. Reducing to scale 6 first is exact for
    our 2dp×2dp×2dp data and keeps the scaled integer under 2^53, making
    DuckDB's conversion a single correct rounding. Oracle side mirrors this:
    CAST(CAST(SUM(...) AS DECIMAL(27,6)) AS DOUBLE).
    """
    return sum_col.cast("decimal(27,6)").cast("double")


def davg(col: Column | str, typ: str = MONEY) -> Column:
    """Exact AVG as sum/count (identical formula on the oracle side —
    decimal AVG result scales differ between engines, sum/count does not)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, typ)).cast("double") / F.count(c)
