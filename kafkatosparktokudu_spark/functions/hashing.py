"""Deterministic, engine-portable hashing expressions.

Spark's builtin hash/xxhash64 and DuckDB's hash() differ, so every hash that
participates in oracle-checked output is built from md5 (identical in both
engines): take the first 8 hex digits → unsigned 32-bit int. All downstream
arithmetic (minhash permutations, rolling hashes, simhash bits) is exact
int64 math, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1 (Mersenne prime) — modulus for permutation hashes
MERSENNE31 = 2147483647
ROLL_MOD = 1000000007
ROLL_SEED = 7


def md5_hash32(col: Column) -> Column:
    """First 8 md5 hex digits as a bigint in [0, 2^32).
    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def md5_hash60(col: Column) -> Column:
    """First 15 md5 hex digits as a bigint in [0, 2^60) — for keys that are
    GROUPED on (duplicate-window detection): at 10^8 distinct values the
    birthday collision odds are ~4e-3, vs ~70% certainty for the 32-bit
    variant. DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def rolling_hash(tokens: Column) -> Column:
    """Order-sensitive polynomial fold over token hashes —
    a document fingerprint that, unlike a set hash, changes when token
    order changes. acc = (acc*31 + h(tok)) mod 1e9+7."""
    return F.aggregate(
        F.transform(tokens, md5_hash32),
        F.lit(ROLL_SEED).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % F.lit(ROLL_MOD),
    )
