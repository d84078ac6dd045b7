"""Oracle-schema lint: no DuckDB HUGEINT may reach the driver compare.

Recurring bug class (px08 in round 5, q91 in round 6): DuckDB promotes
integer aggregates/window sums to HUGEINT (INT128); `//` and most integer
arithmetic preserve it.  The driver canonicalizes HUGEINT differently than
BIGINT when hashing values, so an oracle whose result schema contains a
HUGEINT column hash-mismatches a value-identical Spark result.

This lint round-trips EVERY oracle through DuckDB at sf0.001 and fails if
any output column is HUGEINT (or UHUGEINT).  DECIMAL / DOUBLE columns are
fine — the compare normalizes Decimal to float on both sides.
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


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_has_no_hugeint_columns(con, name, sql):
    rel = con.sql(sql)
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if any(b in str(typ).upper() for b in BANNED)
    ]
    assert not bad, (
        f"oracle {name} emits HUGEINT column(s) {bad}; wrap the expression in "
        f"CAST(... AS BIGINT) — the driver hashes HUGEINT differently than "
        f"BIGINT even when values are identical"
    )
