"""Driver-style verification of the CORRECTNESS window.

Mimics what the round driver does: take the first N keys of ``QUERIES``
(default 50 — the driver's window), run each against
``/root/testdata/<sf>`` on a fresh local session, run its DuckDB oracle
on the same parquet, and compare canonicalized results exactly
(tests/oracle_harness.py — stricter than the driver's value-hash).

    python scripts/verify_window.py [--sf sf0.01] [--window 50]
    python scripts/verify_window.py --keys dd03_minhash_bands ss07_pq_encode

Rows-only queries (no ORACLE_SQL entry) are executed and counted but
marked ``rows-only``; any exception or mismatch is a FAIL. Exit 0 iff
no FAILs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--keys", nargs="*", default=None)
    args = ap.parse_args()

    from kafkatosparktokudu_spark.plans.oracle import ORACLE_SQL
    from kafkatosparktokudu_spark.plans.queries import QUERIES
    from kafkatosparktokudu_spark.session import get_spark
    from tests.oracle_harness import canonical, run_oracle

    sf_dir = f"/root/testdata/{args.sf}"
    keys = args.keys if args.keys else list(QUERIES)[: args.window]
    spark = get_spark()
    fails, rows_only = [], []
    for i, name in enumerate(keys, 1):
        t0 = time.time()
        try:
            df = QUERIES[name](spark, sf_dir)
            rows = df.collect()
            cols = df.columns
            if name not in ORACLE_SQL:
                rows_only.append(name)
                print(f"[{i}/{len(keys)}] {name}: rows-only "
                      f"({len(rows)} rows, {time.time()-t0:.1f}s)")
                continue
            orows, ocols = run_oracle(ORACLE_SQL[name], sf_dir)
            got = canonical([tuple(r) for r in rows], cols)
            want = canonical(orows, ocols)
            if sorted(cols) != sorted(ocols):
                fails.append(name)
                print(f"[{i}/{len(keys)}] {name}: FAIL cols "
                      f"{sorted(cols)} != {sorted(ocols)}")
            elif got != want:
                fails.append(name)
                print(f"[{i}/{len(keys)}] {name}: FAIL values "
                      f"({len(got)} vs {len(want)} rows)")
            else:
                print(f"[{i}/{len(keys)}] {name}: OK "
                      f"({len(rows)} rows, {time.time()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"[{i}/{len(keys)}] {name}: ERROR {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")
    print(f"\nOK={len(keys)-len(fails)-len(rows_only)} "
          f"rows-only={rows_only} FAILS={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
