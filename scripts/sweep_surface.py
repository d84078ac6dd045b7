"""Full-surface one-rep timing sweep (VERDICT r13 #7): wall-time EVERY
registered query once at the given SF (noop sink, one shared session,
one global warmup query) and write a JSON artifact so each round's
"unbenched outlier" class is caught mechanically, not by luck.

    python scripts/sweep_surface.py --sf sf0.1 --out plans/r14/sweep.json

One rep is a triage signal, not a benchmark — outliers get re-isolated
with scripts/profile_queries.py (bench protocol) before any claim.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    from kafkatosparktokudu_spark.plans.queries import QUERIES
    from kafkatosparktokudu_spark.session import get_spark

    sf_dir = f"/root/testdata/{args.sf}"
    spark = get_spark(app_name="sweep_surface")
    # global warmup: JVM/codegen/parquet-footer caches (the bench.py idiom)
    QUERIES["q03_filter_project"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, float] = {}
    for name, fn in QUERIES.items():
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
        except Exception as exc:  # record, keep sweeping
            out[name] = -1.0
            print(f"{name}: ERROR {exc}", file=sys.stderr)
        print(f"{name}: {out[name]:.3f}s", flush=True)

    artifact = {
        "sf": args.sf,
        "reps": 1,
        "note": "one-rep triage sweep; not bench-comparable",
        "seconds": out,
    }
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
    top = sorted(out.items(), key=lambda kv: -kv[1])[: args.top]
    print("\nTOP OUTLIERS:")
    for name, sec in top:
        print(f"  {sec:7.3f}s  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
