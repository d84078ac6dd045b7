"""Per-query profiling harness for the optimization rounds.

Times named queries bench-style (1 untimed warmup + N timed reps, noop
sink, clearCache + System.gc between reps — the bench.py protocol) and
optionally writes ``.explain("formatted")`` to plans/<tag>/<query>_<suffix>.txt.

    python scripts/profile_queries.py --sf sf0.1 --reps 3 \
        --explain-dir plans/r13 --suffix before dd05_embedding_neardup ss15_ivf_trained_topk

Not part of the driver contract; bench.py stays the official record.
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
    ap.add_argument("--sf", default="sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true",
                    help="only capture explains, skip timing reps")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from kafkatosparktokudu_spark.plans.queries import QUERIES
    from kafkatosparktokudu_spark.session import get_spark

    sf_dir = f"/root/testdata/{args.sf}"
    spark = get_spark(app_name="profile")
    out = {}
    for name in args.queries:
        fn = QUERIES[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                f"{args.explain_dir}/{name}_{args.suffix}.txt", "w"
            ) as f:
                f.write(plan)
        if args.no_time:
            print(f"{name}: explain captured")
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        reps = []
        for rep in range(args.reps + 1):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            if rep > 0:
                reps.append(time.time() - t0)
        out[name] = sorted(reps)[len(reps) // 2]
        print(f"{name}: median {out[name]:.3f}s  reps={[round(r,3) for r in reps]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
