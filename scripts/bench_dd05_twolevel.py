"""Measure VERDICT r11 #6: two-level IVF blocking on the x16 corpus.

r11 closed with dd05's x16 solo wall at 282s (auto sqrt-cells),
candidate-generation-bound. The two-level index requires candidates to
share (coarse cell, sub-cell): pair mass drops ~(n_subcells/nprobe_sub^2)x
at the cost of one broadcast anchor join. This measures, at tau=0.8
(output tiny, wall IS candidates+verify):

- single-level auto cells (the r11 baseline shape);
- two-level (n_subcells=16, nprobe_sub=2) and (16, 1);

and reports pair counts so recall loss (if any) is visible against the
single-level output (exact-cosine verify means precision is identical —
only candidate coverage can differ).

Run on a QUIET box: python scripts/bench_dd05_twolevel.py -> NOTES.md
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from sweep_dd05_tau import build_x16  # noqa: E402

from kafkatosparktokudu_spark.operators.dedup import (  # noqa: E402
    embedding_neardup_pairs,
)
from kafkatosparktokudu_spark.session import get_spark  # noqa: E402

TAU = 0.8


def main() -> None:
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    emb, n = build_x16(spark)
    print(f"x16 corpus: {emb.count()} vectors")
    settings = [
        # r13: the DEFAULT is tau-aware — at TAU=0.8 (>= the production
        # band floor) dict() auto-routes to (16, 1); the explicit
        # n_subcells=None row is the old single-level baseline
        ("single (explicit)", dict(n_subcells=None)),
        ("auto (default)", dict()),
        ("two-level (16,2)", dict(n_subcells=16, nprobe_sub=2)),
        ("two-level (16,1)", dict(n_subcells=16, nprobe_sub=1)),
    ]
    for label, kw in settings:
        t0 = time.time()
        cnt = embedding_neardup_pairs(emb, threshold=TAU, nprobe=4, **kw).count()
        print(f"{label:18s} | pairs {cnt:6d} | wall {time.time()-t0:6.1f}s")


if __name__ == "__main__":
    main()
