"""Measure VERDICT r10 #6: auto-sized IVF cells (ceil(sqrt(n))) vs the
r10 fixed setting on the x16 decorrelated corpus (32k vectors).

r10's dd05 x16 solo wall (~392s loaded / ~335s quiet) was candidate-
generation-bound at n_cells=128 (~250 vectors/cell): candidate mass is
~n * nprobe^2 / n_cells, so ceil(sqrt(32320)) = 180 cells should cut it
~1.4x — and the n^1.5 discipline holds automatically as corpora grow,
instead of relying on every call site remembering to re-tune.

Prints one row per setting at tau=0.8 (output tiny, so the wall IS
candidate generation + verify): fixed 128 / auto (None -> 180).

Run on a QUIET box: python scripts/bench_dd05_cells.py -> NOTES.md
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
from kafkatosparktokudu_spark.operators.similarity import auto_n_cells  # noqa: E402
from kafkatosparktokudu_spark.session import get_spark  # noqa: E402

TAU = 0.8


def main() -> None:
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    emb, n = build_x16(spark)
    print(f"x16 corpus: {emb.count()} vectors; auto n_cells={auto_n_cells(emb)}")
    print("setting | n_cells | pairs_out | wall_s")
    for label, cells in (("fixed-r10", 128), ("auto-sqrt", None)):
        t0 = time.time()
        cnt = embedding_neardup_pairs(
            emb, threshold=TAU, n_cells=cells, nprobe=4
        ).count()
        wall = time.time() - t0
        shown = cells if cells is not None else auto_n_cells(emb)
        print(f"{label} | {shown:7d} | {cnt:9d} | {wall:6.1f}")


if __name__ == "__main__":
    main()
