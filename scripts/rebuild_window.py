"""Rebuild the QUERIES dict ordering for the r14 driver window
(VERDICT r13 #2): the r13 rotation-overflow 23 lead the front-50,
followed by every query whose code changed this round (mechanically:
the check_rotation affected set), then unaffected fillers; the
displaced remainder keeps its exact current relative order.

Prints the new key order (one per line) — the queries.py dict literal
is then regenerated from it.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the r13 overflow, from NOTES.md (r13 session-2 close)
OVERFLOW_R13 = [
    "dd06_simhash", "dd09_dup_spans", "dd10_simhash_neardup",
    "dd12_repeated_chunks", "dq06_fk_integrity", "dq07_fd_profile",
    "dq08_embedding_drift", "gr04_kcore", "gr05_bfs_hops",
    "gr06_label_propagation", "gr07_link_prediction",
    "gr08_personalized_pagerank", "px01_curation_pipeline",
    "px05_exactsubstr_scrub", "px08_decontaminated_split",
    "q02_pricing_summary", "q04_revenue_by_nation", "q54_market_share",
    "tx02_quality_scores", "tx07_keyterms", "tx12_contamination",
    "q92_hilbert_layout", "sk09_cms_self_join_size",
]


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("affected", nargs="*",
                    help="r14 affected queries (from check_rotation)")
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    from kafkatosparktokudu_spark.plans.queries import QUERIES

    order = list(QUERIES)
    pos = {q: i for i, q in enumerate(order)}
    for q in OVERFLOW_R13 + args.affected:
        if q not in pos:
            raise SystemExit(f"unknown query {q}")

    front: list[str] = list(OVERFLOW_R13)
    for q in sorted(args.affected, key=pos.get):
        if q not in front:
            front.append(q)
    # fillers: keep current-window occupants (they carry the freshest
    # driver stamps) in current order, then anything else in order
    for q in order:
        if len(front) >= args.window:
            break
        if q not in front:
            front.append(q)
    rest = [q for q in order if q not in set(front)]
    assert len(front) + len(rest) == len(order)
    for q in front + rest:
        print(q)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
