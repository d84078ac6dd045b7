"""Mechanical guard (VERDICT r10 #4): driver-local row sets must go
through functions/localframe.py::local_frame, never a plain
``spark.createDataFrame(rows, ...)``.

Why a lint and not a convention: the plain path builds a pickled-Python-
RDD-backed frame whose every ACTION re-runs a Python worker pass (~0.4 s)
and whose parquet WRITE re-evaluates repeatedly (measured ~4.5-5.0 s for
a 10-ROW frame, r10) — a tax that silently returns with any new call
site. Allowed without the marker: EMPTY-list literals (local_frame itself
takes the plain path for those — an empty local relation has nothing to
Arrow-batch) and localframe.py's own implementation. Anything else needs
an explicit ``# plain-ok:`` comment stating why the Arrow path can't be
used.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "kafkatosparktokudu_spark"
EXEMPT_FILES = {PKG / "functions" / "localframe.py"}
MARKER = "# plain-ok"


def _violations() -> list[str]:
    out: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        if path in EXEMPT_FILES:
            continue
        src = path.read_text(encoding="utf-8")
        lines = src.splitlines()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "createDataFrame"
            ):
                continue
            first = node.args[0] if node.args else None
            if isinstance(first, ast.List) and not first.elts:
                continue  # empty local relation — plain path is local_frame's too
            # the marker may sit on any line the call spans
            span = range(node.lineno - 1, (node.end_lineno or node.lineno))
            if any(MARKER in lines[i] for i in span if i < len(lines)):
                continue
            out.append(f"{path.relative_to(PKG.parent)}:{node.lineno}")
    return out


def test_no_plain_list_createdataframe_in_package():
    bad = _violations()
    assert not bad, (
        "plain createDataFrame on a non-empty local row set — route through "
        f"functions.localframe.local_frame or add a '{MARKER}: <why>' "
        f"comment: {bad}"
    )


def test_no_coalesce1_before_write():
    """Mechanical guard for the r12 finding: ``.coalesce(1)`` ahead of a
    write is a 4-7 s PER-CALL tax when the frame is an Arrow local_frame
    (one task drains all 32 Arrow partitions through sequential Python
    workers — it never warms); ``repartition(1)`` is the single-file
    idiom (parallel read, <=n-row shuffle, 0.6 s warm). On a JVM-backed
    scan coalesce(1) is harmless — mark those sites with
    ``# coalesce-ok: <why>`` on the call's line span; anything unmarked
    fails, so the next local-frame snapshot writer can't reintroduce the
    tax."""
    import re

    marker = "# coalesce-ok"
    bad = []
    for path in sorted(PKG.rglob("*.py")):
        lines = path.read_text(encoding="utf-8").splitlines()
        for i, ln in enumerate(lines):
            if ".coalesce(" not in ln:
                continue
            # the write may sit on the same or a following chained line
            span = " ".join(lines[i : i + 4])
            if not re.search(r"\.coalesce\(\s*1\s*\)", span):
                continue
            if ".write" not in span:
                continue
            # only the Arrow-local-frame class: a JVM-backed scan's
            # coalesce(1) has no Python partitions to drain sequentially
            stmt = " ".join(lines[max(0, i - 3) : i + 4])
            if "local_frame(" not in stmt:
                continue
            if any(marker in lines[j] for j in range(i, min(i + 4, len(lines)))):
                continue
            bad.append(f"{path.relative_to(PKG.parent)}:{i + 1}")
    assert not bad, (
        "coalesce(1) before a write — use repartition(1) (the Arrow "
        f"local_frame tax, NOTES r12) or mark a JVM-backed site with "
        f"'{marker}: <why>': {bad}"
    )
