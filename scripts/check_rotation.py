"""Mechanical rotation check (VERDICT r10 #3/#9): every query whose
implementing code changed this round must sit inside the driver's
front-50 CORRECTNESS window (= the first 50 keys of QUERIES).

The r10 miss this closes: NOTES claimed "dd07/tx19 rotated in", but
tx19_bpe_merges — whose merge-table path WAS touched — never made the
window, and nothing caught it. Now the claim is a computation:

    python scripts/check_rotation.py [--base REF]

- ``--base`` defaults to the newest commit whose subject starts with
  "round " (the driver's round-end commit).
- Changed files under the package come from ``git diff base..HEAD``
  plus the working tree.
- plans/queries.py and plans/oracle.py are attributed at FUNCTION /
  dict-entry granularity (AST line spans on both diff sides, plus a
  reverse-reference closure so touching a shared helper implicates its
  consumers); every other package file maps to queries through
  fixtures/query_deps.json (regenerate with scripts/gen_query_deps.py).

Exit 0 = every affected query is inside the window (prints the set so
NOTES can quote it); exit 1 = violations listed.
"""

from __future__ import annotations

import argparse
import ast
import difflib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PKG = "kafkatosparktokudu_spark"
WINDOW = 50


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def _default_base() -> str:
    out = _git("log", "--format=%H %s")
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith("round "):
            return sha
    raise SystemExit("no 'round N' driver commit found; pass --base")


def _name_spans(src: str) -> dict[str, tuple[int, int]]:
    """Top-level def spans + dict-entry spans (key -> line range) for the
    two plans files: a changed line is attributed to its enclosing name."""
    spans: dict[str, tuple[int, int]] = {}
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            spans[node.name] = (node.lineno, node.end_lineno or node.lineno)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            val = node.value
            if isinstance(val, ast.Dict):
                for k, v in zip(val.keys, val.values):
                    if isinstance(k, ast.Constant) and isinstance(k.value, str):
                        spans[k.value] = (k.lineno, v.end_lineno or v.lineno)
    return spans


def _name_refs(src: str) -> dict[str, set[str]]:
    """name -> top-level names it references (for the helper closure)."""
    tree = ast.parse(src)
    top = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            top.add(node.name)
    refs: dict[str, set[str]] = {}

    def names_in(node: ast.AST) -> set[str]:
        return {
            n.id for n in ast.walk(node) if isinstance(n, ast.Name)
        } & top

    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            refs[node.name] = names_in(node) - {node.name}
        elif isinstance(node, (ast.Assign, ast.AnnAssign)) and isinstance(
            node.value, ast.Dict
        ):
            for k, v in zip(node.value.keys, node.value.values):
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    refs[k.value] = names_in(v)
    return refs


def _changed_names(base_src: str, head_src: str) -> set[str]:
    """Names whose body text changed between the two versions, expanded
    through the reverse-reference closure (changed helper -> consumers)."""
    base_spans, head_spans = _name_spans(base_src), _name_spans(head_src)
    touched: set[str] = set()
    base_lines, head_lines = base_src.splitlines(), head_src.splitlines()
    sm = difflib.SequenceMatcher(None, base_lines, head_lines, autojunk=False)
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag == "equal":
            continue
        for spans, lo, hi in ((base_spans, i1 + 1, i2), (head_spans, j1 + 1, j2)):
            for name, (s, e) in spans.items():
                if s <= hi and e >= lo:
                    touched.add(name)
    # closure: a consumer of a touched helper is itself touched
    refs = _name_refs(head_src)
    changed = True
    while changed:
        changed = False
        for name, used in refs.items():
            if name not in touched and used & touched:
                touched.add(name)
                changed = True
    return touched


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=None)
    ap.add_argument("--window", type=int, default=WINDOW)
    args = ap.parse_args()
    base = args.base or _default_base()

    changed_files = set(
        _git("diff", "--name-only", base, "--", PKG).splitlines()
    ) | set(_git("diff", "--name-only", "--", PKG).splitlines())
    changed_files = {f for f in changed_files if f.endswith(".py")}

    from kafkatosparktokudu_spark.plans.oracle import ORACLE_SQL
    from kafkatosparktokudu_spark.plans.queries import QUERIES

    order = list(QUERIES)
    with open(os.path.join(REPO, "fixtures", "query_deps.json"), encoding="utf-8") as fh:
        deps = json.load(fh)

    affected: set[str] = set()
    for plans_file, keys in (
        (f"{PKG}/plans/queries.py", set(QUERIES)),
        (f"{PKG}/plans/oracle.py", set(ORACLE_SQL)),
    ):
        if plans_file not in changed_files:
            continue
        base_src = _git("show", f"{base}:{plans_file}")
        with open(os.path.join(REPO, plans_file), encoding="utf-8") as fh:
            head_src = fh.read()
        affected |= _changed_names(base_src, head_src) & keys
    for f in changed_files - {f"{PKG}/plans/queries.py", f"{PKG}/plans/oracle.py"}:
        affected |= {q for q, files in deps.items() if f in files}

    missing = [q for q in sorted(affected) if q not in deps and q in order]
    window = order[: args.window]
    overflow = sorted(q for q in affected if q in order and q not in set(window))
    idle_slots = [q for q in window if q not in affected]
    print(f"base: {base[:12]}  changed package files: {len(changed_files)}")
    print(f"affected queries ({len(affected)}): {sorted(affected)}")
    if missing:
        print(f"NOT IN DEPS MAP (regenerate gen_query_deps.py): {missing}")
    if not overflow:
        print(
            f"rotation OK: all affected queries sit inside the "
            f"front-{args.window} window"
        )
        return 0
    # Wide-refactor rounds can implicate more queries than the window
    # holds. The invariant then: the window must be SATURATED — no slot
    # wasted on an unaffected query while an affected one waits outside.
    if not idle_slots:
        print(
            f"rotation OK (window saturated): {len(overflow)} affected "
            f"queries overflow a fully-packed front-{args.window} — quote "
            f"the overflow in NOTES for next round's rotation: {overflow}"
        )
        return 0
    print(
        f"ROTATION VIOLATION: affected queries outside the window "
        f"({len(overflow)}): {overflow}\n"
        f"while unaffected queries hold window slots ({len(idle_slots)}): "
        f"{idle_slots}"
    )
    return 1


if __name__ == "__main__":
    sys.exit(main())
