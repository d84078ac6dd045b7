"""Generate the deterministic OGG change-record fixture (FIXTURES.md §B.1).

One JSON per line, modeling the records the reference consumes at
/root/reference/.../KuduManager.scala:50-64 (fields: table, op_type,
current_ts, after, after.ID) plus an explicit ``pos`` (arrival sequence —
stands in for the Kafka offset so batch tests and the DuckDB oracle order
ties identically).

Covers: inserts + partial updates on the same key, soft deletes,
out-of-order current_ts, exact duplicate records, null-table control rows,
malformed JSON lines, two interleaved tables, mixed-case qualifiers.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "fixtures" / "ogg_changes.jsonl"


def ts(i: int) -> str:
    # fixed-width ISO with microseconds → lexicographic order == time order
    base = i
    return (
        f"2024-01-01T{base // 3600:02d}:{(base // 60) % 60:02d}:{base % 60:02d}."
        f"{(i * 137) % 1000000:06d}"
    )


def main() -> None:
    rng = random.Random(42)
    lines: list[str] = []
    pos = 0

    def emit(obj_or_raw) -> None:
        nonlocal pos
        if isinstance(obj_or_raw, str):
            lines.append(obj_or_raw)
        else:
            obj_or_raw["pos"] = pos
            lines.append(json.dumps(obj_or_raw, ensure_ascii=False))
        pos += 1

    emp_tables = ["SCOTT.EMP", "SCOTT.Emp", "scott.emp"]  # case-normalization
    dept_tables = ["SCOTT.DEPT", "SCOTT.Dept"]
    names = ["alice", "bob", "carol", "dan", "erin", "frank", "grace", "heidi"]

    t = 0
    # emp inserts ids 1..80
    for i in range(1, 81):
        t += rng.randint(1, 5)
        emit(
            {
                "table": rng.choice(emp_tables),
                "op_type": "I",
                "current_ts": ts(t),
                "after": {
                    "ID": str(i),
                    "NAME": rng.choice(names),
                    "SALARY": f"{rng.randint(800, 5000)}.{rng.randint(0, 99):02d}",
                    "DEPT_ID": str(rng.choice([10, 20, 30])),
                    "ACTIVE": rng.choice(["1", "0"]),
                    "HIRE_TS": ts(rng.randint(0, 1000)),
                },
            }
        )
    # dept inserts
    for d in (10, 20, 30):
        t += rng.randint(1, 5)
        emit(
            {
                "table": rng.choice(dept_tables),
                "op_type": "I",
                "current_ts": ts(t),
                "after": {"ID": str(d), "DNAME": f"dept{d}", "BUDGET": f"{d * 7}.5"},
            }
        )
    # partial updates (only SALARY, or only NAME) on some emp ids
    for i in rng.sample(range(1, 81), 70):
        t += rng.randint(1, 5)
        field = rng.choice(
            [
                {"SALARY": f"{rng.randint(900, 6000)}.{rng.randint(0, 99):02d}"},
                {"NAME": rng.choice(names)},
                {"ACTIVE": rng.choice(["1", "0"])},
            ]
        )
        emit(
            {
                "table": rng.choice(emp_tables),
                "op_type": "U",
                "current_ts": ts(t),
                "after": {"ID": str(i), **field},
            }
        )
    # soft deletes
    for i in rng.sample(range(1, 81), 14):
        t += rng.randint(1, 5)
        emit(
            {
                "table": rng.choice(emp_tables),
                "op_type": "D",
                "current_ts": ts(t),
                "after": {"ID": str(i)},
            }
        )
    # update AFTER delete for two of those ids (un-deletes, delete_state back to 0)
    for i in (7, 12):
        t += rng.randint(1, 5)
        emit(
            {
                "table": "SCOTT.EMP",
                "op_type": "U",
                "current_ts": ts(t),
                "after": {"ID": str(i), "SALARY": "9999.99"},
            }
        )
    # out-of-order current_ts: stale updates that must LOSE last-write-wins
    for i in (1, 2, 3):
        emit(
            {
                "table": "SCOTT.EMP",
                "op_type": "U",
                "current_ts": ts(0),  # far in the past
                "after": {"ID": str(i), "NAME": "stale", "SALARY": "1.00"},
            }
        )
    # exact duplicates (at-least-once replay) — same ts, same payload
    dup = {
        "table": "SCOTT.EMP",
        "op_type": "U",
        "current_ts": ts(t + 100),
        "after": {"ID": "5", "SALARY": "4242.42"},
    }
    emit(dict(dup))
    emit(dict(dup))
    # dept updates
    for d in (10, 20):
        t += rng.randint(1, 5)
        emit(
            {
                "table": "SCOTT.DEPT",
                "op_type": "U",
                "current_ts": ts(t),
                "after": {"ID": str(d), "BUDGET": f"{d * 9}.25"},
            }
        )
    # control / garbage records (dropped: null table, missing after.ID, bad JSON)
    emit({"table": None, "op_type": None, "current_ts": None, "after": None})
    emit({"table": "SCOTT.EMP", "op_type": "U", "current_ts": ts(t + 1), "after": {}})
    emit('{"this is not json": }')
    emit("not json at all")
    # explicit-null payload value (treated same as absent — skipped)
    t += 1
    emit(
        {
            "table": "SCOTT.EMP",
            "op_type": "U",
            "current_ts": ts(t + 200),
            "after": {"ID": "9", "NAME": None, "SALARY": "777.77"},
        }
    )

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"wrote {len(lines)} lines to {OUT}")


if __name__ == "__main__":
    main()
