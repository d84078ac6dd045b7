"""CDC golden + property tests (SURVEY.md §5.2).

The oracle here is an independent pure-Python replay of the reference
semantics (apply records one by one in (current_ts, arrival) order —
upsert / partial update / soft delete / pub_event), compared against the
Spark fold+merge pipeline.
"""

from __future__ import annotations

import datetime as dt
import json
import math
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from kafkatosparktokudu_spark.cdc import apply_changes, read_fixture, sync_batch
from kafkatosparktokudu_spark.catalog import default_catalog
from kafkatosparktokudu_spark.operators.merge import StateStore, merge_upserts

FIXTURE = Path("/root/repo/fixtures/ogg_changes.jsonl")
NOW = "2024-06-01 00:00:00"


# ---------------------------------------------------------------------------
# pure-Python reference replay
# ---------------------------------------------------------------------------
def _parse_lines(lines: list[str], pos_offset: int = 0):
    recs = []
    for i, line in enumerate(lines):
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if not isinstance(obj, dict):
            continue
        table, after = obj.get("table"), obj.get("after")
        if (
            table is None
            or "." not in table
            or not isinstance(after, dict)
            or after.get("ID") is None
        ):
            continue
        pos = obj.get("pos", pos_offset + i)
        recs.append((obj.get("current_ts"), pos, table, obj.get("op_type"), after))
    return recs


def python_replay(batches: list[list[str]]):
    """Apply batches sequentially; records within a batch in (ts, pos) order
    (the engine's LWW order). Returns ({tab: {id: row}}, pub_event)."""
    state: dict[str, dict[str, dict]] = {}
    pub: dict[tuple[str, str], str] = {}
    for batch in batches:
        recs = sorted(_parse_lines(batch), key=lambda r: (r[0], r[1]))
        for ts, pos, table, op, after in recs:
            tab = table.split(".")[1].lower()
            pk = str(after["ID"])
            prev = pub.get((pk, tab))
            norm_ts = ts.replace("T", " ")
            pub[(pk, tab)] = max(prev, norm_ts) if prev else norm_ts
            row = state.setdefault(tab, {}).setdefault(pk, {})
            if op == "D":
                row["delete_state"] = "1"
            else:
                row["delete_state"] = "0"
                for k, v in after.items():
                    if k == "ID" or v is None:
                        continue
                    row[k.lower()] = v
    return state, pub


def _typed(row: dict, tab: str):
    """Cast the python-oracle string row to catalog types."""
    def g(k):
        return row.get(k)

    if tab == "emp":
        return {
            "name": g("name"),
            "salary": float(g("salary")) if g("salary") else None,
            "dept_id": int(g("dept_id")) if g("dept_id") else None,
            "active": {"1": True, "0": False}.get(g("active")),
            "hire_ts": dt.datetime.fromisoformat(g("hire_ts")) if g("hire_ts") else None,
            "delete_state": g("delete_state"),
        }
    return {
        "dname": g("dname"),
        "budget": float(g("budget")) if g("budget") else None,
        "delete_state": g("delete_state"),
    }


def _spark_state_to_dict(df, tab: str):
    out = {}
    for r in df.collect():
        d = r.asDict()
        d.pop("time_stamp", None)
        pk = d.pop("id")
        if tab == "dept" and d.get("budget") is not None:
            # float32 → compare at float32 precision
            d["budget"] = float(d["budget"])
        out[pk] = d
    return out


def _assert_tables_match(spark_states, py_state, tabs=("emp", "dept")):
    for tab in tabs:
        got = _spark_state_to_dict(spark_states[tab], tab)
        want = {pk: _typed(row, tab) for pk, row in py_state.get(tab, {}).items()}
        assert set(got) == set(want), f"{tab}: key sets differ"
        for pk in want:
            for col, wv in want[pk].items():
                gv = got[pk][col]
                if isinstance(wv, float) and wv is not None and gv is not None:
                    assert math.isclose(gv, wv, rel_tol=1e-6), (tab, pk, col, gv, wv)
                else:
                    assert gv == wv, (tab, pk, col, gv, wv)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def fixture_lines() -> list[str]:
    return FIXTURE.read_text().splitlines()


def test_apply_changes_matches_python_oracle(spark, fixture_lines):
    states = apply_changes(spark, read_fixture(spark), now_str=NOW)
    py_state, py_pub = python_replay([fixture_lines])
    _assert_tables_match(states, py_state)
    # pub_event: latest normalized ts per (id, name), constants '0'
    got = {
        (r["id"], r["name"]): (r["current_ts"], r["delete_state"], r["his_delete_state"])
        for r in states["pub_event"].collect()
    }
    want = {k: (v, "0", "0") for k, v in py_pub.items()}
    assert got == want


def test_soft_delete_and_resurrection(spark, fixture_lines):
    """Deleted keys keep payload (logical delete); a later U resurrects."""
    states = apply_changes(spark, read_fixture(spark), now_str=NOW)
    emp = {r["id"]: r.asDict() for r in states["emp"].collect()}
    py_state, _ = python_replay([fixture_lines])
    deleted = [pk for pk, row in py_state["emp"].items() if row["delete_state"] == "1"]
    assert deleted, "fixture must contain net-deleted keys"
    for pk in deleted:
        assert emp[pk]["delete_state"] == "1"
    # ids 7 and 12 were deleted then updated → resurrected
    for pk in ("7", "12"):
        if py_state["emp"][pk]["delete_state"] == "0":
            assert emp[pk]["delete_state"] == "0"
            assert emp[pk]["salary"] == 9999.99


def test_lww_stale_updates_lose(spark, fixture_lines):
    """Out-of-order current_ts records must not win (fixture ids 1-3)."""
    states = apply_changes(spark, read_fixture(spark), now_str=NOW)
    emp = {r["id"]: r.asDict() for r in states["emp"].collect()}
    for pk in ("1", "2", "3"):
        assert emp[pk]["name"] != "stale"
        assert emp[pk]["salary"] != 1.0


def test_incremental_sync_matches_single_batch(spark, fixture_lines, tmp_path):
    """Splitting the stream into two micro-batches and merging through the
    StateStore gives the same final state as one-shot replay (the fixture's
    cross-batch records are either disjoint or arrival-ordered)."""
    mid = len(fixture_lines) // 2
    b1, b2 = fixture_lines[:mid], fixture_lines[mid:]
    wh = str(tmp_path / "wh")
    for b in (b1, b2):
        df = spark.createDataFrame([(line,) for line in b], "value string")
        sync_batch(spark, df, wh, now_str=NOW, n_buckets=8)
    py_state, py_pub = python_replay([b1, b2])
    cat = default_catalog()
    for tab in ("emp", "dept"):
        store = StateStore(spark, f"{wh}/{tab}", ["id"], cat[tab].full_schema, 8)
        got = _spark_state_to_dict(store.read(), tab)
        want = {pk: _typed(row, tab) for pk, row in py_state.get(tab, {}).items()}
        assert set(got) == set(want)
        for pk in want:
            for col, wv in want[pk].items():
                gv = got[pk][col]
                if isinstance(wv, float) and wv is not None and gv is not None:
                    assert math.isclose(gv, wv, rel_tol=1e-6), (tab, pk, col, gv, wv)
                else:
                    assert gv == wv, (tab, pk, col, gv, wv)


def test_replay_idempotence(spark, fixture_lines, tmp_path):
    """At-least-once: re-syncing the same batch leaves state unchanged
    (reference semantics #5 — upsert absorbs duplicates)."""
    wh = str(tmp_path / "wh")
    df = spark.createDataFrame([(line,) for line in fixture_lines], "value string")
    sync_batch(spark, df, wh, now_str=NOW, n_buckets=8)
    cat = default_catalog()
    store = StateStore(spark, f"{wh}/emp", ["id"], cat["emp"].full_schema, 8)
    before = sorted([tuple(r) for r in store.read().collect()], key=repr)
    sync_batch(spark, df, wh, now_str=NOW, n_buckets=8)  # replay
    after = sorted([tuple(r) for r in store.read().collect()], key=repr)
    assert before == after


def test_dead_letters_counted(spark, fixture_lines, tmp_path):
    """Bad input dropped, not fatal (S10): null-table, missing ID, bad JSON."""
    df = spark.createDataFrame([(line,) for line in fixture_lines], "value string")
    m = sync_batch(spark, df, str(tmp_path / "wh"), now_str=NOW, n_buckets=8)
    assert m.dead == 4  # null-table, empty-after, 2 malformed lines
    assert m.total == len(fixture_lines)  # every consumed record, like the reference
    assert m.valid == len(fixture_lines) - 4
    assert m.tables == ["dept", "emp"]


def test_merge_upserts_partial_update(spark):
    """Column-wise coalesce: null batch columns keep prior state."""
    state = spark.createDataFrame(
        [("1", "alice", 100.0, "0", "t0")],
        "id string, name string, salary double, delete_state string, time_stamp string",
    )
    batch = spark.createDataFrame(
        [("1", None, 200.0, "0", "t1"), ("2", "bob", 50.0, "0", "t1")],
        "id string, name string, salary double, delete_state string, time_stamp string",
    )
    got = {r["id"]: r.asDict() for r in merge_upserts(state, batch, ["id"]).collect()}
    assert got["1"] == {"id": "1", "name": "alice", "salary": 200.0,
                        "delete_state": "0", "time_stamp": "t1"}
    assert got["2"]["name"] == "bob"


def test_dead_letter_capture(spark, tmp_path):
    """With dead_letter_dir set, bad records land in parquet with a reason
    and the count matches; good records are unaffected."""
    good = [
        '{"table": "SCOTT.EMP", "op_type": "I", "current_ts": '
        '"2024-01-01T10:00:00.000000", "pos": 1, "after": {"ID": "1", "NAME": "a"}}',
        '{"table": "SCOTT.EMP", "op_type": "U", "current_ts": '
        '"2024-01-01T11:00:00.000000", "pos": 2, "after": {"ID": "1", "NAME": "b"}}',
    ]
    bad = [
        "not json at all",
        '{"op_type": "I", "after": {"ID": "9"}}',        # null table
        '{"table": "NODOTS", "op_type": "I", "after": {"ID": "9"}}',  # no qualifier
        '{"table": "S.T", "op_type": "I"}',               # missing after
        '{"table": "S.T", "op_type": "I", "after": {}}',  # missing pk
    ]
    raw = spark.createDataFrame([(l,) for l in good + bad], "value string")
    dl = str(tmp_path / "dead")
    m = sync_batch(spark, raw, str(tmp_path / "wh"), dead_letter_dir=dl)
    assert m.dead == len(bad)
    captured = spark.read.parquet(dl)
    assert captured.count() == len(bad)
    reasons = {r["raw"]: r["reason"] for r in captured.collect()}
    assert reasons["not json at all"] == "null_table_or_unparseable"
    assert (
        reasons['{"table": "NODOTS", "op_type": "I", "after": {"ID": "9"}}']
        == "malformed_table_name"
    )
    assert reasons['{"table": "S.T", "op_type": "I"}'] == "missing_after"
    assert reasons['{"table": "S.T", "op_type": "I", "after": {}}'] == "missing_pk"


def test_affected_buckets_match_store(spark, fixture_lines):
    """affected_buckets (computed from PRE-fold keys, no fold job) must
    equal the bucket set StateStore._bucket_col assigns to the TYPED folded
    batch — an under-approximation would make upsert_many swap in a bucket
    whose prior state was never read (silent history loss)."""
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.catalog import PUB_EVENT_SCHEMA, TargetTable
    from kafkatosparktokudu_spark.cdc import affected_buckets
    from kafkatosparktokudu_spark.operators.ogg import (
        cast_payload,
        derive_pub_event,
        fold_table_changes,
        normalize,
        parse_ogg,
        split_valid,
        with_time_stamp,
    )

    # int-typed key with leading zeros: '007' and '7' must hash to ONE
    # bucket (the typed batch casts before hashing; affected_buckets must
    # do the same cast or it would predict two buckets for one key — an
    # over-approximation is safe, but the key-set equality below is strict
    # so the test pins exact agreement)
    acct_lines = [
        '{"table": "S.ACCT", "op_type": "I", "current_ts": '
        '"2024-01-01T10:00:00.000000", "pos": 900, "after": {"ID": "007", "BAL": "1"}}',
        '{"table": "S.ACCT", "op_type": "U", "current_ts": '
        '"2024-01-01T11:00:00.000000", "pos": 901, "after": {"ID": "7", "BAL": "2"}}',
    ]
    acct = TargetTable(
        "acct",
        "id",
        T.StructType(
            [
                T.StructField("id", T.IntegerType(), False),
                T.StructField("bal", T.DoubleType(), True),
            ]
        ),
    )
    catalog = dict(default_catalog(), acct=acct)
    raw = spark.createDataFrame(
        [(l,) for l in fixture_lines + acct_lines], "value string"
    )
    valid, _ = split_valid(parse_ogg(raw))
    norm = normalize(valid)
    n_buckets = 7
    aff = affected_buckets(norm, catalog, n_buckets)

    for name, target in catalog.items():
        typed = with_time_stamp(
            cast_payload(
                fold_table_changes(norm.filter(F.col("tab_name") == name), target),
                target,
            ),
            NOW,
        )
        store = StateStore(
            spark, f"/tmp/unused/{name}", [target.key], target.full_schema, n_buckets
        )
        actual = {
            r[0]
            for r in typed.select(store._bucket_col().alias("b")).distinct().collect()
        }
        assert actual == set(aff.get(name, [])), name
    ev_store = StateStore(
        spark, "/tmp/unused/pub_event", ["id", "name"], PUB_EVENT_SCHEMA, n_buckets
    )
    ev = derive_pub_event(norm, NOW)
    actual = {
        r[0] for r in ev.select(ev_store._bucket_col().alias("b")).distinct().collect()
    }
    assert actual == set(aff["pub_event"])
    assert len(aff["acct"]) == 1  # '007' and '7' folded into one int key


def test_state_store_schema_evolution(spark, tmp_path):
    """Adding a column to a target's catalog schema must be a no-op for
    existing state: old files lack the column (parquet reads it as null),
    the next merge writes it for touched rows, untouched rows keep null —
    the add-column path a live CDC target actually goes through."""
    from pyspark.sql import types as T

    v1 = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    v2 = T.StructType(list(v1.fields) + [T.StructField("extra", T.StringType(), True)])
    path = str(tmp_path / "tab")
    s1 = StateStore(spark, path, ["id"], v1, 4)
    s1.upsert_batch(spark.createDataFrame([("1", "a"), ("2", "b")], v1))

    s2 = StateStore(spark, path, ["id"], v2, 4)
    # read-before-write: old files surface the new column as null
    pre = {r["id"]: r["extra"] for r in s2.read().collect()}
    assert pre == {"1": None, "2": None}
    s2.upsert_batch(spark.createDataFrame([("2", "b2", "x"), ("3", "c", "y")], v2))
    got = {r["id"]: (r["v"], r["extra"]) for r in s2.read().collect()}
    assert got == {"1": ("a", None), "2": ("b2", "x"), "3": ("c", "y")}


def test_incremental_rollup_moves_deletes_partials(spark, tmp_path):
    """Delta maintenance must handle the three IVM subtleties: a key moving
    groups (old group loses, new group gains), a soft delete (contribution
    withdrawn), and a partial update (unchanged values keep contributing)."""
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.operators.rollup import (
        rollup_schema,
        sync_with_rollup,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("dept_id", T.IntegerType(), True),
            T.StructField("salary", T.DoubleType(), True),
            T.StructField("delete_state", T.StringType(), True),
            T.StructField("time_stamp", T.StringType(), True),
        ]
    )
    state = StateStore(spark, str(tmp_path / "emp"), ["id"], schema, 4)
    rollup = StateStore(
        spark,
        str(tmp_path / "roll"),
        ["dept_id"],
        __import__(
            "kafkatosparktokudu_spark.operators.rollup", fromlist=["rollup_schema"]
        ).rollup_schema(T.StructField("dept_id", T.IntegerType(), False)),
        4,
    )
    b1 = spark.createDataFrame(
        [
            ("1", 10, 100.0, "0", "t"),
            ("2", 10, 200.0, "0", "t"),
            ("3", 20, 300.0, "0", "t"),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            ("1", 20, None, "0", "t"),   # moves dept 10 → 20, salary kept
            ("2", None, None, "1", "t"),  # soft delete
            ("4", 10, 50.0, "0", "t"),    # new hire
            ("3", None, None, "0", "t"),  # partial no-op update
        ],
        schema,
    )
    for b in (b1, b2):
        sync_with_rollup(spark, state, b, rollup, "dept_id", "salary")
    got = {
        r["dept_id"]: (r["n_alive"], float(r["sum_dec"]))
        for r in rollup.read().filter(F.col("n_alive") > 0).collect()
    }
    assert got == {10: (1, 50.0), 20: (2, 400.0)}


def test_sync_batch_maintains_rollup_view(spark, fixture_lines, tmp_path):
    """sync_batch(rollups=[...]) must keep the dept view equal to a direct
    aggregation of the final state after every batch — exercised with the
    bucket-superset delta path (pre/post snapshots are whole affected
    buckets; untouched rows cancel exactly)."""
    from kafkatosparktokudu_spark.cdc import RollupSpec

    wh = str(tmp_path / "wh")
    spec = RollupSpec(table="emp", group_col="dept_id", sum_col="salary")
    mid = len(fixture_lines) // 2
    cat = default_catalog()
    for b in (fixture_lines[:mid], fixture_lines[mid:]):
        df = spark.createDataFrame([(line,) for line in b], "value string")
        sync_batch(spark, df, wh, now_str=NOW, n_buckets=8, rollups=[spec])
        view = {
            r["dept_id"]: (r["n_alive"], float(r["sum_dec"]))
            for r in spec.store(spark, wh, 8)
            .read()
            .filter(F.col("n_alive") > 0)
            .collect()
        }
        state = StateStore(spark, f"{wh}/emp", ["id"], cat["emp"].full_schema, 8)
        direct = {
            r["dept_id"]: (r["n"], float(r["s"]))
            for r in state.read()
            .filter((F.col("delete_state") != "1") & F.col("dept_id").isNotNull())
            .groupBy("dept_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("salary").cast("decimal(22,2)")).alias("s"),
            )
            .collect()
        }
        assert view == direct


def _emp_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("dept_id", T.IntegerType(), True),
            T.StructField("salary", T.DoubleType(), True),
            T.StructField("delete_state", T.StringType(), True),
            T.StructField("time_stamp", T.StringType(), True),
        ]
    )


def _dept_rollup_store(spark, path):
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.operators.rollup import rollup_schema

    return StateStore(
        spark,
        path,
        ["dept_id"],
        rollup_schema(T.StructField("dept_id", T.IntegerType(), False)),
        4,
    )


def _view_vs_direct(state, rollup):
    view = {
        r["dept_id"]: (r["n_alive"], float(r["sum_dec"]))
        for r in rollup.read().filter(F.col("n_alive") > 0).collect()
    }
    direct = {
        r["dept_id"]: (r["n"], float(r["s"]))
        for r in state.read()
        .filter(
            (F.col("delete_state").isNull() | (F.col("delete_state") != "1"))
            & F.col("dept_id").isNotNull()
        )
        .groupBy("dept_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("salary").cast("decimal(22,2)")).alias("s"),
        )
        .collect()
    }
    return view, direct


def test_rollup_replay_crash_between_merge_and_apply(spark, tmp_path):
    """The exact failure VERDICT r4 #2 named: die AFTER the base merge,
    BEFORE the rollup write. The write-ahead pending delta (staged durably
    pre-merge) must make the replayed epoch converge — without it the
    replay recomputes pre == post and the batch's contribution is lost."""
    from kafkatosparktokudu_spark.operators.rollup import (
        maintain_rollup,
        read_pending,
        rollup_delta,
        sync_with_rollup,
        write_pending,
    )
    from kafkatosparktokudu_spark.operators.merge import merge_upserts

    schema = _emp_schema()
    state = StateStore(spark, str(tmp_path / "emp"), ["id"], schema, 4)
    rollup = _dept_rollup_store(spark, str(tmp_path / "roll"))
    b1 = spark.createDataFrame(
        [("1", 10, 100.0, "0", "t"), ("2", 20, 200.0, "0", "t")], schema
    )
    sync_with_rollup(spark, state, b1, rollup, "dept_id", "salary", epoch=0)

    # epoch 1, first attempt: replicate sync_with_rollup's epoch path up to
    # and including the base merge, then "crash" (no rollup apply).
    b2 = spark.createDataFrame(
        [("1", 20, None, "0", "t"), ("3", 10, 50.0, "0", "t")], schema
    )
    keys = b2.select(state.key_cols).distinct()
    pre = state.read().join(keys, state.key_cols).localCheckpoint()
    post_est = merge_upserts(pre, b2, state.key_cols)
    write_pending(rollup_delta(pre, post_est, "dept_id", "salary"), rollup, 1)
    state.upsert_batch(b2)
    # -- crash here --

    # replay of epoch 1 (checkpoint re-delivers the same batch)
    sync_with_rollup(spark, state, b2, rollup, "dept_id", "salary", epoch=1)
    view, direct = _view_vs_direct(state, rollup)
    # id1 moved 10 → 20 keeping its 100 salary (partial update), id3 joined
    # dept 10 — the replayed epoch recovered BOTH sides of the move.
    assert view == direct == {10: (1, 50.0), 20: (2, 300.0)}


def test_rollup_replay_does_not_double_apply(spark, tmp_path):
    """Crash AFTER the rollup apply but BEFORE the pending cleanup: the
    per-group last_epoch stamp must make the re-applied stored delta a
    no-op (each group is in exactly one atomically-swapped bucket, so the
    stamp and the values move together)."""
    from kafkatosparktokudu_spark.operators.rollup import (
        rollup_delta,
        sync_with_rollup,
        write_pending,
    )
    from kafkatosparktokudu_spark.operators.merge import merge_upserts

    schema = _emp_schema()
    state = StateStore(spark, str(tmp_path / "emp"), ["id"], schema, 4)
    rollup = _dept_rollup_store(spark, str(tmp_path / "roll"))
    b1 = spark.createDataFrame(
        [("1", 10, 100.0, "0", "t"), ("2", 20, 200.0, "0", "t")], schema
    )
    sync_with_rollup(spark, state, b1, rollup, "dept_id", "salary", epoch=0)
    b2 = spark.createDataFrame([("3", 10, 50.0, "0", "t")], schema)
    # keep a copy of what epoch 1's write-ahead delta was, then run the
    # epoch to full commit (apply + cleanup)
    pre = state.read().join(
        b2.select(state.key_cols).distinct(), state.key_cols
    ).localCheckpoint()
    delta_rows = rollup_delta(
        pre, merge_upserts(pre, b2, state.key_cols), "dept_id", "salary"
    )
    sync_with_rollup(spark, state, b2, rollup, "dept_id", "salary", epoch=1)
    # "crash before clear_pending": restore the pending dir and replay
    write_pending(delta_rows, rollup, 1)
    sync_with_rollup(spark, state, b2, rollup, "dept_id", "salary", epoch=1)
    view, direct = _view_vs_direct(state, rollup)
    assert view == direct == {10: (2, 150.0), 20: (1, 200.0)}


def test_sync_batch_epoch_replay_converges(spark, fixture_lines, tmp_path):
    """Full fused path: replaying an epoch through sync_batch (same batch,
    same epoch_id — Structured Streaming's replay contract) must leave the
    base tables AND the maintained view exactly where one delivery would."""
    from kafkatosparktokudu_spark.cdc import RollupSpec

    wh = str(tmp_path / "wh")
    spec = RollupSpec(table="emp", group_col="dept_id", sum_col="salary")
    cat = default_catalog()
    mid = len(fixture_lines) // 2
    for epoch, b in enumerate((fixture_lines[:mid], fixture_lines[mid:])):
        df = spark.createDataFrame([(line,) for line in b], "value string")
        sync_batch(
            spark, df, wh, now_str=NOW, n_buckets=8, rollups=[spec],
            epoch_id=epoch,
        )
        if epoch == 1:  # replay the final epoch end-to-end
            sync_batch(
                spark, df, wh, now_str=NOW, n_buckets=8, rollups=[spec],
                epoch_id=epoch,
            )
    state = StateStore(spark, f"{wh}/emp", ["id"], cat["emp"].full_schema, 8)
    view, direct = _view_vs_direct(state, spec.store(spark, wh, 8))
    assert view == direct and view


def test_sync_batch_rejects_unknown_rollup_table(spark, fixture_lines, tmp_path):
    """A RollupSpec naming a table absent from the catalog must raise a
    clear ValueError up front, not an opaque StopIteration mid-merge."""
    import pytest

    from kafkatosparktokudu_spark.cdc import RollupSpec

    df = spark.createDataFrame([(fixture_lines[0],)], "value string")
    with pytest.raises(ValueError, match="nope"):
        sync_batch(
            spark,
            df,
            str(tmp_path / "wh"),
            now_str=NOW,
            rollups=[RollupSpec(table="nope", group_col="x", sum_col="y")],
        )


def test_incremental_rollup_null_sum_does_not_clobber(spark, tmp_path):
    """A batch whose only contribution to a group carries a NULL sum column
    must produce d_sum = 0, not NULL — a NULL delta would wipe the group's
    accumulated sum on addition (regression from review)."""
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.operators.rollup import (
        rollup_schema,
        sync_with_rollup,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("dept_id", T.IntegerType(), True),
            T.StructField("salary", T.DoubleType(), True),
            T.StructField("delete_state", T.StringType(), True),
            T.StructField("time_stamp", T.StringType(), True),
        ]
    )
    state = StateStore(spark, str(tmp_path / "emp"), ["id"], schema, 4)
    rollup = StateStore(
        spark,
        str(tmp_path / "roll"),
        ["dept_id"],
        __import__(
            "kafkatosparktokudu_spark.operators.rollup", fromlist=["rollup_schema"]
        ).rollup_schema(T.StructField("dept_id", T.IntegerType(), False)),
        4,
    )
    b1 = spark.createDataFrame([("1", 30, 500.0, "0", "t")], schema)
    # new hire in dept 30 with salary never set
    b2 = spark.createDataFrame([("2", 30, None, "0", "t")], schema)
    for b in (b1, b2):
        sync_with_rollup(spark, state, b, rollup, "dept_id", "salary")
    got = {
        r["dept_id"]: (r["n_alive"], float(r["sum_dec"]))
        for r in rollup.read().collect()
    }
    assert got == {30: (2, 500.0)}


def test_upsert_many_unsafe_table_name_falls_back(spark, tmp_path):
    """A table name Spark would percent-escape in a partition path must
    route through per-table upserts (the combined staged write's literal
    directory lookup would silently drop the batch)."""
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.operators.merge import upsert_many

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    store = StateStore(spark, str(tmp_path / "na:me"), ["id"], schema, 4)
    upsert_many(spark, [(store, spark.createDataFrame([("1", "a")], schema))])
    upsert_many(spark, [(store, spark.createDataFrame([("1", "b"), ("2", "c")], schema))])
    got = {r["id"]: r["v"] for r in store.read().collect()}
    assert got == {"1": "b", "2": "c"}


def test_upsert_many_same_basename_distinct_dirs(spark, tmp_path):
    """Two stores from DIFFERENT parent dirs with the SAME basename must
    keep distinct state (VERDICT r4 #5): the combined staged write tags
    rows by basename only, so such a pair falls back to per-table upserts
    instead of cross-merging on the shared ``_table=`` tag."""
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.operators.merge import upsert_many

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    s1 = StateStore(spark, str(tmp_path / "wh1" / "emp"), ["id"], schema, 4)
    s2 = StateStore(spark, str(tmp_path / "wh2" / "emp"), ["id"], schema, 4)
    upsert_many(
        spark,
        [
            (s1, spark.createDataFrame([("1", "a1"), ("2", "a2")], schema)),
            (s2, spark.createDataFrame([("1", "b1")], schema)),
        ],
    )
    upsert_many(
        spark,
        [
            (s1, spark.createDataFrame([("2", "a2x")], schema)),
            (s2, spark.createDataFrame([("3", "b3")], schema)),
        ],
    )
    got1 = {r["id"]: r["v"] for r in s1.read().collect()}
    got2 = {r["id"]: r["v"] for r in s2.read().collect()}
    assert got1 == {"1": "a1", "2": "a2x"}
    assert got2 == {"1": "b1", "3": "b3"}


def test_minmax_rollup_moves_deletes_partials(spark, tmp_path):
    """Min/max is non-invertible, so the view must be refreshed by
    re-aggregating TOUCHED groups — deleting the current max, moving a key
    out of its group, and partial updates must all land exactly."""
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.operators.rollup import (
        minmax_schema,
        sync_with_minmax,
    )

    schema = _emp_schema()
    state = StateStore(spark, str(tmp_path / "emp"), ["id"], schema, 4)
    view = StateStore(
        spark,
        str(tmp_path / "mm"),
        ["dept_id"],
        minmax_schema(
            T.StructField("dept_id", T.IntegerType(), False), T.DoubleType()
        ),
        4,
    )
    b1 = spark.createDataFrame(
        [
            ("1", 10, 100.0, "0", "t"),
            ("2", 10, 900.0, "0", "t"),  # dept 10 max
            ("3", 20, 300.0, "0", "t"),
        ],
        schema,
    )
    sync_with_minmax(spark, state, b1, view, "dept_id", "salary")
    got = {
        r["dept_id"]: (r["min_val"], r["max_val"], r["n_alive"])
        for r in view.read().collect()
    }
    assert got == {10: (100.0, 900.0, 2), 20: (300.0, 300.0, 1)}

    b2 = spark.createDataFrame(
        [
            ("2", None, None, "1", "t"),   # delete the dept-10 max
            ("3", 10, None, "0", "t"),     # move 20 → 10, salary 300 kept
            ("4", 30, 50.0, "0", "t"),     # new dept
        ],
        schema,
    )
    sync_with_minmax(spark, state, b2, view, "dept_id", "salary")
    got = {
        r["dept_id"]: (r["min_val"], r["max_val"], r["n_alive"])
        for r in view.read().collect()
    }
    # dept 10: max 900 retired by the delete; 300 arrived with key 3
    # dept 20: emptied by the move — explicit zero row, not a stale extreme
    assert got == {
        10: (100.0, 300.0, 2),
        20: (None, None, 0),
        30: (50.0, 50.0, 1),
    }
    # idempotent: replaying the same batch converges to the same view
    sync_with_minmax(spark, state, b2, view, "dept_id", "salary")
    again = {
        r["dept_id"]: (r["min_val"], r["max_val"], r["n_alive"])
        for r in view.read().collect()
    }
    assert again == got


def test_statestore_lookup_point_reads(spark, tmp_path):
    """lookup() must return exactly the requested keys' rows while
    scanning only their buckets (the Kudu point-read analog)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    store = StateStore(spark, str(tmp_path / "pt"), ["id"], schema, 16)
    store.upsert_batch(
        spark.createDataFrame([(str(i), f"v{i}") for i in range(200)], schema)
    )
    got = {r["id"]: r["v"] for r in store.lookup(["7", "42", "199", "nope"]).collect()}
    assert got == {"7": "v7", "42": "v42", "199": "v199"}
    # bucket pruning is observable in the plan: the pruned scan reads a
    # strict subset of the bucket partitions
    df = store.lookup(["7"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"partition filters: \[.*?\]", plan, re.I)
    assert "_bucket" in plan.lower(), plan
    assert store.lookup([]).count() == 0


def test_upsert_mid_swap_crash_replay_converges(spark, tmp_path):
    """S18 recovery claim: the staged bucket swap is atomic per BUCKET,
    not per batch — a crash mid-swap leaves some buckets new and some
    old. Checkpoint replay re-merges the same batch; upsert idempotence
    must converge every bucket to the post-batch state."""
    import shutil as sh

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    path = str(tmp_path / "st")
    store = StateStore(spark, path, ["id"], schema, 8)
    b1 = spark.createDataFrame([(str(i), f"a{i}") for i in range(40)], schema)
    store.upsert_batch(b1)
    snapshot = str(tmp_path / "snap")
    sh.copytree(path, snapshot)

    b2 = spark.createDataFrame(
        [(str(i), f"b{i}") for i in range(0, 40, 2)] + [("100", "new")], schema
    )
    store.upsert_batch(b2)
    # "crash mid-swap": revert half of the touched buckets to pre-batch2
    import os

    buckets = sorted(
        e for e in os.listdir(path) if e.startswith("_bucket=")
    )
    for e in buckets[: len(buckets) // 2]:
        pre = os.path.join(snapshot, e)
        if os.path.isdir(pre):
            sh.rmtree(os.path.join(path, e))
            sh.copytree(pre, os.path.join(path, e))

    # replay the epoch (checkpoint re-delivers the identical batch)
    store.upsert_batch(b2)
    got = {r["id"]: r["v"] for r in store.read().collect()}
    want = {str(i): (f"b{i}" if i % 2 == 0 else f"a{i}") for i in range(40)}
    want["100"] = "new"
    assert got == want


def test_statestore_rejects_remote_uri(spark, tmp_path):
    """ADVICE r10: the store's swap/snapshot/purge protocols are
    os.rename + hardlink based, so a remote URI would make exists()
    always-False — enrichment joins would silently see an EMPTY dimension
    side while writes kept landing. Fail fast at construction instead."""
    import pytest
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("id", T.StringType(), False)])
    for uri in ("hdfs://nn/x", "s3a://bucket/x", f"file:{tmp_path}/x"):
        with pytest.raises(ValueError, match="local-filesystem-only"):
            StateStore(spark, uri, ["id"], schema, 8)
    # plain local paths (absolute and relative) still construct
    StateStore(spark, str(tmp_path / "ok"), ["id"], schema, 8)


def _mk_kv_store(spark, path, n_buckets=8):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    return StateStore(spark, path, ["id"], schema, n_buckets), schema


def test_statestore_rebucket_equivalence(spark, tmp_path):
    """VERDICT r10 #2: rebucket migrates the store to a new hash geometry
    with identical contents, point lookups keep working, the persisted
    meta makes STALE call-site n_buckets arguments harmless, and upserts
    continue at the new geometry."""
    import os

    path = str(tmp_path / "st")
    store, schema = _mk_kv_store(spark, path, n_buckets=8)
    store.upsert_batch(
        spark.createDataFrame([(str(i), f"v{i}") for i in range(300)], schema)
    )
    before = sorted(tuple(r) for r in store.read().collect())

    store.rebucket(32)
    assert store.n_buckets == 32
    buckets = {
        int(e.split("=")[1])
        for e in os.listdir(path)
        if e.startswith("_bucket=")
    }
    assert buckets <= set(range(32)) and len(buckets) > 8
    assert sorted(tuple(r) for r in store.read().collect()) == before
    got = {r["id"]: r["v"] for r in store.lookup(["7", "299", "nope"]).collect()}
    assert got == {"7": "v7", "299": "v299"}
    assert not os.path.exists(path + ".__rebucket_old__")
    assert not os.path.exists(os.path.join(path, "_REBUCKET_COMMIT"))

    # a handle opened with the PRE-migration constructor default must
    # adopt the stored geometry (meta wins) — else its lookups would
    # prune with the wrong modulus and miss rows
    stale, _ = _mk_kv_store(spark, path, n_buckets=8)
    assert stale.n_buckets == 32
    got = {r["id"]: r["v"] for r in stale.lookup(["123"]).collect()}
    assert got == {"123": "v123"}

    # upserts continue at the new geometry; shrink migration also exact
    stale.upsert_batch(
        spark.createDataFrame([("7", "NEW"), ("1000", "x")], stale.schema)
    )
    stale.rebucket(4)
    want = {str(i): f"v{i}" for i in range(300)} | {"7": "NEW", "1000": "x"}
    assert {r["id"]: r["v"] for r in stale.read().collect()} == want
    assert stale.rebucket(4) is None  # no-op at current geometry


def test_statestore_rebucket_crash_replay(spark, tmp_path, monkeypatch):
    """Every crash window of the rebucket swap heals at the next handle
    construction: before the commit marker the migration vanishes; after
    it the swap completes — contents and point lookups intact either way."""
    import os

    from kafkatosparktokudu_spark.operators import merge as merge_mod

    path = str(tmp_path / "st")
    store, schema = _mk_kv_store(spark, path, n_buckets=8)
    store.upsert_batch(
        spark.createDataFrame([(str(i), f"v{i}") for i in range(120)], schema)
    )
    before = sorted(tuple(r) for r in store.read().collect())

    # window A: staged write never finished (no marker) -> rolled back
    os.makedirs(path + ".__rebucket_16__/_bucket=0", exist_ok=True)
    healed, _ = _mk_kv_store(spark, path, n_buckets=8)
    assert not os.path.exists(path + ".__rebucket_16__")
    assert healed.n_buckets == 8
    assert sorted(tuple(r) for r in healed.read().collect()) == before

    # windows B and C: crash at the 1st / 2nd os.rename of the swap
    for fail_at in (0, 1):
        st, _ = _mk_kv_store(spark, path)
        n_before = st.n_buckets
        real_rename, calls = os.rename, []

        def boom(src, dst, _real=real_rename, _calls=calls, _k=fail_at):
            if len(_calls) == _k:
                raise OSError("simulated crash mid-swap")
            _calls.append((src, dst))
            return _real(src, dst)

        monkeypatch.setattr(merge_mod.os, "rename", boom)
        try:
            st.rebucket(n_before * 2)
            raise AssertionError("expected simulated crash")
        except OSError:
            pass
        finally:
            monkeypatch.setattr(merge_mod.os, "rename", real_rename)

        recovered, _ = _mk_kv_store(spark, path, n_buckets=8)
        # the marker was already committed in both windows -> swap completes
        assert recovered.n_buckets == n_before * 2
        assert sorted(tuple(r) for r in recovered.read().collect()) == before
        got = {r["id"]: r["v"] for r in recovered.lookup(["42"]).collect()}
        assert got == {"42": "v42"}
        assert not os.path.exists(path + ".__rebucket_old__")
        for e in os.listdir(os.path.dirname(path)):
            assert "__rebucket_" not in e, e


def test_purge_soft_deleted_retention(spark, tmp_path):
    """Retention purge drops only soft-deleted rows older than the cutoff,
    rewrites only their buckets, removes buckets it empties, and is
    idempotent."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("v", T.StringType(), True),
            T.StructField("delete_state", T.StringType(), True),
            T.StructField("time_stamp", T.StringType(), True),
        ]
    )
    store = StateStore(spark, str(tmp_path / "ret"), ["id"], schema, 4)
    rows = [
        ("1", "a", "0", "2024-01-01 00:00:00"),   # live
        ("2", "b", "1", "2023-01-01 00:00:00"),   # old delete -> purged
        ("3", "c", "1", "2024-05-01 00:00:00"),   # recent delete -> kept
        ("4", "d", "1", "2022-06-01 00:00:00"),   # old delete -> purged
    ]
    store.upsert_batch(spark.createDataFrame(rows, schema))
    n = store.purge_soft_deleted("2024-01-01 00:00:00")
    assert n == 2
    got = {r["id"]: r["delete_state"] for r in store.read().collect()}
    assert got == {"1": "0", "3": "1"}
    assert store.purge_soft_deleted("2024-01-01 00:00:00") == 0  # idempotent
    # lookups still work against the rewritten layout
    assert {r["id"] for r in store.lookup(["1", "2", "3"]).collect()} == {"1", "3"}


def test_snapshot_isolated_from_concurrent_merge(spark, tmp_path):
    """A snapshot pinned BEFORE an upsert keeps serving the pre-merge
    version even though the swap deleted the original files (hardlinks
    keep the bytes alive); live read() sees the post-merge state."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    store = StateStore(spark, str(tmp_path / "snap"), ["id"], schema, 4)
    store.upsert_batch(spark.createDataFrame([("1", "old"), ("2", "x")], schema))
    with store.snapshot() as snap:
        store.upsert_batch(
            spark.createDataFrame([("1", "new"), ("3", "y")], schema)
        )
        got_snap = {r["id"]: r["v"] for r in snap.collect()}
        got_live = {r["id"]: r["v"] for r in store.read().collect()}
        assert got_snap == {"1": "old", "2": "x"}
        assert got_live == {"1": "new", "2": "x", "3": "y"}
    with store.snapshot() as fresh:
        assert {r["id"]: r["v"] for r in fresh.collect()} == got_live


def test_statestore_schema_evolution_across_restart(spark, tmp_path):
    """Upstream DDL adds a column: a store reopened with the WIDER catalog
    schema reads pre-evolution bucket files with nulls in the new column,
    merges partial updates onto old rows, and keeps serving point lookups.
    Reopening with a NARROWER schema (column dropped upstream) simply
    projects the remaining columns. Pins the explicit-schema read path of
    StateStore._read_with_bucket (KuduManager.scala:70-114's alter-table
    analog)."""
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.operators.merge import StateStore

    path = str(tmp_path / "emp")
    v1 = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("a", T.StringType())]
    )
    StateStore(spark, path, ["id"], v1, n_buckets=4).upsert_batch(
        spark.createDataFrame([(1, "x"), (2, "y")], v1)
    )
    v2 = T.StructType(
        list(v1.fields) + [T.StructField("b", T.IntegerType())]
    )
    st2 = StateStore(spark, path, ["id"], v2, n_buckets=4)
    st2.upsert_batch(
        spark.createDataFrame([(2, None, 20), (3, "z", 30)], v2)
    )
    got = {r["id"]: (r["a"], r["b"]) for r in st2.read().collect()}
    assert got == {1: ("x", None), 2: ("y", 20), 3: ("z", 30)}
    # point lookup sees the evolved schema too
    assert {tuple(r) for r in st2.lookup([1, 3]).collect()} == {
        (1, "x", None),
        (3, "z", 30),
    }
    # narrowing: dropped column disappears, values survive
    st3 = StateStore(spark, path, ["id"], v1, n_buckets=4)
    assert {tuple(r) for r in st3.read().collect()} == {
        (1, "x"),
        (2, "y"),
        (3, "z"),
    }


def test_scd2_final_version_equals_folded_state(spark):
    """The current (last) SCD2 version per key must be EXACTLY the folded
    final state — delete_state, partial-update inheritance, resurrection
    and all — since history_table_changes and fold_table_changes implement
    the same LWW semantics cumulatively vs terminally."""
    from kafkatosparktokudu_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"  # fixture-driven; sf dir unused by cdc_*
    hist = QUERIES["cdc_emp_history"](spark, sf)
    cur = hist.filter("is_current").select(
        "id", "name", "salary", "dept_id", "active", "hire_ts", "delete_state"
    )
    state = QUERIES["cdc_emp_state"](spark, sf).select(
        "id", "name", "salary", "dept_id", "active", "hire_ts", "delete_state"
    )
    a = sorted(map(tuple, cur.collect()))
    b = sorted(map(tuple, state.collect()))
    assert a == b and len(a) > 0
    # versions are dense and intervals chain: valid_to of version v equals
    # valid_from of version v+1
    rows = sorted(
        hist.select("id", "version", "valid_from", "valid_to").collect(),
        key=lambda r: (r["id"], r["version"]),
    )
    from itertools import groupby

    for _, grp in groupby(rows, key=lambda r: r["id"]):
        g = list(grp)
        assert [r["version"] for r in g] == list(range(1, len(g) + 1))
        for prev, nxt in zip(g, g[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
        assert g[-1]["valid_to"] is None


def _emp_norm(spark):
    from kafkatosparktokudu_spark.cdc import read_fixture
    from kafkatosparktokudu_spark.operators.ogg import (
        normalize,
        parse_ogg,
        split_valid,
    )
    from pyspark.sql import functions as F

    valid, _dead = split_valid(parse_ogg(read_fixture(spark)))
    return normalize(valid).filter(F.col("tab_name") == "emp")


def test_scd2_incremental_matches_batch_and_replays(spark, tmp_path):
    """Two-batch incremental SCD2 == one-shot history operator (versions,
    intervals, payload inheritance across the batch boundary), and
    replaying the last epoch is a no-op (per-key epoch guard)."""
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.catalog import default_catalog
    from kafkatosparktokudu_spark.operators.scd2 import Scd2Store
    from kafkatosparktokudu_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    ref = sorted(map(tuple, QUERIES["cdc_emp_history"](spark, sf).collect()), key=repr)
    norm = _emp_norm(spark)
    cut = norm.agg(F.expr("percentile_approx(seq, 0.5)")).first()[0]
    store = Scd2Store(
        spark, str(tmp_path / "h"), default_catalog()["emp"], n_buckets=8
    )
    store.apply_batch(norm.filter(F.col("seq") < cut), epoch=0)
    store.apply_batch(norm.filter(F.col("seq") >= cut), epoch=1)
    cols = [f.name for f in QUERIES["cdc_emp_history"](spark, sf).schema.fields]
    got = sorted(map(tuple, store.history().select(*cols).collect()), key=repr)
    assert got == ref
    # replay the last epoch: identical history afterwards
    store.apply_batch(norm.filter(F.col("seq") >= cut), epoch=1)
    again = sorted(map(tuple, store.history().select(*cols).collect()), key=repr)
    assert again == ref


def test_scd2_crash_between_writes_replays_to_convergence(spark, tmp_path):
    """Die AFTER the raw-log upsert but BEFORE the derived-history write;
    replaying the batch must converge (raw upsert idempotent, history a
    pure function of raw)."""
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.catalog import default_catalog
    from kafkatosparktokudu_spark.operators.scd2 import Scd2Store
    from kafkatosparktokudu_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    ref = sorted(map(tuple, QUERIES["cdc_emp_history"](spark, sf).collect()), key=repr)
    norm = _emp_norm(spark)
    cut = norm.agg(F.expr("percentile_approx(seq, 0.5)")).first()[0]
    store = Scd2Store(
        spark, str(tmp_path / "h"), default_catalog()["emp"], n_buckets=8
    )
    store.apply_batch(norm.filter(F.col("seq") < cut), epoch=0)

    class Boom(RuntimeError):
        pass

    real = store.hist.upsert_batch
    calls = {"n": 0}

    def dying(batch, replace_rows=False):
        calls["n"] += 1
        raise Boom()

    store.hist.upsert_batch = dying  # crash window: raw written, hist not
    try:
        store.apply_batch(norm.filter(F.col("seq") >= cut), epoch=1)
    except Boom:
        pass
    assert calls["n"] == 1
    store.hist.upsert_batch = real
    store.apply_batch(norm.filter(F.col("seq") >= cut), epoch=1)  # replay
    cols = [f.name for f in QUERIES["cdc_emp_history"](spark, sf).schema.fields]
    got = sorted(map(tuple, store.history().select(*cols).collect()), key=repr)
    assert got == ref


def test_scd2_rebucket_mid_stream_equivalence(spark, tmp_path):
    """Scd2Store.rebucket migrates BOTH underlying stores online: apply
    half the change log at 8 buckets, rebucket to 32 MID-STREAM, apply
    the rest — the history must equal the one-shot derivation exactly
    (including the fixture's planted late-arriving record), and a handle
    reopened with a stale n_buckets argument adopts the stored geometry."""
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.catalog import default_catalog
    from kafkatosparktokudu_spark.cdc import read_fixture
    from kafkatosparktokudu_spark.operators.ogg import (
        history_table_changes,
        normalize,
        parse_ogg,
        split_valid,
    )
    from kafkatosparktokudu_spark.operators.scd2 import Scd2Store

    valid, _ = split_valid(parse_ogg(read_fixture(spark)))
    emp = normalize(valid).filter(F.col("tab_name") == "emp")
    cut = emp.agg(F.expr("percentile_approx(seq, 0.5)")).first()[0]
    target = default_catalog()["emp"]
    store = Scd2Store(spark, str(tmp_path / "emp"), target, n_buckets=8)
    store.apply_batch(emp.filter(F.col("seq") < cut))
    store.rebucket(32)
    assert store.raw.n_buckets == 32 and store.hist.n_buckets == 32
    store.apply_batch(emp.filter(F.col("seq") >= cut))

    stale = Scd2Store(spark, str(tmp_path / "emp"), target, n_buckets=8)
    assert stale.raw.n_buckets == 32 and stale.hist.n_buckets == 32
    got = sorted(map(tuple, stale.history().collect()), key=repr)
    want = sorted(map(tuple, history_table_changes(emp, target).collect()), key=repr)
    assert got == want and len(got) > 0
