"""Z-order layout operator (operators/layout.py) against pure-Python oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkatosparktokudu_spark.operators.layout import (
    normalize16,
    zorder_key,
    zorder_layout_stats,
)


def _py_spread16(x: int) -> int:
    out = 0
    for i in range(16):
        out |= ((x >> i) & 1) << (2 * i)
    return out


def _py_zkey(x: int, y: int) -> int:
    return _py_spread16(x) | (_py_spread16(y) << 1)


def test_zorder_key_matches_bitwise_oracle(spark):
    # corners, bit patterns, and a spread of interior points
    pts = [
        (0, 0), (65535, 65535), (65535, 0), (0, 65535),
        (0xAAAA, 0x5555), (0x00FF, 0xFF00), (1, 2), (12345, 54321),
        (32768, 1), (255, 256),
    ]
    df = spark.createDataFrame(pts, "x bigint, y bigint").withColumn(
        "z", zorder_key(F.col("x"), F.col("y"))
    )
    got = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    for x, y in pts:
        assert got[(x, y)] == _py_zkey(x, y), (x, y)


def test_zorder_locality():
    # the property the layout exists for: keys of points close in BOTH
    # dims are closer than keys of points far in one dim
    near = _py_zkey(100, 100) ^ _py_zkey(101, 101)
    far = _py_zkey(100, 100) ^ _py_zkey(100, 40000)
    assert near < far


def test_normalize16_bounds_and_degenerate(spark):
    df = spark.createDataFrame(
        [(0,), (50,), (100,)], "v bigint"
    ).select(
        "v",
        normalize16(F.col("v"), F.lit(0), F.lit(100)).alias("n"),
        normalize16(F.col("v"), F.lit(7), F.lit(7)).alias("deg"),
    )
    rows = {r["v"]: (r["n"], r["deg"]) for r in df.collect()}
    assert rows[0] == (0, 0)
    assert rows[100] == (65535, 0)
    assert rows[50] == (50 * 65535 // 100, 0)  # floor semantics


def test_layout_stats_files_partition_rows(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 1000) for i in range(1000)], "a bigint, b bigint"
    )
    stats = zorder_layout_stats(df, "a", "b", n_files=16)
    rows = stats.collect()
    assert sum(r["n_rows"] for r in rows) == 1000
    assert {r["file_id"] for r in rows} <= set(range(16))
    for r in rows:  # footer stats are genuine min/max
        assert r["min_a"] <= r["max_a"] and r["min_b"] <= r["max_b"]


def test_layout_stats_no_global_sort(spark):
    """Scale contract: the whole layout-stats plan has no single-partition
    Exchange and no Sort — key + file assignment are scalar expressions."""
    df = spark.createDataFrame(
        [(i, i % 97) for i in range(500)], "a bigint, b bigint"
    )
    plan = (
        zorder_layout_stats(df, "a", "b", n_files=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only SinglePartition exchange allowed is the global min/max agg
    assert plan.count("Exchange SinglePartition") <= 1
    assert "Sort " not in plan


def test_zorder_key_paths_agree(spark):
    """The magic-number spread (operators/layout.py) and the generic
    per-bit loop (sources/sink.py) must be bit-identical for two 16-bit
    dims — sink.zorder_key delegates to the fast path on that shape."""
    import random

    from kafkatosparktokudu_spark.sources import sink

    rnd = random.Random(7)
    pts = [(rnd.randrange(0, 65536), rnd.randrange(0, 65536)) for _ in range(200)]
    pts += [(0, 0), (65535, 65535), (-1, 3), (70000, 5)]  # mask edges
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    # the generic loop path, forced (3 dims then ignore the third would
    # change the layout — instead call the loop body via bits != 16)
    fast = df.select("x", "y", sink.zorder_key("x", "y", bits=16).alias("k"))
    slow_rows = df.select(
        "x", "y", sink.zorder_key("x", "y", "x", bits=16).alias("k3")
    )
    got_fast = {(r["x"], r["y"]): r["k"] for r in fast.collect()}

    def py_loop(x, y, bits=16, n=2):
        key = 0
        for dim, v in enumerate((x, y)):
            for b in range(bits):
                key |= ((v >> b) & 1) << (b * n + dim)
        return key

    for x, y in pts:
        assert got_fast[(x, y)] == py_loop(x, y), (x, y)
    # and the 3-dim generic path still works (clamped bits)
    assert slow_rows.count() == len(pts)


# --- Hilbert curve ---


def _py_hilbert(x: int, y: int, bits: int = 16) -> int:
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_key_matches_xy2d_reference(spark):
    import random

    from kafkatosparktokudu_spark.operators.layout import with_hilbert_key

    rnd = random.Random(3)
    pts = [(rnd.randrange(65536), rnd.randrange(65536)) for _ in range(150)]
    pts += [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (32768, 32767)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["hkey"]
        for r in with_hilbert_key(df, "x", "y").collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_hilbert(x, y), (x, y)


def test_hilbert_adjacency_property():
    """THE Hilbert guarantee (what Z-order lacks): consecutive key values
    are Manhattan-adjacent cells — no long jumps anywhere on the curve."""
    n = 32  # full 5-bit curve
    cells = {}
    for x in range(n):
        for y in range(n):
            cells[_py_hilbert(x, y, bits=5)] = (x, y)
    assert sorted(cells) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = cells[d], cells[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_tighter_boxes_than_zorder():
    """On a uniform grid cut into equal key ranges, Hilbert's per-file
    bounding boxes have at most Z-order's total perimeter — the
    measurable reason to prefer it for multi-dim pruning."""
    n, files = 64, 16
    cells_h, cells_z = {}, {}
    for x in range(n):
        for y in range(n):
            cells_h.setdefault(_py_hilbert(x, y, bits=6) * files // (n * n), []).append((x, y))
            z = _py_zkey(x, y) * files  # 6-bit coords still interleave fine
            cells_z.setdefault(z // (n * n), []).append((x, y))

    def perimeter(groups):
        tot = 0
        for pts in groups.values():
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            tot += (max(xs) - min(xs)) + (max(ys) - min(ys))
        return tot

    assert perimeter(cells_h) <= perimeter(cells_z)


def test_hilbert_layout_stats_no_shuffle_in_key_chain(spark):
    from kafkatosparktokudu_spark.operators.layout import hilbert_layout_stats

    df = spark.createDataFrame(
        [(i, (i * 31) % 511) for i in range(400)], "a bigint, b bigint"
    )
    stats = hilbert_layout_stats(df, "a", "b", n_files=8)
    rows = stats.collect()
    assert sum(r["n_rows"] for r in rows) == 400
    # AQE's finalized toString repeats the tree ("Final Plan" then
    # "Initial Plan") — count only the final section
    plan = (
        stats._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    # data path: exactly ONE hash exchange (the file_id groupBy) and no
    # sort anywhere; the SinglePartition exchange belongs to the 1-row
    # bounds agg only
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") <= 1
    assert "Sort " not in plan


def test_epoch_shuffle_seed_epoch_are_delimited(spark):
    """(seed='a', epoch=11) and (seed='a1', epoch=1) must produce DIFFERENT
    permutations — the undelimited key concat collided on 'a11:' (r8
    advice)."""
    from kafkatosparktokudu_spark.operators.layout import epoch_shuffle

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = {
        r["doc_id"]: r["position"]
        for r in epoch_shuffle(df, seed="a", epoch=11).collect()
    }
    b = {
        r["doc_id"]: r["position"]
        for r in epoch_shuffle(df, seed="a1", epoch=1).collect()
    }
    assert a != b
