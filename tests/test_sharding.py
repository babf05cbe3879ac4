"""plan_shards: balanced contiguous quadkey ranges via a distributed
exclusive prefix sum with data-independent (quadkey-prefix) boundaries."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.operators.sharding import plan_shards


def _tiles(spark, rows, schema="tile_z int, tile_x int, tile_y int, w bigint"):
    return spark.createDataFrame(rows, schema)


def _qk(z, x, y):
    return "".join(
        str(((y >> k) & 1) * 2 + ((x >> k) & 1)) for k in range(z - 1, -1, -1)
    )


def _ref_plan(rows, K):
    """Scalar replica: global quadkey sort, exclusive cumsum, integer
    range assignment."""
    ordered = sorted(rows, key=lambda r: _qk(r[0], r[1], r[2]))
    total = sum(r[3] for r in ordered)
    out, run = {}, 0
    for z, x, y, w in ordered:
        shard = run * K // total if total > 0 else 0
        out[(z, x, y)] = (run, min(max(shard, 0), K - 1))
        run += w
    return out, total


def test_plan_matches_reference_and_partitioning(spark):
    rng = np.random.default_rng(21)
    seen = set()
    rows = []
    while len(rows) < 400:
        x, y = int(rng.integers(0, 64)), int(rng.integers(0, 64))
        if (x, y) in seen:
            continue
        seen.add((x, y))
        rows.append((6, x, y, int(rng.integers(1, 50))))
    df = _tiles(spark, rows)
    got = {
        (r.tile_z, r.tile_x, r.tile_y): (r.prefix_excl, r.shard_id, r.qk, r.weight)
        for r in plan_shards(df, 8, weight_col="w").collect()
    }
    got3 = {
        (r.tile_z, r.tile_x, r.tile_y): (r.prefix_excl, r.shard_id, r.qk, r.weight)
        for r in plan_shards(df.repartition(13), 8, weight_col="w").collect()
    }
    assert got == got3
    ref, total = _ref_plan(rows, 8)
    assert len(got) == 400
    for key, (pe, sh, qk, w) in got.items():
        assert (pe, sh) == ref[key], key
        assert qk == _qk(*key)


def test_contiguity_and_balance(spark):
    rng = np.random.default_rng(2)
    seen = set()
    rows = []
    while len(rows) < 300:
        x, y = int(rng.integers(0, 32)), int(rng.integers(0, 32))
        if (x, y) in seen:
            continue
        seen.add((x, y))
        rows.append((5, x, y, int(rng.integers(1, 100))))
    K = 6
    plan = plan_shards(_tiles(spark, rows), K, weight_col="w").collect()
    total = sum(r.weight for r in plan)
    ordered = sorted(plan, key=lambda r: r.qk)
    # contiguity: shard_id is non-decreasing along quadkey order
    sh = [r.shard_id for r in ordered]
    assert sh == sorted(sh)
    # balance: no shard exceeds ceil(total/K) + max_w - 1
    per = {}
    for r in plan:
        per[r.shard_id] = per.get(r.shard_id, 0) + r.weight
    bound = -(-total // K) + max(r.weight for r in plan) - 1
    assert max(per.values()) <= bound
    # every kept prefix matches the exclusive cumsum along the order
    run = 0
    for r in ordered:
        assert r.prefix_excl == run
        run += r.weight


def test_default_weight_mixed_zoom_and_edges(spark):
    # mixed zooms: parent "0..." subtree stays contiguous; default w=1
    rows = [(1, 0, 0, 1), (2, 1, 1, 1), (2, 3, 3, 1), (1, 1, 0, 1)]
    plan = plan_shards(_tiles(spark, rows), 2).collect()
    qks = {(r.tile_z, r.tile_x, r.tile_y): r.qk for r in plan}
    assert qks[(1, 0, 0)] == "0" and qks[(2, 1, 1)] == "03"
    assert qks[(1, 1, 0)] == "1" and qks[(2, 3, 3)] == "33"
    ordered = sorted(plan, key=lambda r: r.qk)
    assert [r.prefix_excl for r in ordered] == [0, 1, 2, 3]
    # K = 1: everything on shard 0
    assert {r.shard_id for r in plan_shards(_tiles(spark, rows), 1).collect()} == {0}
    # empty input
    assert plan_shards(_tiles(spark, []), 4).count() == 0


def test_validation(spark):
    rows = [(3, 1, 1, 5), (3, 1, 1, 7)]
    with pytest.raises(Exception, match="duplicate tile"):
        plan_shards(_tiles(spark, rows), 4, weight_col="w").collect()
    with pytest.raises(ValueError, match="negative weight"):
        plan_shards(
            _tiles(spark, [(3, 1, 1, -2)]), 4, weight_col="w"
        ).collect()
    with pytest.raises(ValueError, match="n_shards"):
        plan_shards(_tiles(spark, [(3, 1, 1, 1)]), 0)
    with pytest.raises(ValueError, match="prefix_depth"):
        plan_shards(_tiles(spark, [(3, 1, 1, 1)]), 2, prefix_depth=0)


def test_null_weight_raises(spark):
    rows = [(3, 1, 1, 5), (3, 2, 2, None)]
    with pytest.raises(ValueError, match="NULL weight"):
        plan_shards(_tiles(spark, rows), 4, weight_col="w").collect()
