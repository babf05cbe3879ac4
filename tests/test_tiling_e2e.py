"""End-to-end slice (SURVEY.md §7.3): synthetic image table -> tile
assignment -> groupBy(z,x,y).applyInPandas MVT encode -> decode-verify
against an independent single-process NumPy reference path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.functions.tiles import tile_pixel_np, tile_xy_np
from vectortiles_spark.mvt import codec
from vectortiles_spark.operators import tiling
from vectortiles_spark.sources.synth import images_df, images_pdf

Z = 8
N = 1200


@pytest.fixture(scope="module")
def tiles_and_truth(spark):
    imgs = images_df(spark, N, seed=42)
    feats = tiling.point_features(
        imgs, z=Z, layer="images",
        feature_id=F.xxhash64("image_id"),
        meta={"caption": F.col("caption"), "phash": F.col("phash")},
    )
    rows = tiling.encode_tiles(feats).collect()
    truth = images_pdf(N, seed=42)  # independent local generation
    return rows, truth


def test_feature_count_preserved(tiles_and_truth):
    rows, truth = tiles_and_truth
    assert sum(r.n_features for r in rows) == len(truth)


def test_every_tile_decodes_to_reference_features(tiles_and_truth):
    """The emitted MVT of EVERY tile decodes (with our reference-validated
    codec) to exactly the (px, py, caption, phash) set the independent
    NumPy path computes."""
    rows, truth = tiles_and_truth
    tx, ty = tile_xy_np(truth.lon.values, truth.lat.values, Z)
    px, py = tile_pixel_np(truth.lon.values, truth.lat.values, Z)
    by_tile = {}
    for i in range(len(truth)):
        by_tile.setdefault((tx[i], ty[i]), []).append(
            (px[i], py[i], truth.caption.iloc[i], int(truth.phash.iloc[i]))
        )
    assert len(rows) == len(by_tile)
    for r in rows:
        layers = codec.decode_tile(bytes(r.mvt))
        feats = layers["images"].features
        got = sorted(
            (int(f.geom[0][0]), int(f.geom[0][1]), f.metadata["caption"][1], f.metadata["phash"][1])
            for f in feats
        )
        want = sorted(by_tile[(r.tile_x, r.tile_y)])
        assert got == want


def test_tiles_have_version2_extent4096(tiles_and_truth):
    rows, _ = tiles_and_truth
    layer = codec.decode_tile(bytes(rows[0].mvt))["images"]
    assert layer.version == 2
    assert layer.extent == 4096


def test_deterministic_bytes_across_runs(spark, tiles_and_truth):
    rows, _ = tiles_and_truth
    imgs = images_df(spark, N, seed=42)
    feats = tiling.point_features(
        imgs, z=Z, layer="images",
        feature_id=F.xxhash64("image_id"),
        meta={"caption": F.col("caption"), "phash": F.col("phash")},
    )
    rows2 = tiling.encode_tiles(feats).collect()
    assert {(r.tile_x, r.tile_y): bytes(r.mvt) for r in rows} == {
        (r.tile_x, r.tile_y): bytes(r.mvt) for r in rows2
    }


def test_cap_features_per_tile(spark):
    imgs = images_df(spark, N, seed=42)
    feats = tiling.point_features(imgs, z=2, layer="images", feature_id=F.xxhash64("image_id"))
    capped = tiling.encode_tiles(feats, max_per_tile=50).collect()
    assert max(r.n_features for r in capped) <= 50
    # determinism of the cap: same bytes on re-run
    capped2 = tiling.encode_tiles(
        tiling.point_features(imgs, z=2, layer="images", feature_id=F.xxhash64("image_id")),
        max_per_tile=50,
    ).collect()
    assert {(r.tile_x, r.tile_y): bytes(r.mvt) for r in capped} == {
        (r.tile_x, r.tile_y): bytes(r.mvt) for r in capped2
    }


def test_tile_stats_matches_plain_count(spark):
    imgs = images_df(spark, N, seed=42)
    feats = tiling.point_features(imgs, z=Z, layer="images").cache()
    salted = {
        (r.tile_x, r.tile_y): r.n_features
        for r in tiling.tile_stats(feats, salt_buckets=8).collect()
    }
    plain = {
        (r.tile_x, r.tile_y): r.n
        for r in feats.groupBy("tile_x", "tile_y").agg(F.count("*").alias("n")).collect()
    }
    assert salted == plain


def test_multi_layer_tile(spark):
    """Two layers in one tile; layer order in bytes is name-sorted."""
    imgs = images_df(spark, 200, seed=1)
    a = tiling.point_features(imgs, z=0, layer="beta", feature_id=F.xxhash64("image_id"))
    b = tiling.point_features(imgs, z=0, layer="alpha", feature_id=F.xxhash64("image_id"))
    rows = tiling.encode_tiles(a.unionAll(b)).collect()
    assert len(rows) == 1
    layers = codec.decode_tile(bytes(rows[0].mvt))
    assert list(layers) == ["alpha", "beta"]
    assert rows[0].n_layers == 2


def test_geom_features_lines_and_holed_polygons(spark):
    """Arbitrary geometries through the full pipeline: multi-linestring with
    cursor carry + holed polygon, MVT-encoded and decoded back exactly."""
    import pandas as pd

    line_parts = [[[[10, 10], [20, 20], [20, 30]]], [[[40, 40], [50, 40]]]]
    poly = [[
        [[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]],          # exterior (CW on screen)
        [[20, 20], [20, 40], [40, 40], [40, 20], [20, 20]],         # hole (reversed)
    ]]
    pdf = pd.DataFrame({
        "tile_z": [3, 3], "tile_x": [1, 1], "tile_y": [2, 2],
        "layer": ["mixed", "mixed"], "geom_type": [2, 3],
        "feature_id": [1, 2], "geom": [line_parts, poly],
        "kind": ["line", "poly"],
    })
    df = spark.createDataFrame(pdf)
    feats = tiling.geom_features(df, meta={"kind": F.col("kind")})
    tiles = tiling.encode_tiles(feats).collect()
    assert len(tiles) == 1
    layer = codec.decode_tile(bytes(tiles[0].mvt))["mixed"]
    by_type = {f.geom_type: f for f in layer.features}
    # linestring: both parts, exact points (cursor carried across parts)
    parts = by_type[2].geom
    assert [p.tolist() for p in parts] == [
        [[10, 10], [20, 20], [20, 30]], [[40, 40], [50, 40]]
    ]
    # polygon: exterior positive, hole negative, both closed
    polys = by_type[3].geom
    from vectortiles_spark.mvt.geometry import surveyor
    assert len(polys[0]) == 2
    assert surveyor(polys[0][0]) > 0 > surveyor(polys[0][1])
    assert by_type[3].metadata["kind"] == (1, "poly")


def test_single_layer_mode_identical_bytes(spark):
    """encode_tiles(single_layer=...) drops the constant layer column from
    the feed and must produce byte-identical tiles."""
    imgs = images_df(spark, 400, seed=13)
    feats = tiling.point_features(
        imgs, z=7, layer="images", feature_id=F.xxhash64("image_id"),
        meta={"caption": F.col("caption"), "phash": F.col("phash")},
    )
    normal = {(r.tile_x, r.tile_y): bytes(r.mvt) for r in tiling.encode_tiles(feats).collect()}
    fast = {
        (r.tile_x, r.tile_y): bytes(r.mvt)
        for r in tiling.encode_tiles(feats, single_layer="images").collect()
    }
    assert normal == fast


def test_bytes_invariant_to_partitioning(spark):
    """Tile bytes must not depend on Arrow batch boundaries: the same
    features encoded under different partition counts (different batch
    compositions, different batch-level dictionaries) yield byte-identical
    tiles. Pins the dictionary fast path's proven-coverage guard — an
    unconditional batch-dictionary emit would differ between layouts."""
    imgs = images_df(spark, N, seed=42)

    def tiles(parts):
        feats = tiling.point_features(
            imgs, z=Z, layer="images",
            feature_id=F.xxhash64("image_id"),
            meta={"caption": F.col("caption"), "phash": F.col("phash")},
        )
        return {
            (r.tile_x, r.tile_y): bytes(r.mvt)
            for r in tiling.encode_tiles(feats, partitions=parts).collect()
        }

    assert tiles(2) == tiles(7)


def test_tile_pyramid_rollup(spark):
    """Every ancestor level of the pyramid conserves the leaf totals, and
    each parent equals the sum of its (<=4) children."""
    import pandas as pd

    from vectortiles_spark.operators.tiling import tile_pyramid

    rng = np.random.Generator(np.random.PCG64(3))
    n = 400
    leaf_pdf = pd.DataFrame({
        "tile_z": 6,
        "tile_x": rng.integers(0, 64, n),
        "tile_y": rng.integers(0, 64, n),
        "n_features": rng.integers(1, 50, n),
    }).groupby(["tile_z", "tile_x", "tile_y"], as_index=False).sum()
    leaf = spark.createDataFrame(leaf_pdf)
    out = tile_pyramid(leaf, leaf_z=6, min_z=0).toPandas()
    total = leaf_pdf.n_features.sum()
    for z in range(0, 7):
        lvl = out[out.tile_z == z]
        assert lvl.n_features.sum() == total, z
        assert not lvl.duplicated(["tile_x", "tile_y"]).any()
    # parent == sum of children, spot-checked exhaustively at z=5
    kids = out[out.tile_z == 6].copy()
    kids["px"], kids["py"] = kids.tile_x // 2, kids.tile_y // 2
    want = kids.groupby(["px", "py"]).n_features.sum()
    lvl5 = out[out.tile_z == 5].set_index(["tile_x", "tile_y"]).n_features
    assert lvl5.sort_index().equals(want.sort_index().rename_axis(["tile_x", "tile_y"]))
    with pytest.raises(ValueError):
        tile_pyramid(leaf, leaf_z=6, min_z=7)


def test_salted_cap_identical_to_single_phase(spark):
    """The salted two-phase cap must keep exactly the rows the one-window
    cap keeps, with the hot tile spread over (tile, salt) tasks in phase 1
    (no task materializes the uncapped tile)."""
    import re

    n_hot = 200_000
    df = spark.range(n_hot).select(
        F.lit(5).alias("tile_z"),
        # one metro tile with 90% of rows + a long tail of cold tiles
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(
            (F.col("id") % 31).cast("int")
        ).alias("tile_x"),
        F.lit(3).alias("tile_y"),
        F.lit("layer0").alias("layer"),
        F.col("id").alias("feature_id"),
    )
    salted = tiling.cap_features_per_tile(df, 1000, salt_buckets=16)
    plain = tiling.cap_features_per_tile(df, 1000, salt_buckets=0)
    a = {(r.tile_x, r.feature_id) for r in salted.collect()}
    b = {(r.tile_x, r.feature_id) for r in plain.collect()}
    assert a == b and len(a) > 1000
    # plan audit: the first window's exchange must partition by the salt
    # (that is what bounds per-task input on the hot tile)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("__salt" in e for e in exchanges), exchanges


def test_build_pyramid_all_zooms_roundtrip(spark):
    """The multi-zoom overview builder: every requested zoom present, the
    deepest zoom carries the most tiles, and each blob roundtrip-decodes;
    per-zoom tolerance overrides apply."""
    from vectortiles_spark.mvt import codec as mvt_codec

    k = F.col("id") + 1
    lon = lambda px: px.cast("double") * 360.0 / 65536.0 - 180.0
    lat = lambda py: F.lit(85.0) - py.cast("double") * 170.0 / 65536.0
    gx = 4096 * (k % 16) + 1024 + 8 * ((k * 37) % 64)
    gy = 4096 * ((k / 16).cast("long") % 16) + 1024 + 8 * ((k * 53) % 64)
    pt = lambda px, py: F.array(lon(px), lat(py))
    line = F.array(pt(gx, gy), pt(gx + 32, gy), pt(gx + 32, gy + 32))
    df = spark.range(300).select(
        F.lit("l").alias("layer"), F.lit(2).cast("int").alias("geom_type"),
        k.alias("feature_id"), F.array(F.array(line)).alias("geom"),
    )
    tiles = tiling.build_pyramid(
        df, zooms=[2, 3, 4], tolerance=1.0,
        tolerance_by_zoom={2: 64.0}, projection="equirect",
    ).collect()
    by_z = {}
    for r in tiles:
        by_z.setdefault(r.tile_z, []).append(r)
    assert set(by_z) == {2, 3, 4}
    assert len(by_z[4]) >= len(by_z[3]) >= len(by_z[2])
    total = {z: 0 for z in by_z}
    corner_kept = {z: 0 for z in by_z}
    for r in tiles:
        t = mvt_codec.decode_tile(bytes(r.mvt))
        for layer in t.values():
            for f in layer.features:
                total[r.tile_z] += 1
                if max(len(p) for p in f.geom) == 3:
                    corner_kept[r.tile_z] += 1
    assert total == {2: 300, 3: 300, 4: 300}
    # d=32 at z=4 -> deviation 22.6 px: kept at z=3/4 under tol=1, and the
    # z=2 override (tol=64) provably drops every corner
    assert corner_kept[4] == 300 and corner_kept[3] == 300
    assert corner_kept[2] == 0


def test_encode_rejects_null_core_columns(spark):
    """NULLs in tile keys/layer would corrupt bytes silently (NaN->int64
    garbage, factorize -1 indexing the last layer) — must raise naming
    the column."""
    import pytest as _pytest

    feats = spark.createDataFrame(
        [(5, 1, 1, None, 1, 1, 9 << 26 | (2 << 13) | 2)],
        "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
        "feature_id bigint, geom_pt bigint",
    )
    with _pytest.raises(Exception, match="layer.*NULL|NULL.*layer"):
        tiling.encode_tiles(feats).collect()


def test_degenerate_exterior_drops_whole_part(spark):
    """A polygon part whose exterior collapses must NOT survive as its
    holes (a promoted CCW hole would attach to the previous polygon on
    decode)."""
    sq = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    hole = [[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]]
    bad_ext = [[20, 20], [21, 20], [20, 20]]  # < 4 points after filter
    rows = spark.createDataFrame(
        [(4, 1, 1, "p", 3, 7, [[sq], [bad_ext, hole]])],
        "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
        "feature_id bigint, geom array<array<array<array<int>>>>",
    )
    tiles = tiling.encode_tiles(tiling.geom_features(rows)).collect()
    assert len(tiles) == 1
    t = codec.decode_tile(bytes(tiles[0].mvt))
    (feat,) = t["p"].features
    # one polygon (the square), NO holes — the orphaned hole is gone
    assert len(feat.geom) == 1 and len(feat.geom[0]) == 1


def test_decode_tiles_extent_mismatch_raises(spark):
    """Tiles with a non-default extent must not silently decode into
    mis-scaled coordinates: decode_tiles needs the matching extent."""
    import pytest as _pytest

    pts = spark.createDataFrame([(10.0, 10.0, 1)], "lon double, lat double, k long")
    feats = tiling.point_features(pts, z=3, layer="l", feature_id=F.col("k"), extent=512)
    tiles = tiling.encode_tiles(feats, extent=512)
    with _pytest.raises(Exception, match="extent"):
        tiling.decode_tiles(tiles).collect()
    ok = tiling.decode_tiles(tiles, extent=512).collect()
    assert len(ok) == 1


def test_salted_cap_pathological_skew_10m_one_tile(spark):
    """VERDICT r4 #7: the two-phase cap at the scale it exists for — 10M
    rows ALL on one (tile, layer). Proves (a) exact first-N output, (b)
    phase-1 survivors bounded at salt_buckets * max_per_tile, (c) the
    phase-1 exchange key splits the hot tile near-uniformly (per-task
    input ~ N / salt_buckets, not N), and (d) both walls recorded, with a
    loose disaster guard. The structural bounds (b)/(c) are the scale
    gate: they hold at ANY N by construction. Wall ordering is host- and
    core-count-dependent (at local[32] the salted path measured 2.5x
    faster — 1.14s vs 2.83s; at this fixture's local[4] the two extra
    exchanges roughly offset the 4-way sort win), so the timing assert
    only guards against the straggler pathology the cap exists to
    prevent, not noise-level ordering."""
    import time

    N, cap, sb = 10_000_000, 1000, 16
    feats = (
        spark.range(N)
        .select(
            F.lit(4).alias("tile_z"), F.lit(7).alias("tile_x"),
            F.lit(5).alias("tile_y"), F.lit("hot").alias("layer"),
            F.col("id").alias("feature_id"),
        )
        .repartition(32)
        .cache()
    )
    feats.count()  # materialize outside the clocks
    try:
        # (c) structural bound: the phase-1 partition key (tile, layer,
        # salt) caps any single group — and therefore any task's input for
        # this tile — at ~N/sb rows (hash-uniform; 10% slack)
        salt = F.pmod(F.xxhash64(F.col("feature_id")), F.lit(sb))
        max_group = (
            feats.withColumn("__s", salt).groupBy("__s").count()
            .agg(F.max("count")).collect()[0][0]
        )
        assert max_group <= int(N / sb * 1.10), max_group

        # (b) phase-1 survivors: full per-salt quota, nothing more
        from pyspark.sql import Window

        w1_survivors = (
            feats.withColumn("__salt", salt)
            .withColumn("__rn", F.row_number().over(
                Window
                .partitionBy("tile_z", "tile_x", "tile_y", "layer", "__salt")
                .orderBy("feature_id")))
            .filter(F.col("__rn") <= cap)
            .count()
        )
        assert w1_survivors == sb * cap, w1_survivors

        def wall(salt_buckets):
            best = float("inf")
            for _ in range(2):  # best-of-2 damps host window noise
                t0 = time.perf_counter()
                n = tiling.cap_features_per_tile(
                    feats, cap, salt_buckets=salt_buckets
                ).count()
                best = min(best, time.perf_counter() - t0)
                assert n == cap
            return best

        w_salted = wall(sb)
        w_single = wall(1)
        # (a) exact output (first N feature_ids)
        got = sorted(
            r.feature_id
            for r in tiling.cap_features_per_tile(feats, cap, salt_buckets=sb).collect()
        )
        assert got == list(range(cap))
        # (d) disaster guard only (see docstring): a broken two-phase
        # shape would put all 10M rows through one task TWICE
        assert w_salted < w_single * 3.0, (w_salted, w_single)
        print(f"salted={w_salted:.2f}s single-window={w_single:.2f}s "
              f"max_salt_group={max_group} survivors={w1_survivors}")
    finally:
        feats.unpersist()


# ------------------------------------------------------------ refresh_tiles


def test_refresh_tiles_equals_full_rebuild(spark):
    """Upsert + delete + move delta: refreshing only the dirty tiles is
    byte-identical to a full rebuild of the current state."""
    old = images_df(spark, 800, seed=5)
    # current state: drop ids ending in 0 (deletes), shift ids ending in 1
    # east by 40 degrees (moves — dirty BOTH old and new tile), add 50 new
    now = (
        images_df(spark, 850, seed=5)
        .filter(F.pmod(F.xxhash64("image_id"), F.lit(10)) != 0)
        .withColumn(
            "lon",
            F.when(
                F.pmod(F.xxhash64("image_id"), F.lit(10)) == 1,
                F.pmod(F.col("lon") + 40.0 + 180.0, F.lit(360.0)) - 180.0,
            ).otherwise(F.col("lon")),
        )
    )

    def feats(df):
        return tiling.point_features(
            df, z=Z, layer="images",
            feature_id=F.xxhash64("image_id"),
            meta={"caption": F.col("caption")},
        )

    prev = tiling.encode_tiles(feats(old)).cache()
    full = tiling.encode_tiles(feats(now))
    # dirty = every tile either state assigns a changed row to: compute the
    # symmetric difference of (feature_id -> tile key) assignments
    a = feats(old).select("tile_z", "tile_x", "tile_y", "feature_id")
    b = feats(now).select("tile_z", "tile_x", "tile_y", "feature_id")
    changed = a.exceptAll(b).unionByName(b.exceptAll(a))
    dirty = tiling.dirty_tile_keys(changed)
    out = tiling.refresh_tiles(feats(now), prev, dirty)

    want = {(r.tile_x, r.tile_y): (bytes(r.mvt), r.n_features) for r in full.collect()}
    got = {(r.tile_x, r.tile_y): (bytes(r.mvt), r.n_features) for r in out.collect()}
    assert got == want
    prev.unpersist()


def test_refresh_tiles_empty_delta_keeps_everything(spark):
    imgs = images_df(spark, 300, seed=9)
    feats = tiling.point_features(
        imgs, z=Z, layer="images", feature_id=F.xxhash64("image_id")
    )
    prev = tiling.encode_tiles(feats).cache()
    empty = prev.select("tile_z", "tile_x", "tile_y").filter(F.lit(False))
    out = tiling.refresh_tiles(feats, prev, empty)
    want = {(r.tile_x, r.tile_y): bytes(r.mvt) for r in prev.collect()}
    got = {(r.tile_x, r.tile_y): bytes(r.mvt) for r in out.collect()}
    assert got == want
    prev.unpersist()


def test_refresh_tiles_plan_broadcasts_dirty_both_sides(spark):
    """The scale contract: dirty keys broadcast, prev pruned via
    BroadcastHashJoin LeftAnti, features pruned via LeftSemi — the big
    relations never shuffle for the pruning joins."""
    imgs = images_df(spark, 200, seed=3)
    feats = tiling.point_features(
        imgs, z=Z, layer="images", feature_id=F.xxhash64("image_id")
    )
    prev = tiling.encode_tiles(feats)
    dirty = feats.limit(20).select("tile_z", "tile_x", "tile_y")
    plan = tiling.refresh_tiles(feats, prev, dirty)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight" in plan or ("BroadcastHashJoin" in plan and "LeftAnti" in plan)
    assert "LeftSemi" in plan
    assert plan.count("BroadcastExchange") >= 2


# ---------------------------------------------------------- merge_tile_sets


def test_merge_tile_sets_disjoint_layers_byte_exact(spark):
    """Two thematic tile sets with disjoint layer names: the wire-level
    splice equals one combined encode, byte for byte."""
    imgs = images_df(spark, 500, seed=21)
    a = imgs.filter(F.pmod(F.xxhash64("image_id"), F.lit(2)) == 0)
    b = imgs.filter(F.pmod(F.xxhash64("image_id"), F.lit(2)) == 1)

    def feats(df, layer):
        return tiling.point_features(
            df, z=Z, layer=layer, feature_id=F.xxhash64("image_id"),
            meta={"caption": F.col("caption")},
        )

    ta = tiling.encode_tiles(feats(a, "evens"))
    tb = tiling.encode_tiles(feats(b, "odds"))
    merged = tiling.merge_tile_sets(ta, tb)
    full = tiling.encode_tiles(feats(a, "evens").unionByName(feats(b, "odds")))
    want = {(r.tile_x, r.tile_y): (bytes(r.mvt), r.n_features, r.n_layers)
            for r in full.collect()}
    got = {(r.tile_x, r.tile_y): (bytes(r.mvt), r.n_features, r.n_layers)
           for r in merged.collect()}
    assert got == want


def test_merge_tile_sets_colliding_layer_byte_exact(spark):
    """Same layer name in both inputs with distinct feature ids: the
    decode+union+re-encode slow path still reproduces the combined
    encode exactly."""
    imgs = images_df(spark, 400, seed=22)
    a = imgs.filter(F.pmod(F.xxhash64("image_id"), F.lit(2)) == 0)
    b = imgs.filter(F.pmod(F.xxhash64("image_id"), F.lit(2)) == 1)

    def feats(df):
        return tiling.point_features(
            df, z=Z, layer="images", feature_id=F.xxhash64("image_id")
        )

    merged = tiling.merge_tile_sets(
        tiling.encode_tiles(feats(a)), tiling.encode_tiles(feats(b))
    )
    full = tiling.encode_tiles(feats(imgs))
    want = {(r.tile_x, r.tile_y): bytes(r.mvt) for r in full.collect()}
    got = {(r.tile_x, r.tile_y): bytes(r.mvt) for r in merged.collect()}
    assert got == want


def test_merge_tile_sets_partitioning_independent(spark):
    imgs = images_df(spark, 300, seed=23)
    f1 = tiling.point_features(
        imgs, z=Z, layer="l1", feature_id=F.xxhash64("image_id"))
    f2 = tiling.point_features(
        imgs, z=Z, layer="l2", feature_id=F.xxhash64("image_id"))
    t1, t2 = tiling.encode_tiles(f1), tiling.encode_tiles(f2)
    a = {(r.tile_x, r.tile_y): bytes(r.mvt)
         for r in tiling.merge_tile_sets(t1, t2, partitions=1).collect()}
    b = {(r.tile_x, r.tile_y): bytes(r.mvt)
         for r in tiling.merge_tile_sets(t1.repartition(7), t2.repartition(3),
                                         partitions=13).collect()}
    assert a == b


# ------------------------------------------------------------ diff_tile_sets


def _pt_tiles(spark, df):
    return tiling.encode_tiles(
        tiling.point_features(
            df, z=Z, layer="images", feature_id=F.xxhash64("image_id"),
            meta={"caption": F.col("caption")},
        )
    )


def test_diff_tile_sets_statuses(spark):
    """added/removed/changed/unchanged all classified correctly against a
    brute-force per-tile membership comparison."""
    imgs = images_df(spark, 600, seed=31).cache()
    old_rows = imgs.filter(F.pmod(F.xxhash64("image_id"), F.lit(5)) != 0)
    new_rows = imgs.filter(F.pmod(F.xxhash64("image_id"), F.lit(3)) != 0)
    diff = tiling.diff_tile_sets(
        _pt_tiles(spark, old_rows), _pt_tiles(spark, new_rows),
        include_unchanged=True,
    ).collect()

    def members(df):
        out = {}
        feats = tiling.point_features(
            df, z=Z, layer="images", feature_id=F.xxhash64("image_id"))
        for r in feats.select("tile_x", "tile_y", "feature_id").collect():
            out.setdefault((r.tile_x, r.tile_y), set()).add(r.feature_id)
        return out

    mo, mn = members(old_rows), members(new_rows)
    assert {r.status for r in diff} == {"added", "removed", "changed", "unchanged"}
    for r in diff:
        k = (r.tile_x, r.tile_y)
        o, nn = mo.get(k), mn.get(k)
        want = ("added" if o is None else "removed" if nn is None
                else "unchanged" if o == nn else "changed")
        assert r.status == want, (k, r.status, want)
        assert (r.n_features_old or 0) == len(o or ()) and (r.n_features_new or 0) == len(nn or ())
    assert {(r.tile_x, r.tile_y) for r in diff} == set(mo) | set(mn)


def test_diff_tile_sets_identical_all_unchanged(spark):
    imgs = images_df(spark, 300, seed=32)
    t = _pt_tiles(spark, imgs)
    d = tiling.diff_tile_sets(t, _pt_tiles(spark, imgs))
    assert d.count() == 0  # default filters unchanged; encode is deterministic


def test_diff_tile_sets_null_blob_reads_changed(spark):
    """A NULL mvt on one side of a shared key is 'changed', never 'added':
    presence comes from an explicit marker, not from xxhash64(mvt) (which
    is NULL on NULL input and used to misclassify the row)."""
    schema = "tile_z int, tile_x int, tile_y int, mvt binary, n_features bigint, n_layers int"
    a = spark.createDataFrame([(0, 1, 1, bytearray(b"\x1a\x00"), 1, 1)], schema)
    b = spark.createDataFrame([(0, 1, 1, None, 0, 0)], schema)
    rows = tiling.diff_tile_sets(a, b, include_unchanged=True).collect()
    assert [(r.status, r.mvt_bytes_new) for r in rows] == [("changed", None)]
    both_null = tiling.diff_tile_sets(b, b, include_unchanged=True).collect()
    assert [r.status for r in both_null] == ["unchanged"]


def test_diff_tile_sets_plan_slims_before_join(spark):
    """The full-outer exchange must move (key, counts, length, hash) — the
    mvt binary itself must be projected away BEFORE the join on both
    sides."""
    imgs = images_df(spark, 200, seed=33)
    a = _pt_tiles(spark, imgs.limit(150))
    b = _pt_tiles(spark, imgs.limit(180))
    plan = tiling.diff_tile_sets(a, b)._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(tile_z[^\n]*", plan):
        assert "mvt#" not in m.group(0)
    # the join itself never sees the blob column
    join_lines = [l for l in plan.splitlines() if "SortMergeJoin" in l or "ShuffledHashJoin" in l]
    assert join_lines and all("mvt#" not in l for l in join_lines)


def test_cap_tile_bytes_matches_pandas_prefix(spark):
    """Salted and unsalted byte caps both equal the pandas running-sum
    prefix rule on random data."""
    import numpy as np
    import pandas as pd

    from vectortiles_spark.operators.tiling import cap_tile_bytes

    rng = np.random.RandomState(17)
    n = 400
    pdf = pd.DataFrame({
        "tile_z": 3,
        "tile_x": rng.randint(0, 3, n),
        "tile_y": rng.randint(0, 2, n),
        "layer": "l",
        "feature_id": np.arange(n),
        "geom_cmds": [
            [9, int(a), int(b)]
            for a, b in zip(rng.randint(0, 8192, n), rng.randint(0, 200000, n))
        ],
    })
    df = spark.createDataFrame(pdf)

    def vlen(v):
        return 1 if v < 128 else (2 if v < 1 << 14 else (3 if v < 1 << 21 else 4))

    def cost(cmds):
        p = sum(vlen(v) for v in cmds)
        return p + vlen(p) + 1

    pdf["__b"] = pdf["geom_cmds"].map(cost)
    pdf = pdf.sort_values("feature_id")
    pdf["__run"] = pdf.groupby(["tile_x", "tile_y"])["__b"].cumsum()
    budget = 60
    exp = set(pdf[pdf["__run"] <= budget]["feature_id"])
    for buckets in (1, 16):
        got = {
            r["feature_id"]
            for r in cap_tile_bytes(df, budget, salt_buckets=buckets).collect()
        }
        assert got == exp, buckets


def test_cap_tile_bytes_oversized_feature_drops(spark):
    import pandas as pd

    from vectortiles_spark.operators.tiling import cap_tile_bytes

    df = spark.createDataFrame(pd.DataFrame({
        "tile_z": [3, 3], "tile_x": [0, 0], "tile_y": [0, 0],
        "layer": ["l", "l"], "feature_id": [1, 2],
        "geom_cmds": [[9, 1, 1], [9] + [100000] * 50],
    }))
    # the 50-word monster blows the running sum past the budget; the
    # prefix rule keeps only what fit before it
    kept = {r["feature_id"] for r in cap_tile_bytes(df, 20).collect()}
    assert kept == {1}


def test_cap_tile_bytes_packed_point_cost(spark):
    import pandas as pd

    from vectortiles_spark.operators.tiling import cap_tile_bytes

    # packed geom_pt: zx=300 (2 varint bytes), zy=5 (1) + header 1 => payload 4,
    # framing: len-varint 1 + tag 1 => 6 bytes per feature
    df = spark.createDataFrame(pd.DataFrame({
        "tile_z": [3] * 4, "tile_x": [0] * 4, "tile_y": [0] * 4,
        "feature_id": [1, 2, 3, 4],
        "geom_pt": [(300 << 13) | 5] * 4,
    }))
    assert cap_tile_bytes(df, 18).count() == 3  # 3*6 = 18 fits, 4th is 24
    assert cap_tile_bytes(df, 5).count() == 0
