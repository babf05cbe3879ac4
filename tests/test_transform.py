"""Blob-to-blob filter and enrich transforms."""

import numpy as np
import pytest

from vectortiles_spark.mvt import codec
from vectortiles_spark.operators.transform import (
    enrich_tile_features,
    filter_tile_features,
)


def _tiles_df(spark):
    lay = codec.Layer("pts")
    for i in range(1, 7):
        seg = ["AUTO", "BUILD", "FURN"][i % 3]
        lay.features.append(
            codec.Feature(i, {"segment": (1, seg), "grade": (1, "old")}, 1,
                          np.array([[i * 10, i * 10]], np.int64))
        )
    other = codec.Layer("keepme")
    other.features.append(
        codec.Feature(99, {"segment": (1, "FURN")}, 1, np.array([[1, 1]], np.int64))
    )
    rows = [
        (2, 1, 1, bytearray(codec.encode_tile([lay, other]))),
        (2, 1, 2, bytearray(codec.encode_tile([other]))),
    ]
    return spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, mvt binary"
    )


def test_filter_drops_features_and_empty_tiles(spark):
    df = _tiles_df(spark)
    out = {
        (r.tile_x, r.tile_y): r
        for r in filter_tile_features(
            df, lambda name, f: f.metadata["segment"][1] != "FURN"
        ).collect()
    }
    # tile (1,2) had only FURN features -> gone entirely
    assert set(out) == {(1, 1)}
    t = codec.decode_tile(bytes(out[(1, 1)].mvt))
    assert set(t) == {"pts"}  # keepme's only feature was FURN
    segs = {f.metadata["segment"][1] for f in t["pts"].features}
    assert segs == {"AUTO", "BUILD"}
    assert out[(1, 1)].n_features == 4


def test_filter_layers_scope_passes_others_through(spark):
    df = _tiles_df(spark)
    out = {
        (r.tile_x, r.tile_y): r
        for r in filter_tile_features(
            df, lambda name, f: False, layers=["pts"]
        ).collect()
    }
    # pts filtered away everywhere; keepme untouched
    assert set(out) == {(1, 1), (1, 2)}
    for r in out.values():
        t = codec.decode_tile(bytes(r.mvt))
        assert set(t) == {"keepme"}
        assert t["keepme"].features[0].feature_id == 99


def test_filter_output_is_canonical_encode(spark):
    # filtering with an always-true predicate re-encodes canonically:
    # byte-equal to encode_tile of the decoded layers
    df = _tiles_df(spark)
    rows = {(r.tile_x, r.tile_y): bytes(r.mvt)
            for r in filter_tile_features(df, lambda n, f: True).collect()}
    src = {(r.tile_x, r.tile_y): bytes(r.mvt) for r in df.collect()}
    for k, blob in src.items():
        want = codec.encode_tile(list(codec.decode_tile(blob).values()))
        assert rows[k] == want


def test_enrich_appends_typed_meta(spark):
    df = _tiles_df(spark)
    attrs = spark.createDataFrame(
        [("AUTO", "vroom", 1.5, 7), ("FURN", "sit", 2.5, 8)],
        "segment string, sound string, score double, rank bigint",
    )
    out = filter_tile_features(  # no-op filter to get a comparable base
        enrich_tile_features(df, attrs, on="segment"), lambda n, f: True
    ).collect()
    feats = {}
    for r in out:
        for name, lay in codec.decode_tile(bytes(r.mvt)).items():
            for f in lay.features:
                feats[(r.tile_x, r.tile_y, name, f.feature_id)] = f.metadata
    m = feats[(1, 1, "pts", 3)]  # i=3 -> AUTO
    assert m["sound"] == (codec.VAL_STRING, "vroom")
    assert m["score"] == (codec.VAL_DOUBLE, 1.5)
    assert m["rank"] == (codec.VAL_INT, 7)
    m2 = feats[(1, 1, "pts", 1)]  # i=1 -> BUILD: unmatched, unchanged
    assert set(m2) == {"segment", "grade"}
    m3 = feats[(1, 2, "keepme", 99)]  # FURN
    assert m3["sound"] == (codec.VAL_STRING, "sit")


def test_enrich_overwrite_and_errors(spark):
    df = _tiles_df(spark)
    attrs = spark.createDataFrame(
        [("AUTO", "x")], "segment string, segment2 string"
    )
    # an attr column colliding with an EXISTING meta key ("grade") is
    # kept unless overwrite
    clobber = spark.createDataFrame(
        [("AUTO", "CLOBBERED")], "segment string, grade string"
    )
    # duplicate join keys rejected
    dup = spark.createDataFrame(
        [("AUTO", "a"), ("AUTO", "b")], "segment string, v string"
    )
    with pytest.raises(ValueError, match="duplicate join key"):
        enrich_tile_features(df, dup, on="segment").collect()
    with pytest.raises(ValueError, match="no columns besides"):
        enrich_tile_features(df, attrs.select("segment"), on="segment")
    # a fact table mistakenly passed as attrs raises before collecting it
    with pytest.raises(ValueError, match="dimension table"):
        enrich_tile_features(df, dup, on="segment", max_attr_rows=1)

    def grades(rows):
        got = set()
        for r in rows:
            for lay in codec.decode_tile(bytes(r.mvt)).values():
                for f in lay.features:
                    if "grade" in f.metadata:
                        got.add(f.metadata["grade"][1])
        return got

    assert "CLOBBERED" not in grades(
        enrich_tile_features(df, clobber, on="segment").collect()
    )
    assert "CLOBBERED" in grades(
        enrich_tile_features(df, clobber, on="segment", overwrite=True).collect()
    )


# ------------------------------------------------------------ rescale_tiles


def _mix_tiles(spark):
    from vectortiles_spark.operators import tiling

    rows = [
        (0, 0, 0, "mix", 2, 1, [[[[0.0, 0.0], [1000.0, 2000.0], [4095.0, 4095.0]]]]),
        (0, 0, 0, "mix", 3, 2, [[
            [[0.0, 0.0], [4000.0, 0.0], [4000.0, 4000.0], [0.0, 4000.0], [0.0, 0.0]],
            [[1000.0, 1000.0], [1000.0, 2000.0], [2000.0, 2000.0], [1000.0, 1000.0]],
        ]]),
        (0, 0, 0, "mix", 1, 3, [[[[5.0, 7.0], [4090.0, 17.0]]]]),
        (0, 0, 0, "mix", 2, 4, [[[[10.0, 10.0], [11.0, 10.0]]]]),  # collapses
    ]
    schema = (
        "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
        "feature_id bigint, geom array<array<array<array<double>>>>"
    )
    feats = tiling.geom_features(spark.createDataFrame(rows, schema))
    return tiling.encode_tiles(feats)


def test_rescale_tiles_exact_floor_scaling_and_extent(spark):
    from vectortiles_spark.mvt import codec
    from vectortiles_spark.operators.transform import rescale_tiles

    tiles = _mix_tiles(spark)
    out = rescale_tiles(tiles, 1024).collect()
    assert len(out) == 1 and out[0].n_features == 3  # feature 4 collapsed
    lay = codec.decode_tile(bytes(out[0].mvt))["mix"]
    assert lay.extent == 1024
    by_id = {f.feature_id: f for f in lay.features}
    assert by_id[1].geom[0].tolist() == [[0, 0], [250, 500], [1023, 1023]]
    assert by_id[2].geom[0][0].tolist() == [
        [0, 0], [1000, 0], [1000, 1000], [0, 1000], [0, 0]
    ]
    assert by_id[2].geom[0][1].tolist() == [
        [250, 250], [250, 500], [500, 500], [250, 250]
    ]
    assert by_id[3].geom.tolist() == [[1, 1], [1022, 4]]
    assert 4 not in by_id


def test_rescale_tiles_collapse_policy(spark):
    """Extreme downscale: hole ring dies (area 0), exterior survives; the
    short line dedupes to one point and its feature drops."""
    from vectortiles_spark.mvt import codec
    from vectortiles_spark.operators.transform import rescale_tiles

    tiles = _mix_tiles(spark)
    out = rescale_tiles(tiles, 2).collect()
    lay = codec.decode_tile(bytes(out[0].mvt))["mix"]
    by_id = {f.feature_id: f for f in lay.features}
    assert set(by_id) == {1, 2, 3}
    assert len(by_id[2].geom[0]) == 1  # hole dropped, exterior kept


def test_rescale_tiles_drops_winding_flipped_rings(spark):
    """Floor scaling can FLIP a thin ring's shoelace sign (hole
    (0,0),(2,3),(5,7) is -0.5; scaled by //2 it becomes +0.5). Decode
    groups rings into polygons by sign, so a flipped hole would start a
    bogus new exterior — the rescale must drop sign-flipped rings, and a
    flipped EXTERIOR must take its part with it."""
    from vectortiles_spark.mvt import codec
    from vectortiles_spark.operators import tiling
    from vectortiles_spark.operators.transform import rescale_tiles

    outer = [[0.0, 0.0], [4000.0, 0.0], [4000.0, 4000.0], [0.0, 4000.0], [0.0, 0.0]]
    sliver_hole = [[0.0, 0.0], [2.0, 3.0], [5.0, 7.0], [0.0, 0.0]]
    # exterior sliver with +0.5 area that flips negative under //2:
    # reverse of the hole above, placed as its own single-ring part
    sliver_ext = [[0.0, 0.0], [5.0, 7.0], [2.0, 3.0], [0.0, 0.0]]
    rows = [
        (0, 0, 0, "mix", 3, 1, [[outer, sliver_hole]]),
        (0, 0, 0, "mix", 3, 2, [[sliver_ext]]),
    ]
    schema = (
        "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
        "feature_id bigint, geom array<array<array<array<double>>>>"
    )
    feats = tiling.geom_features(spark.createDataFrame(rows, schema))
    out = rescale_tiles(tiling.encode_tiles(feats), 2048).collect()
    lay = codec.decode_tile(bytes(out[0].mvt))["mix"]
    by_id = {f.feature_id: f for f in lay.features}
    assert set(by_id) == {1}  # flipped-exterior feature 2 dropped entirely
    assert len(by_id[1].geom) == 1 and len(by_id[1].geom[0]) == 1  # hole gone
    from vectortiles_spark.mvt.geometry import surveyor

    assert surveyor(by_id[1].geom[0][0]) == 2000.0 * 2000.0


def test_rescale_tiles_identity_and_validation(spark):
    import pytest as _pt

    from vectortiles_spark.operators.transform import rescale_tiles

    tiles = _mix_tiles(spark)
    src = {r.tile_x: bytes(r.mvt) for r in tiles.collect()}
    same = {r.tile_x: bytes(r.mvt) for r in rescale_tiles(tiles, 4096).collect()}
    assert src == same  # identity rescale is byte-stable
    with _pt.raises(ValueError, match="new_extent"):
        rescale_tiles(tiles, 0)
