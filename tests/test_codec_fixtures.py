"""Golden-fixture tests ported from the reference suite (test/Test.hs).

Fixture bytes are read straight from /root/reference/test/*.mvt; expected
structures mirror the hand-written assertions at test/Test.hs:112-154.
"""

import numpy as np
import pytest

from vectortiles_spark.mvt import codec
from vectortiles_spark.mvt.geometry import GEOM_LINESTRING, GEOM_POINT, GEOM_POLYGON

FIX = "/root/reference/test"


def load(name: str) -> bytes:
    with open(f"{FIX}/{name}.mvt", "rb") as f:
        return f.read()


@pytest.mark.parametrize("name", ["onepoint", "linestring", "polygon", "roads", "clearlake"])
def test_decode_succeeds(name):
    # Test.hs:36-41 — all five fixtures must decode
    layers = codec.decode_tile(load(name))
    assert layers


def test_onepoint_structure():
    # Test.hs:113-124
    raw = codec.parse_raw_tile(load("onepoint"))
    assert len(raw) == 1
    l = raw[0]
    assert l.version == 1
    assert l.name == "OnePoint"
    assert l.keys == [] and l.values == []
    assert l.extent == 4096
    assert len(l.features) == 1
    f = l.features[0]
    assert f.id == 0
    assert f.tags.size == 0
    assert f.type == GEOM_POINT
    assert f.geometry.tolist() == [9, 10, 10]  # MoveTo(+5,+5)
    # decoded geometry
    layer = codec.layer_from_raw(l)
    assert np.asarray(layer.features[0].geom).tolist() == [[5, 5]]


def test_linestring_structure():
    # Test.hs:127-139
    raw = codec.parse_raw_tile(load("linestring"))[0]
    assert raw.name == "OneLineString"
    f = raw.features[0]
    assert f.type == GEOM_LINESTRING
    assert f.geometry.tolist() == [9, 10, 10, 10, 2390, 2390]
    layer = codec.layer_from_raw(raw)
    parts = layer.features[0].geom
    assert len(parts) == 1
    assert parts[0].tolist() == [[5, 5], [1200, 1200]]


def test_polygon_structure():
    # Test.hs:142-154
    raw = codec.parse_raw_tile(load("polygon"))[0]
    assert raw.name == "OnePolygon"
    f = raw.features[0]
    assert f.type == GEOM_POLYGON
    assert f.geometry.tolist() == [9, 4, 4, 18, 6, 4, 5, 4, 15]
    layer = codec.layer_from_raw(raw)
    polys = layer.features[0].geom
    assert len(polys) == 1 and len(polys[0]) == 1
    ring = polys[0][0]
    # MoveTo(2,2), LineTo(5,4),(2,6), re-closed
    assert ring.tolist() == [[2, 2], [5, 4], [2, 6], [2, 2]]
    # Polygon Validity (Test.hs:57): decoded rings are closed
    assert ring[0].tolist() == ring[-1].tolist()


def test_roads_structure():
    # FIXTURES.md: 15 layers, 453 features, road layer mix
    layers = codec.decode_tile(load("roads"))
    assert len(layers) == 15
    assert sum(len(l.features) for l in layers.values()) == 453
    road = layers["road"]
    by_type = {t: sum(1 for f in road.features if f.geom_type == t) for t in (1, 2, 3)}
    assert by_type == {GEOM_POINT: 1, GEOM_LINESTRING: 190, GEOM_POLYGON: 3}
    assert all(l.version == 2 for l in layers.values())


def test_clearlake_structure():
    layers = codec.decode_tile(load("clearlake"))
    assert set(layers) == {"clear-lake-bsvhxk"}
    l = layers["clear-lake-bsvhxk"]
    by_type = {t: sum(1 for f in l.features if f.geom_type == t) for t in (1, 2, 3)}
    assert by_type == {GEOM_POINT: 16, GEOM_LINESTRING: 169, GEOM_POLYGON: 98}


@pytest.mark.parametrize("name", ["onepoint", "linestring", "polygon", "roads", "clearlake"])
def test_encode_roundtrip_iso(name):
    """encodeIso (Test.hs:42-49,93-96): decode -> encode -> decode yields
    identical canonical features (message-level, not byte-level, equality —
    same as the reference's own gate)."""
    data = load(name)
    before = codec.roundtrip_features(data)
    re = codec.encode_tile(list(codec.decode_tile(data).values()))
    after = codec.roundtrip_features(re)
    assert before == after


def test_roads_byte_stable():
    """Our canonical encode is deterministic: encode(decode(x)) twice -> same bytes."""
    data = load("roads")
    layers = list(codec.decode_tile(data).values())
    assert codec.encode_tile(layers) == codec.encode_tile(layers)


def test_empty_feature_layer_errors():
    # Internal.hs:296 — empty feature list is a decode error
    raw = codec.RawLayer(name="empty", version=2)
    with pytest.raises(ValueError, match="empty"):
        codec.layer_from_raw(raw)


def test_unknown_geomtype_errors():
    # Internal.hs:308
    raw = codec.RawLayer(name="bad", version=2, features=[codec.RawFeature(type=0)])
    with pytest.raises(ValueError, match="UNKNOWN"):
        codec.layer_from_raw(raw)


def test_partial_decode_layer_selection():
    """decode_tile(layers=...) returns exactly the selected layers, each
    byte-equivalent to its full-decode twin; unknown names yield {}; the
    skip path must not disturb parse positions (all 15 roads layers still
    individually reachable)."""
    data = load("roads")
    full = codec.decode_tile(data)
    # one layer: identical to the full decode's entry
    one = codec.decode_tile(data, layers=["road"])
    assert list(one) == ["road"]
    assert codec.encode_layer(one["road"]) == codec.encode_layer(full["road"])
    # a subset preserves tile order and content
    sub = codec.decode_tile(data, layers={"water", "poi_label"})
    assert set(sub) == {"water", "poi_label"}
    for n in sub:
        assert codec.encode_layer(sub[n]) == codec.encode_layer(full[n])
    # every layer individually reachable (skip logic never corrupts pos)
    for n in full:
        assert list(codec.decode_tile(data, layers=[n])) == [n]
    assert codec.decode_tile(data, layers=["no_such_layer"]) == {}
    assert codec.decode_tile(data, layers=[]) == {}


def test_decode_tiles_layer_selective(spark):
    """Distributed decode_tiles(layers=...) equals the full decode filtered
    to those layers, over a multi-layer encoded frame."""
    from pyspark.sql import functions as F

    from vectortiles_spark.operators import tiling
    from vectortiles_spark.sources.synth import images_df

    imgs = images_df(spark, 60, seed=11)
    a = tiling.point_features(imgs, z=3, layer="images", feature_id=F.xxhash64("image_id"))
    b = tiling.point_features(imgs, z=3, layer="roads", feature_id=F.xxhash64("image_id") + 1)
    tiles = tiling.encode_tiles(a.union(b))
    full = tiling.decode_tiles(tiles)
    sel = tiling.decode_tiles(tiles, layers=["roads"])
    key = lambda r: (r.tile_x, r.tile_y, r.layer, r.feature_id, tuple(r.geom_cmds))
    want = sorted(key(r) for r in full.collect() if r.layer == "roads")
    got = sorted(key(r) for r in sel.collect())
    assert got == want and len(got) > 0


# ---------------------------------------------------------------- wire merge


def test_split_layer_frames_partitions_roads_exactly():
    """Splitting roads.mvt into layer frames is lossless (frames
    concatenate back to the original bytes, names and feature counts
    match the full decode) — pins the zero-copy merge fast path."""
    raw = load("roads")
    frames = codec.split_layer_frames(raw)
    t = codec.decode_tile(raw)
    assert [n for n, _, _ in frames] == list(t)
    assert {n: c for n, _, c in frames} == {n: len(l.features) for n, l in t.items()}
    assert b"".join(f for _, f, _ in frames) == raw


def test_merge_tile_blobs_disjoint_equals_combined_encode():
    raw = load("roads")
    t = codec.decode_tile(raw)
    full = codec.encode_tile(t.values())
    half1 = codec.encode_tile([l for n, l in t.items() if n < "m"])
    half2 = codec.encode_tile([l for n, l in t.items() if n >= "m"])
    merged, nf, nl = codec.merge_tile_blobs([half2, half1])
    assert merged == full
    assert nf == sum(len(l.features) for l in t.values())
    assert nl == len(t)


def test_merge_tile_blobs_collision_distinct_ids_byte_exact():
    import copy

    road = codec.decode_tile(load("roads"))["road"]
    c = copy.deepcopy(road)
    for i, f in enumerate(c.features):
        f.feature_id = i + 1
    a, b = copy.deepcopy(c), copy.deepcopy(c)
    a.features = [f for f in c.features if f.feature_id % 2 == 0]
    b.features = [f for f in c.features if f.feature_id % 2 == 1]
    merged, nf, _ = codec.merge_tile_blobs(
        [codec.encode_tile([b]), codec.encode_tile([a])]
    )
    w = copy.deepcopy(c)
    w.features = sorted(c.features, key=lambda f: (f.geom_type, f.feature_id))
    assert merged == codec.encode_tile([w])
    assert nf == len(c.features)


def test_merge_tile_blobs_collision_tied_ids_semantic_equality():
    """roads' features all carry id 0: byte order on ties is merge-order
    dependent, but the decoded feature SETS must still match a combined
    encode."""
    import copy

    road = codec.decode_tile(load("roads"))["road"]
    a, b = copy.deepcopy(road), copy.deepcopy(road)
    a.features = [f for i, f in enumerate(road.features) if i % 2 == 0]
    b.features = [f for i, f in enumerate(road.features) if i % 2 == 1]
    merged, _, _ = codec.merge_tile_blobs(
        [codec.encode_tile([a]), codec.encode_tile([b])]
    )
    assert codec.roundtrip_features(merged) == codec.roundtrip_features(
        codec.encode_tile([road])
    )


def test_merge_tile_blobs_rejects_intra_blob_duplicate_and_mismatch():
    import copy

    road = codec.decode_tile(load("roads"))["road"]
    frame = codec.encode_tile([road])
    with pytest.raises(ValueError, match="within one blob"):
        codec.merge_tile_blobs([frame + frame])
    other = copy.deepcopy(road)
    other.extent = 2048
    with pytest.raises(ValueError, match="version/extent"):
        codec.merge_tile_blobs([frame, codec.encode_tile([other])])


def test_merge_tile_blobs_single_input_passthrough():
    raw = codec.encode_tile(codec.decode_tile(load("roads")).values())
    merged, nf, nl = codec.merge_tile_blobs([raw])
    assert merged == raw
