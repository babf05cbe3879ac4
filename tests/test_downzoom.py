"""Downzoom kernel + distributed operator.

The kernel inverts overzoom at value level: overzoom doubles coordinates
exactly, downzoom floors them back, so points survive a round trip
canonically. Lines/polys gain split points at child borders (clip) but
keep their pixels. Degenerate-collapse policy mirrors clip.py's
_localize_ring (see downzoom.py docstring)."""

import numpy as np
import pytest

from vectortiles_spark.mvt import codec
from vectortiles_spark.operators.downzoom import downzoom_blobs, downzoom_tiles
from vectortiles_spark.operators.overzoom import overzoom_blob


def _point_tile(n=300, seed=5, key="seg"):
    rng = np.random.default_rng(seed)
    lay = codec.Layer("pts")
    segs = ["A", "BB", "CCC"]
    xy = rng.integers(0, 4096, (n, 2)).astype(np.int64)
    for i in range(n):
        lay.features.append(
            codec.Feature(i + 1, {key: (1, segs[i % 3])}, 1, xy[i : i + 1])
        )
    return codec.encode_tile([lay])


def _canon(blob):
    return {
        name: sorted(f.canonical() for f in lay.features)
        for name, lay in codec.decode_tile(blob).items()
    }


def test_points_roundtrip_canonical():
    parent = _point_tile()
    kids = [(7, 20 + dx, 40 + dy, b) for dx, dy, b, _, _ in overzoom_blob(parent)]
    pz, px, py, blob, nf, nl = downzoom_blobs(kids)
    assert (pz, px, py) == (6, 10, 20)
    assert nf == 300 and nl == 1
    assert _canon(blob) == _canon(parent)


def test_levels2_roundtrip():
    parent = _point_tile(n=120, seed=9)
    kids = [(8, 12 + dx, 8 + dy, b) for dx, dy, b, _, _ in overzoom_blob(parent, levels=2)]
    pz, px, py, blob, nf, _ = downzoom_blobs(kids, levels=2)
    assert (pz, px, py) == (6, 3, 2)
    assert nf == 120
    assert _canon(blob) == _canon(parent)


def test_partial_children_ok():
    parent = _point_tile(n=200, seed=11)
    kids = [(7, dx, dy, b) for dx, dy, b, _, _ in overzoom_blob(parent)]
    # drop one child: its features are simply absent from the parent
    kept = kids[:-1]
    _, _, _, blob, nf, _ = downzoom_blobs(kept)
    want = sum(
        len(l.features) for _, _, _, d in kept for l in codec.decode_tile(d).values()
    )
    assert nf == want < 200


def test_line_dedupe_and_min_points():
    # a 1-px step line collapses to a single point at the parent -> part
    # drops; a longer line survives with consecutive duplicates deduped
    lay = codec.Layer("lines")
    lay.features.append(
        codec.Feature(1, {}, 2, [np.array([[100, 100], [101, 101]], np.int64)])
    )
    lay.features.append(
        codec.Feature(
            2, {}, 2, [np.array([[0, 0], [1, 1], [200, 200]], np.int64)]
        )
    )
    blob = codec.encode_tile([lay])
    _, _, _, out, nf, nl = downzoom_blobs([(5, 0, 0, blob)])
    assert nf == 1 and nl == 1
    (f,) = codec.decode_tile(out)["lines"].features
    assert f.feature_id == 2
    assert f.geom[0].tolist() == [[0, 0], [100, 100]]


def test_ring_collapse_drops_part_and_holes_never_promoted():
    lay = codec.Layer("polys")
    tiny = np.array([[10, 10], [11, 10], [11, 11], [10, 11], [10, 10]], np.int64)
    big = np.array(
        [[0, 0], [400, 0], [400, 400], [0, 400], [0, 0]], np.int64
    )
    hole = np.array(
        [[100, 100], [100, 200], [200, 200], [200, 100], [100, 100]], np.int64
    )
    tiny_hole = np.array([[50, 50], [50, 51], [51, 51], [50, 50]], np.int64)
    # part 1: tiny exterior with a big "hole" -> exterior collapses at
    # levels=3, whole part (hole included) must drop
    lay.features.append(codec.Feature(1, {}, 3, [[tiny, hole]]))
    # part 2: big exterior + tiny hole -> survives, hole drops
    lay.features.append(codec.Feature(2, {}, 3, [[big, hole], [big + 2000, tiny_hole + 2000]]))
    blob = codec.encode_tile([lay])
    _, _, _, out, nf, _ = downzoom_blobs([(6, 0, 0, blob)], levels=3)
    assert nf == 1
    (f,) = codec.decode_tile(out)["polys"].features
    assert f.feature_id == 2
    assert len(f.geom) == 2
    assert len(f.geom[0]) == 2  # big hole kept
    assert len(f.geom[1]) == 1  # tiny hole dropped


def test_multi_layer_merge_sorted_names():
    a = codec.Layer("b_layer")
    a.features.append(codec.Feature(1, {}, 1, np.array([[5, 5]], np.int64)))
    b = codec.Layer("a_layer")
    b.features.append(codec.Feature(2, {}, 1, np.array([[7, 7]], np.int64)))
    t1 = codec.encode_tile([a])
    t2 = codec.encode_tile([b])
    _, _, _, out, nf, nl = downzoom_blobs([(3, 0, 0, t1), (3, 1, 1, t2)])
    assert (nf, nl) == (2, 2)
    assert list(codec.decode_tile(out).keys()) == ["a_layer", "b_layer"]


def test_errors():
    t = _point_tile(n=4)
    with pytest.raises(ValueError, match="levels must be >= 1"):
        downzoom_blobs([(3, 0, 0, t)], levels=0)
    with pytest.raises(ValueError, match="at least one child"):
        downzoom_blobs([])
    with pytest.raises(ValueError, match="multiple zooms"):
        downzoom_blobs([(3, 0, 0, t), (4, 0, 0, t)])
    with pytest.raises(ValueError, match="cannot downzoom z=0"):
        downzoom_blobs([(0, 0, 0, t)])
    with pytest.raises(ValueError, match="duplicate child"):
        downzoom_blobs([(3, 0, 0, t), (3, 0, 0, t)])
    with pytest.raises(ValueError, match="multiple parents"):
        downzoom_blobs([(3, 0, 0, t), (3, 2, 0, t)])
    # malformed blob rejected like decode_tile
    with pytest.raises(Exception):
        downzoom_blobs([(3, 0, 0, b"\x1a\x99garbage")])


def test_extent_mismatch_rejected():
    a = codec.Layer("l", extent=4096)
    a.features.append(codec.Feature(1, {}, 1, np.array([[5, 5]], np.int64)))
    b = codec.Layer("l", extent=512)
    b.features.append(codec.Feature(2, {}, 1, np.array([[7, 7]], np.int64)))
    with pytest.raises(ValueError, match="extent/version mismatch"):
        downzoom_blobs([(3, 0, 0, codec.encode_tile([a])), (3, 1, 0, codec.encode_tile([b]))])


def test_distributed_matches_kernel(spark):
    parent_a = _point_tile(n=150, seed=1)
    parent_b = _point_tile(n=80, seed=2)
    rows = []
    for (bx, by), parent in (((4, 6), parent_a), ((8, 2), parent_b)):
        for dx, dy, blob, _, _ in overzoom_blob(parent):
            rows.append((7, bx * 2 + dx, by * 2 + dy, bytearray(blob)))
    df = spark.createDataFrame(rows, "tile_z int, tile_x int, tile_y int, mvt binary")
    got = {
        (r.tile_z, r.tile_x, r.tile_y): (bytes(r.mvt), r.n_features, r.n_layers)
        for r in downzoom_tiles(df, levels=1).collect()
    }
    assert set(got) == {(6, 4, 6), (6, 8, 2)}
    for (bx, by), parent in (((4, 6), parent_a), ((8, 2), parent_b)):
        kids = [
            (7, bx * 2 + dx, by * 2 + dy, b)
            for dx, dy, b, _, _ in overzoom_blob(parent)
        ]
        _, _, _, blob, nf, nl = downzoom_blobs(kids)
        assert got[(6, bx, by)] == (blob, nf, nl)


def test_build_overviews(spark):
    from vectortiles_spark.operators.downzoom import build_overviews

    parent = _point_tile(n=60, seed=21)
    rows = [
        (8, 12 * 4 + dx, 8 * 4 + dy, bytearray(b))
        for dx, dy, b, _, _ in overzoom_blob(parent, levels=2)
    ]
    df = spark.createDataFrame(rows, "tile_z int, tile_x int, tile_y int, mvt binary")
    got = build_overviews(df, min_z=6, max_z=8).collect()
    by_z = {}
    for r in got:
        by_z.setdefault(r.tile_z, []).append(r)
    assert set(by_z) == {8, 7, 6}
    assert len(by_z[8]) == len(rows)
    assert len(by_z[6]) == 1
    (z6,) = by_z[6]
    assert (z6.tile_x, z6.tile_y) == (12, 8)
    # two halvings of exactly-doubled-twice points restore the original
    assert _canon(bytes(z6.mvt)) == _canon(parent)
    # z7 from chained z8->z7 equals kernel downzoom of the z8 children
    kids7 = {}
    for r in rows:
        kids7.setdefault((r[1] >> 1, r[2] >> 1), []).append(
            (8, r[1], r[2], bytes(r[3]))
        )
    want7 = {
        k: downzoom_blobs(v)[3] for k, v in kids7.items()
    }
    got7 = {(r.tile_x, r.tile_y): bytes(r.mvt) for r in by_z[7]}
    assert got7 == want7

    import pytest

    with pytest.raises(ValueError, match="min_z <= max_z"):
        build_overviews(df, min_z=9, max_z=8)
