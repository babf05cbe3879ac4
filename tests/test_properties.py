"""Hypothesis property tests generalizing the reference's hand-enumerated
roundtrip cases (test/Test.hs:166-198) to random inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vectortiles_spark.mvt import codec, wire
from vectortiles_spark.mvt import geometry as G

coord = st.integers(min_value=-(2**20), max_value=2**20)
point = st.tuples(coord, coord)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varint_roundtrip(vals):
    buf = wire.encode_varints(np.array(vals, dtype=np.uint64))
    out = wire.decode_varints(buf)
    assert out.tolist() == vals


@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=200))
def test_zigzag_roundtrip(vals):
    assert G.unzig(G.zig(np.array(vals, dtype=np.int64))).tolist() == vals


@given(st.lists(point, min_size=1, max_size=50))
def test_point_geom_roundtrip(pts):
    arr = np.array(pts, dtype=np.int64)
    stream = G.geom_to_stream(G.GEOM_POINT, arr)
    back = G.geom_from_stream(G.GEOM_POINT, stream)
    assert np.array_equal(back, arr)


@given(st.lists(st.lists(point, min_size=2, max_size=20), min_size=1, max_size=8))
def test_linestring_geom_roundtrip(parts):
    geom = [np.array(p, dtype=np.int64) for p in parts]
    stream = G.geom_to_stream(G.GEOM_LINESTRING, geom)
    back = G.geom_from_stream(G.GEOM_LINESTRING, stream)
    assert len(back) == len(geom)
    for a, b in zip(back, geom):
        assert np.array_equal(a, b)


@st.composite
def closed_ring(draw, exterior=True):
    """A closed triangle-or-more ring with the requested winding."""
    n = draw(st.integers(min_value=3, max_value=8))
    cx, cy = draw(point)
    # build a convex-ish ring from sorted angles on a circle; radius > 0
    radii = [draw(st.integers(min_value=1, max_value=500)) for _ in range(n)]
    angles = np.sort(np.linspace(0, 2 * np.pi, n, endpoint=False))
    xs = (cx + np.array(radii) * np.cos(angles)).astype(np.int64)
    ys = (cy + np.array(radii) * np.sin(angles)).astype(np.int64)
    ring = np.stack([xs, ys], axis=1)
    ring = np.concatenate([ring, ring[:1]], axis=0)
    s = G.surveyor(ring)
    if s == 0:
        ring[1][0] += 7  # break collinearity
        ring[1][1] += 3
        s = G.surveyor(ring)
        if s == 0:
            ring[2][1] += 11
            s = G.surveyor(ring)
    if (s > 0) != exterior:
        ring = ring[::-1].copy()
    return ring


@given(st.lists(closed_ring(exterior=True), min_size=1, max_size=4))
@settings(max_examples=50, deadline=None)
def test_polygon_solid_roundtrip(rings):
    rings = [r for r in rings if G.surveyor(r) > 0]
    if not rings:
        return
    geom = [[r] for r in rings]
    stream = G.geom_to_stream(G.GEOM_POLYGON, geom)
    back = G.geom_from_stream(G.GEOM_POLYGON, stream)
    assert len(back) == len(geom)
    for bp, gp in zip(back, geom):
        assert len(bp) == len(gp)
        for br, gr in zip(bp, gp):
            assert np.array_equal(br, gr)


@given(
    st.lists(point, min_size=1, max_size=30),
    st.dictionaries(
        st.text(max_size=8),
        st.one_of(
            st.tuples(st.just(codec.VAL_STRING), st.text(max_size=12)),
            st.tuples(st.just(codec.VAL_DOUBLE), st.floats(allow_nan=False, allow_infinity=False)),
            st.tuples(st.just(codec.VAL_INT), st.integers(min_value=-(2**62), max_value=2**62)),
            st.tuples(st.just(codec.VAL_UINT), st.integers(min_value=0, max_value=2**63)),
            st.tuples(st.just(codec.VAL_SINT), st.integers(min_value=-(2**62), max_value=2**62)),
            st.tuples(st.just(codec.VAL_BOOL), st.booleans()),
        ),
        max_size=5,
    ),
    st.integers(min_value=0, max_value=2**40),
)
@settings(max_examples=100, deadline=None)
def test_tile_encode_decode_roundtrip(pts, meta, fid):
    """Full tile roundtrip with random metadata across all Value variants."""
    feat = codec.Feature(fid, meta, G.GEOM_POINT, np.array(pts, dtype=np.int64))
    layer = codec.Layer(name="props", version=2, extent=4096, features=[feat])
    data = codec.encode_tile([layer])
    back = codec.decode_tile(data)["props"]
    assert back.version == 2 and back.extent == 4096
    f = back.features[0]
    assert f.feature_id == fid
    assert f.metadata == meta
    assert np.array_equal(np.asarray(f.geom), np.array(pts, dtype=np.int64))
