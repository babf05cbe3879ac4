"""Douglas-Peucker generalization: kernel vs recursive reference,
invariants (endpoints, deviation bound, idempotence, ring closure),
and the distributed pass through the encode pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.mvt import codec
from vectortiles_spark.mvt.geometry import GEOM_LINESTRING, GEOM_POLYGON
from vectortiles_spark.operators import tiling
from vectortiles_spark.operators.simplify import (
    dp_keep_mask,
    simplify_geoms,
    simplify_parts,
)


def _seg_dist2(p, a, b):
    """Scalar point-to-segment squared distance (independent formulation:
    explicit endpoint branches instead of the kernel's clamp)."""
    d = b - a
    l2 = float(d @ d)
    if l2 == 0.0:
        return float(((p - a) ** 2).sum())
    t = float((p - a) @ d) / l2
    if t <= 0.0:
        return float(((p - a) ** 2).sum())
    if t >= 1.0:
        return float(((p - b) ** 2).sum())
    return float(((p - (a + t * d)) ** 2).sum())


def _dp_reference(pts: np.ndarray, tol: float) -> np.ndarray:
    """Textbook recursive DP (segment-distance variant, as in JTS/GEOS),
    independent of the kernel under test."""
    P = pts.astype(np.float64)

    def rec(i, j, keep):
        if j <= i + 1:
            return
        best, bi = -1.0, -1
        for k in range(i + 1, j):
            dist2 = _seg_dist2(P[k], P[i], P[j])
            if dist2 > best:
                best, bi = dist2, k
        if best > tol * tol:
            keep[bi] = True
            rec(i, bi, keep)
            rec(bi, j, keep)

    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True
    rec(0, len(pts) - 1, keep)
    return keep


def test_kernel_matches_recursive_reference():
    rng = np.random.Generator(np.random.PCG64(5))
    for trial in range(30):
        n = int(rng.integers(3, 120))
        pts = rng.integers(0, 4096, size=(n, 2)).astype(np.int64)
        tol = float(rng.uniform(0, 200))
        assert np.array_equal(dp_keep_mask(pts, tol), _dp_reference(pts, tol)), (
            trial, n, tol,
        )


def test_collinear_points_removed_exactly():
    pts = np.array([[0, 0], [10, 0], [20, 0], [30, 0], [30, 40]], dtype=np.int64)
    keep = dp_keep_mask(pts, 0.5)
    assert keep.tolist() == [True, False, False, True, True]


def test_deviation_bound_and_idempotence():
    """Every removed vertex lies within tol of the chord that replaced
    it, and re-simplifying the output is a no-op."""
    rng = np.random.Generator(np.random.PCG64(11))
    walk = np.cumsum(rng.integers(-30, 31, size=(200, 2)), axis=0) + 2048
    tol = 25.0
    keep = dp_keep_mask(walk, tol)
    kept_idx = np.flatnonzero(keep)
    P = walk.astype(np.float64)
    for a, b in zip(kept_idx[:-1], kept_idx[1:]):
        for m in range(a + 1, b):
            assert _seg_dist2(P[m], P[a], P[b]) <= tol * tol + 1e-9
    again = dp_keep_mask(walk[keep], tol)
    assert again.all()


def test_spur_beyond_chord_endpoints_survives():
    """Segment (not infinite-line) distance: a long out-and-back spur past
    the chord endpoints is far from the chord SEGMENT and must survive,
    even though its lateral offset from the infinite line is tiny."""
    spur = np.array([[0, 0], [3000, 5], [10, 0]], dtype=np.int64)
    assert dp_keep_mask(spur, 20.0).tolist() == [True, True, True]
    out = simplify_parts(GEOM_LINESTRING, [[spur.tolist()]], tol=20.0)
    assert out == [[spur.tolist()]]


def test_ring_rules():
    # a closed square survives with its corners at small tol
    square = [[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]]
    wiggly = [[0, 0], [50, 2], [100, 0], [100, 100], [0, 100], [0, 0]]
    out = simplify_parts(GEOM_POLYGON, [[wiggly]], tol=5.0)
    assert out == [[square]]
    # a near-degenerate sliver collapses -> part dropped entirely
    sliver = [[0, 0], [100, 1], [200, 0], [0, 0]]
    assert simplify_parts(GEOM_POLYGON, [[sliver]], tol=5.0) == []
    # hole collapses but exterior survives
    hole = [[40, 40], [60, 41], [50, 42], [40, 40]]
    out = simplify_parts(GEOM_POLYGON, [[wiggly, hole]], tol=5.0)
    assert out == [[square]]
    # exterior collapses -> the hole cannot stand alone
    assert simplify_parts(GEOM_POLYGON, [[sliver, hole]], tol=5.0) == []


def test_linestring_endpoints_and_validity():
    zigzag = [[0, 0], [10, 1], [20, 0], [30, 1], [4000, 0]]
    out = simplify_parts(GEOM_LINESTRING, [[zigzag]], tol=3.0)
    assert out == [[[[0, 0], [4000, 0]]]]
    # 2-point lines pass through
    assert simplify_parts(GEOM_LINESTRING, [[[[0, 0], [5, 5]]]], tol=100.0) == [
        [[[0, 0], [5, 5]]]
    ]


def test_simplify_geoms_e2e_through_encode(spark):
    """simplify -> geom_features -> encode_tiles -> decode: vertex counts
    shrink, kept vertices are a subset of the originals, tiles stay
    reference-decodable."""
    rng = np.random.Generator(np.random.PCG64(23))
    rows = []
    for i in range(40):
        walk = np.cumsum(rng.integers(-40, 41, size=(60, 2)), axis=0) + 2048
        walk = np.clip(walk, 0, 4095)
        rows.append((6, i % 4, i // 4 % 4, "roads", GEOM_LINESTRING, i, [[walk.tolist()]]))
    df = spark.createDataFrame(
        rows,
        "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
        "feature_id long, geom array<array<array<array<int>>>>",
    )
    simp = simplify_geoms(df, tolerance=20.0)
    # row-level check: subset + shrink
    orig = {r.feature_id: r.geom for r in df.collect()}
    for r in simp.collect():
        o = [tuple(p) for p in orig[r.feature_id][0][0]]
        s = [tuple(p) for p in r.geom[0][0]]
        assert set(s) <= set(o) and 2 <= len(s) < len(o)
        assert s[0] == o[0] and s[-1] == o[-1]
    # distributed: encode both, simplified tiles must be smaller yet decodable
    plain = tiling.encode_tiles(tiling.geom_features(df)).collect()
    small = tiling.encode_tiles(tiling.geom_features(simp)).collect()
    assert sum(len(t.mvt) for t in small) < sum(len(t.mvt) for t in plain)
    n_feats = 0
    for t in small:
        for layer in codec.decode_tile(t.mvt).values():
            n_feats += len(layer.features)
    assert n_feats == 40


def test_zero_area_ring_and_zero_length_line_dropped():
    """Degenerate outputs are dropped, not emitted: a ring that
    simplifies to zero area (would corrupt the decoder's sign-based
    exterior/hole grouping) and a 2-point line whose endpoints round to
    one vertex."""
    from vectortiles_spark.operators.simplify import simplify_ring

    flat = [[0, 0], [1000, 0], [-500, 0.4], [0, 2], [0, 0]]
    assert simplify_ring(flat, 10.0, closed=True) is None
    assert simplify_ring([[5.4, 5.0], [4.6, 5.0]], 1.0, closed=False) is None
    # a real square still survives
    sq = [[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]]
    assert simplify_ring(sq, 1.0, closed=True) == sq


def test_tolerance_by_zoom(spark):
    """Per-zoom tolerances: the same feature at two zooms simplifies with
    each zoom's own budget (z=2 aggressive -> endpoints only; z=4 gentle
    -> everything survives)."""
    zig = [[0, 0], [500, 30], [1000, 0], [1500, 30], [4000, 0]]
    rows = [
        (2, 0, 0, "l", GEOM_LINESTRING, 1, [[zig]]),
        (4, 0, 0, "l", GEOM_LINESTRING, 1, [[zig]]),
    ]
    df = spark.createDataFrame(
        rows,
        "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
        "feature_id long, geom array<array<array<array<int>>>>",
    )
    out = {
        r.tile_z: r.geom[0][0]
        for r in simplify_geoms(
            df, tolerance=1.0, tolerance_by_zoom={2: 100.0, 4: 1.0}
        ).collect()
    }
    assert [list(p) for p in out[2]] == [[0, 0], [4000, 0]]
    assert [list(p) for p in out[4]] == zig
    with pytest.raises(ValueError, match="tile_z"):
        simplify_geoms(df.drop("tile_z"), 1.0, tolerance_by_zoom={2: 5.0}).collect()


def test_dp_keep_mask_batch_equals_scalar_kernel():
    """The level-synchronous whole-batch DP must make IDENTICAL keep
    decisions to the scalar stack kernel on every ring — collinear runs,
    duplicate-heavy lattices, spikes, near-collinear noise, varying
    per-ring tolerances."""
    import numpy as np

    from vectortiles_spark.operators.simplify import dp_keep_mask, dp_keep_mask_batch

    rng = np.random.default_rng(11)
    rings = []
    for i in range(800):
        k = int(rng.integers(1, 60))
        mode = i % 5
        if mode == 0:
            r = np.cumsum(rng.normal(0, 30, (k, 2)), axis=0)
        elif mode == 1:
            r = np.column_stack([np.arange(k), np.zeros(k)])
        elif mode == 2:
            r = rng.integers(0, 5, (k, 2)).astype(float)
        elif mode == 3:
            r = np.column_stack([np.arange(k), rng.normal(0, 1, k)])
        else:
            r = np.zeros((k, 2))
            r[:, 0] = np.arange(k)
            r[k // 2] = [k // 2, 500]
        rings.append(np.rint(r).astype(float))
    tols = rng.uniform(0.5, 40, len(rings))
    P = np.concatenate(rings)
    lens = np.array([len(r) for r in rings])
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    mask = dp_keep_mask_batch(P, starts, lens, tols**2)
    for i, r in enumerate(rings):
        want = dp_keep_mask(r, tols[i])
        got = mask[starts[i] : starts[i] + lens[i]]
        assert np.array_equal(want, got), (i, lens[i], tols[i])


def test_simplify_geoms_batched_equals_scalar_on_mixed_batches(spark):
    """The batched simplify path (lines + polygon rings through
    dp_keep_mask_batch) must equal simplify_parts feature-for-feature on
    mixed batches: points, walks, squares with holes, zero-area sliver
    parts, empty-ring slots."""
    import numpy as np

    from vectortiles_spark.operators.simplify import simplify_geoms, simplify_parts

    rng = np.random.default_rng(7)
    rows = []
    for i in range(300):
        gt = [1, 2, 3][i % 3]
        if gt == 1:
            geom = [[[[int(rng.integers(0, 4096)), int(rng.integers(0, 4096))]]]]
        elif gt == 2:
            k = int(rng.integers(2, 40))
            pts = np.cumsum(rng.normal(0, 25, (k, 2)), axis=0).astype(int) + 2000
            geom = [[pts.tolist()]]
        else:
            o = rng.integers(100, 3000, 2)
            s = int(rng.integers(6, 400))
            x0, y0 = int(o[0]), int(o[1])
            ext = [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]]
            part = [ext]
            if i % 4 == 0 and s > 40:
                a, bq = x0 + s // 4, y0 + s // 4
                c, d = x0 + s // 2, y0 + s // 2
                part.append([[a, bq], [a, d], [c, d], [c, bq], [a, bq]])
            geom = [part]
            if i % 5 == 0:
                geom.append([[[0, 0], [1, 0], [2, 0], [0, 0]]])  # zero-area part
        rows.append((4, i % 16, i % 13, "mix", gt, i, geom))
    df = spark.createDataFrame(
        rows,
        "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
        "feature_id bigint, geom array<array<array<array<bigint>>>>",
    )
    got = {r.feature_id: r.geom for r in simplify_geoms(df, tolerance=12.0).collect()}
    for r in rows:
        want = simplify_parts(
            r[4], [[list(map(list, ring)) for ring in part] for part in r[6]], 12.0
        )
        g = [[[list(p) for p in ring] for ring in part] for part in got[r[5]]]
        assert g == want, r[5]
