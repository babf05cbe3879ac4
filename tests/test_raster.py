"""Raster->vector conversion: winding/closure rules + Spark pipeline path."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.mvt import codec
from vectortiles_spark.mvt.geometry import surveyor
from vectortiles_spark.operators import tiling
from vectortiles_spark.operators.raster import mask_to_polygons, raster_to_features


def test_single_pixel_unit_square():
    m = np.zeros((4, 4), bool)
    m[0, 0] = True
    polys = mask_to_polygons(m)
    assert len(polys) == 1
    ring = polys[0][0]
    assert surveyor(ring) == 1.0  # reference winding: exterior positive
    assert ring[0].tolist() == ring[-1].tolist()  # closed


def test_holed_square():
    m = np.zeros((8, 8), bool)
    m[1:6, 1:6] = True
    m[3, 3] = False
    polys = mask_to_polygons(m)
    assert len(polys) == 1
    ext, hole = polys[0]
    assert surveyor(ext) == 25.0
    assert surveyor(hole) == -1.0


def test_diagonal_pixels_stay_separate():
    m = np.zeros((4, 4), bool)
    m[0, 0] = m[1, 1] = True
    polys = mask_to_polygons(m)
    assert len(polys) == 2
    assert all(surveyor(p[0]) == 1.0 for p in polys)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_area_conservation_random_masks(seed):
    """Σ shoelace over all rings == filled pixel count — a full-structure
    invariant (exteriors positive, holes negative, no lost regions)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    m = rng.random((24, 24)) < 0.45
    polys = mask_to_polygons(m)
    total = sum(surveyor(r) for p in polys for r in p)
    assert total == m.sum()


def test_raster_to_mvt_pipeline(spark):
    """Raster tiles -> vector features -> MVT -> decode; rings obey the
    reference closure/winding rules after the full Spark roundtrip."""
    def blob(cx, cy, r, size=64):
        yy, xx = np.mgrid[0:size, 0:size]
        return (((xx - cx) ** 2 + (yy - cy) ** 2) < r * r).astype(np.uint8) * 255

    g1 = blob(20, 20, 10)
    g2 = blob(40, 40, 14) - blob(40, 40, 6)  # annulus -> exterior + hole
    pdf = pd.DataFrame(
        {
            "tile_z": [3, 3], "tile_x": [1, 2], "tile_y": [1, 2],
            "w": [64, 64], "h": [64, 64],
            "px": [g1.tobytes(), g2.tobytes()],
        }
    )
    rasters = spark.createDataFrame(pdf)
    feats = raster_to_features(rasters, layer="blobs", threshold=128)
    tiles = tiling.encode_tiles(feats).collect()
    assert len(tiles) == 2
    by_tile = {(r.tile_x, r.tile_y): r for r in tiles}
    # disk tile: one polygon, one ring, positive area
    layer = codec.decode_tile(bytes(by_tile[(1, 1)].mvt))["blobs"]
    polys = layer.features[0].geom
    assert len(polys) == 1 and len(polys[0]) == 1
    assert surveyor(polys[0][0]) > 0
    # annulus tile: exterior + hole
    layer2 = codec.decode_tile(bytes(by_tile[(2, 2)].mvt))["blobs"]
    polys2 = layer2.features[0].geom
    assert len(polys2[0]) == 2
    assert surveyor(polys2[0][0]) > 0 > surveyor(polys2[0][1])
    # all rings closed
    for f in layer.features + layer2.features:
        for poly in f.geom:
            for ring in poly:
                assert ring[0].tolist() == ring[-1].tolist()
    # metadata carries the traced area
    assert layer.features[0].metadata["area"][0] == codec.VAL_DOUBLE


def test_empty_raster_produces_no_features(spark):
    pdf = pd.DataFrame(
        {"tile_z": [3], "tile_x": [0], "tile_y": [0], "w": [16], "h": [16],
         "px": [np.zeros((16, 16), np.uint8).tobytes()]}
    )
    feats = raster_to_features(spark.createDataFrame(pdf))
    assert feats.count() == 0


# ------------------------------------------------------------ rasterize_points


def test_rasterize_points_matches_numpy_twin(spark):
    """Mercator density grid vs a brute-force NumPy binning of the same
    points (tile_xy_np/tile_pixel_np are the pinned scalar twins)."""
    from vectortiles_spark.functions.tiles import tile_pixel_np, tile_xy_np
    from vectortiles_spark.operators.raster import rasterize_points

    rng = np.random.default_rng(7)
    n = 4000
    lon = rng.uniform(-179.9, 179.9, n)
    lat = rng.uniform(-84.9, 84.9, n)
    w = np.round(rng.uniform(0, 100, n), 2)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat, "w": w}))
    got = {
        (r.tile_x, r.tile_y, r.cell_x, r.cell_y): (r.n, r.w_sum)
        for r in rasterize_points(df, z=4, cells=8, weight="w").collect()
    }
    tx, ty = tile_xy_np(lon, lat, 4)
    px, py = tile_pixel_np(lon, lat, 4)
    want: dict = {}
    for i in range(n):
        k = (int(tx[i]), int(ty[i]), int(px[i]) >> 9, int(py[i]) >> 9)
        c, s = want.get(k, (0, 0.0))
        want[k] = (c + 1, s + w[i])
    assert set(got) == set(want)
    for k, (c, s) in want.items():
        assert got[k][0] == c
        assert abs(got[k][1] - round(s, 2)) < 1e-6
    # sparse bound: never more than cells^2 rows per tile
    from collections import Counter

    per_tile = Counter((k[0], k[1]) for k in got)
    assert max(per_tile.values()) <= 64


def test_rasterize_points_non_pow2_cells(spark):
    """cells need not divide extent into a power-of-two cell size: the
    old bit-shift binning silently produced 64-px cells for cells=10 /
    extent=1000 (cell ids 0..15 instead of 0..9). Floor-division twin
    pins the fix."""
    from vectortiles_spark.functions.tiles import tile_pixel_np, tile_xy_np
    from vectortiles_spark.operators.raster import rasterize_points

    rng = np.random.default_rng(23)
    n = 1500
    lon = rng.uniform(-179.9, 179.9, n)
    lat = rng.uniform(-84.9, 84.9, n)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    got = {
        (r.tile_x, r.tile_y, r.cell_x, r.cell_y): r.n
        for r in rasterize_points(df, z=3, cells=10, extent=1000).collect()
    }
    tx, ty = tile_xy_np(lon, lat, 3)
    px, py = tile_pixel_np(lon, lat, 3, extent=1000)
    want: dict = {}
    for i in range(n):
        k = (int(tx[i]), int(ty[i]), int(px[i]) // 100, int(py[i]) // 100)
        want[k] = want.get(k, 0) + 1
    assert got == want
    assert all(0 <= k[2] <= 9 and 0 <= k[3] <= 9 for k in got)


def test_rasterize_points_single_aggregate_plan(spark):
    """ONE hash aggregate with a map-side partial: exactly one Exchange,
    keyed on the full (tile, cell) grain, two HashAggregate spans."""
    from vectortiles_spark.operators.raster import rasterize_points

    df = spark.range(1000).select(
        (F.pmod(F.col("id") * 9973, F.lit(36000)) / 100.0 - 180.0).alias("lon"),
        (F.pmod(F.col("id") * 7919, F.lit(17000)) / 100.0 - 85.0).alias("lat"),
    )
    plan = (
        rasterize_points(df, z=5, cells=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "cell_x" in plan.split("Exchange")[1].splitlines()[0]
    assert plan.count("HashAggregate") == 2


def test_rasterize_points_validation(spark):
    from vectortiles_spark.operators.raster import rasterize_points

    df = spark.range(1).select(F.lit(0.0).alias("lon"), F.lit(0.0).alias("lat"))
    with pytest.raises(ValueError, match="divide"):
        rasterize_points(df, z=3, cells=100)
    with pytest.raises(ValueError, match="projection"):
        rasterize_points(df, z=3, cells=16, projection="sinusoidal")


# --------------------------------------------------------- rasterize_polygons


def _brute_fill(rings, w, h, extent):
    """Independent per-pixel even-odd twin of fill_polygons_mask: same
    half-open center rule, naive per-pixel crossing count."""
    sx, sy = extent / w, extent / h
    mask = np.zeros((h, w), dtype=bool)
    edges = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if (r[0] != r[-1]).any():
            r = np.concatenate([r, r[:1]])
        edges.extend(zip(r[:-1], r[1:]))
    for row in range(h):
        cy = (row + 0.5) * sy
        for col in range(w):
            cx = (col + 0.5) * sx
            n = 0
            for a, b in edges:
                (x1, y1), (x2, y2) = a, b
                if y1 == y2:
                    continue
                if min(y1, y2) <= cy < max(y1, y2):
                    xs = x1 + (cy - y1) * (x2 - x1) / (y2 - y1)
                    if xs <= cx:
                        n += 1
            mask[row, col] = bool(n & 1)
    return mask


def _rect_ring(x0, y0, x1, y1):
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]


def _poly_feats(spark, rows):
    """rows: (tile_x, feature_id, polys) with polys =
    [[ring, ...], ...] in extent coords."""
    from vectortiles_spark.operators import tiling

    data = [
        (0, tx, 0, "p", 3, fid, [[[ [float(c[0]), float(c[1])] for c in ring]
                                   for ring in poly] for poly in polys])
        for tx, fid, polys in rows
    ]
    schema = (
        "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
        "feature_id bigint, geom array<array<array<array<double>>>>"
    )
    return tiling.geom_features(spark.createDataFrame(data, schema))


def test_rasterize_polygons_rect_closed_form(spark):
    """Axis-aligned rect [x0,x1)x[y0,y1): covered centers are exactly
    x0 <= 64c+32 < x1 per axis at w=h=64/extent=4096 — integer-exact."""
    from vectortiles_spark.operators.raster import rasterize_polygons

    x0, y0, x1, y1 = 100, 250, 2345, 3900
    feats = _poly_feats(spark, [(1, 7, [[_rect_ring(x0, y0, x1, y1)]])])
    got = {
        (r.cell_x, r.cell_y)
        for r in rasterize_polygons(feats, w=64, h=64, output="cells").collect()
    }
    want = {
        (c, r)
        for c in range(64) for r in range(64)
        if x0 <= 64 * c + 32 < x1 and y0 <= 64 * r + 32 < y1
    }
    assert got == want


def test_rasterize_polygons_hole_and_multifeature_union(spark):
    """A holed polygon plus a second overlapping feature: holes toggle
    parity off, separate features union — pinned against the independent
    per-pixel brute twin."""
    from vectortiles_spark.operators.raster import (
        fill_polygons_mask, rasterize_polygons,
    )

    outer = _rect_ring(0, 0, 3000, 3000)
    hole = _rect_ring(800, 800, 2200, 2200)
    tri = [[1500, 1500], [4000, 1800], [2600, 3900], [1500, 1500]]
    feats = _poly_feats(
        spark, [(2, 1, [[outer, hole]]), (2, 2, [[tri]])]
    )
    out = rasterize_polygons(feats, w=32, h=32, output="raster").collect()
    assert len(out) == 1 and out[0].w == 32
    got = np.frombuffer(bytes(out[0].px), np.uint8).reshape(32, 32) > 0
    want = _brute_fill([outer, hole], 32, 32, 4096) | _brute_fill(
        [tri], 32, 32, 4096
    )
    assert (got == want).all()
    # kernel twin agrees with itself too (same rings, one call)
    assert (
        fill_polygons_mask(
            [np.array(r) for r in (outer, hole)], 32, 32, 4096
        )
        == _brute_fill([outer, hole], 32, 32, 4096)
    ).all()


def test_rasterize_polygons_roundtrip_through_raster_to_features(spark):
    """Grid-aligned rect -> rasterize -> raster_to_features recovers the
    same single ring (the D7 inverse pairing)."""
    from vectortiles_spark.mvt.geometry import GEOM_POLYGON, geom_from_stream
    from vectortiles_spark.operators.raster import (
        raster_to_features, rasterize_polygons,
    )

    from vectortiles_spark.mvt.geometry import surveyor

    x0, y0, x1, y1 = 256, 512, 2048, 3072  # multiples of 4096/64=64
    feats = _poly_feats(spark, [(3, 1, [[_rect_ring(x0, y0, x1, y1)]])])
    rast = rasterize_polygons(feats, w=64, h=64, output="raster")
    out = rast.collect()
    back = raster_to_features(rast, extent=4096).collect()
    assert len(back) == 1
    polys = geom_from_stream(
        GEOM_POLYGON, np.asarray(back[0].geom_cmds, np.uint32)
    )
    assert len(polys) == 1 and len(polys[0]) == 1
    ring = polys[0][0]
    # the trace emits unit lattice edges, so compare shape invariants:
    # exact shoelace area, exact bounding box, and a bit-exact mask when
    # the traced polygon is rasterized again (the inverse pairing)
    # trace coords are scaled back to extent units, so area is exact there
    assert surveyor(ring) == float((x1 - x0) * (y1 - y0))
    assert (ring.min(0).tolist(), ring.max(0).tolist()) == (
        [x0, y0], [x1, y1]
    )
    refeat = _poly_feats(
        spark, [(3, 1, [[ring.astype(float).tolist()]])]
    )
    again = rasterize_polygons(refeat, w=64, h=64, output="raster").collect()
    assert bytes(again[0].px) == bytes(out[0].px)


def test_rasterize_polygons_validation(spark):
    from vectortiles_spark.operators import tiling
    from vectortiles_spark.operators.raster import rasterize_polygons

    feats = _poly_feats(spark, [(1, 1, [[_rect_ring(0, 0, 100, 100)]])])
    with pytest.raises(ValueError, match="divide"):
        rasterize_polygons(feats, w=60)
    with pytest.raises(ValueError, match="output"):
        rasterize_polygons(feats, output="sparse")
    with pytest.raises(ValueError, match="value"):
        rasterize_polygons(feats, value=0)
    pts = tiling.geom_features(
        spark.createDataFrame(
            [(0, 1, 0, "p", 1, 9, [[[[5.0, 7.0]]]])],
            "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
            "feature_id bigint, geom array<array<array<array<double>>>>",
        )
    )
    import py4j.protocol

    with pytest.raises(Exception, match="non-polygon"):
        rasterize_polygons(pts, output="cells").collect()


# ------------------------------------------------------------------ zonal_stats


def test_zonal_stats_matches_brute_twin(spark):
    """Per-feature stats over a deterministic raster == the per-pixel
    brute mask + NumPy aggregation, including a feature with holes and
    one whose mask is empty."""
    from vectortiles_spark.operators.raster import zonal_stats

    w = h = 32
    grid = ((np.arange(h)[:, None] * 17 + np.arange(w)[None, :] * 13) % 251).astype(
        np.uint8
    )
    rasters = spark.createDataFrame(
        pd.DataFrame(
            {"tile_z": [0], "tile_x": [5], "tile_y": [0],
             "w": [w], "h": [h], "px": [grid.tobytes()]}
        )
    )
    outer = _rect_ring(0, 0, 3000, 3000)
    hole = _rect_ring(800, 800, 2200, 2200)
    sliver = _rect_ring(10, 10, 30, 30)  # thinner than one 128px cell
    feats = _poly_feats(
        spark,
        [(5, 1, [[outer, hole]]), (5, 2, [[sliver]]),
         (9, 3, [[_rect_ring(0, 0, 4096, 4096)]])],  # tile 9 has no raster
    )
    got = {r.feature_id: r for r in zonal_stats(feats, rasters).collect()}
    assert set(got) == {1, 2}  # inner-join: tile 9 emits nothing
    m = _brute_fill([outer, hole], w, h, 4096)
    vals = grid[m]
    r1 = got[1]
    assert (r1.n_px, r1.sum_val, r1.min_val, r1.max_val) == (
        int(vals.size), int(vals.sum()), int(vals.min()), int(vals.max())
    )
    assert r1.mean_val == float(vals.sum()) / vals.size
    r2 = got[2]
    assert (r2.n_px, r2.sum_val, r2.min_val, r2.max_val, r2.mean_val) == (
        0, 0, None, None, None
    )


def test_zonal_stats_validation(spark):
    from vectortiles_spark.operators.raster import zonal_stats

    raster_row = {"tile_z": 0, "tile_x": 1, "tile_y": 0, "w": 32, "h": 32,
                  "px": bytes(32 * 32)}
    feats = _poly_feats(spark, [(1, 1, [[_rect_ring(0, 0, 100, 100)]])])
    dup = spark.createDataFrame(pd.DataFrame([raster_row, raster_row]))
    with pytest.raises(Exception, match="2 rasters"):
        zonal_stats(feats, dup).collect()
    one = spark.createDataFrame(pd.DataFrame([raster_row]))
    pts = tiling.geom_features(
        spark.createDataFrame(
            [(0, 1, 0, "p", 1, 9, [[[[5.0, 7.0]]]])],
            "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
            "feature_id bigint, geom array<array<array<array<double>>>>",
        )
    )
    with pytest.raises(Exception, match="non-polygon"):
        zonal_stats(pts, one).collect()
    bad = spark.createDataFrame(
        pd.DataFrame([{**raster_row, "w": 60, "h": 60, "px": bytes(3600)}])
    )
    with pytest.raises(Exception, match="divide"):
        zonal_stats(feats.filter("tile_x = 1"), bad).collect()


# ------------------------------------------------------------ composite_rasters


def test_composite_rasters_methods_match_numpy(spark):
    from vectortiles_spark.operators.raster import composite_rasters

    rng = np.random.default_rng(11)
    grids = [rng.integers(0, 256, (16, 16), dtype=np.uint8) for _ in range(5)]
    rows = [
        {"tile_z": 2, "tile_x": 1, "tile_y": 1, "w": 16, "h": 16,
         "px": g.tobytes()} for g in grids
    ]
    # a second tile with one snapshot, plus a fully-corrupt tile
    solo = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    rows.append({"tile_z": 2, "tile_x": 2, "tile_y": 1, "w": 16, "h": 16,
                 "px": solo.tobytes()})
    rows.append({"tile_z": 2, "tile_x": 3, "tile_y": 1, "w": 16, "h": 16,
                 "px": b"short"})
    df = spark.createDataFrame(pd.DataFrame(rows))
    for method, want in (
        ("max", np.maximum.reduce(grids)),
        ("min", np.minimum.reduce(grids)),
        ("mean", (np.sum([g.astype(np.int64) for g in grids], axis=0) // 5).astype(np.uint8)),
    ):
        out = {r.tile_x: r for r in composite_rasters(df, method).collect()}
        assert set(out) == {1, 2}  # corrupt-only tile 3 leaves the relation
        got = np.frombuffer(bytes(out[1].px), np.uint8).reshape(16, 16)
        assert (got == want).all(), method
        got2 = np.frombuffer(bytes(out[2].px), np.uint8).reshape(16, 16)
        assert (got2 == solo).all(), method


def test_composite_rasters_corrupt_row_dropped_mixed_dims_raise(spark):
    from vectortiles_spark.operators.raster import composite_rasters

    a = np.full((8, 8), 10, np.uint8)
    b = np.full((8, 8), 200, np.uint8)
    rows = [
        {"tile_z": 0, "tile_x": 0, "tile_y": 0, "w": 8, "h": 8, "px": a.tobytes()},
        {"tile_z": 0, "tile_x": 0, "tile_y": 0, "w": 8, "h": 8, "px": None},
        {"tile_z": 0, "tile_x": 0, "tile_y": 0, "w": 8, "h": 8, "px": b.tobytes()},
    ]
    out = composite_rasters(spark.createDataFrame(pd.DataFrame(rows))).collect()
    assert np.frombuffer(bytes(out[0].px), np.uint8).max() == 200
    rows[1] = {"tile_z": 0, "tile_x": 0, "tile_y": 0, "w": 4, "h": 4,
               "px": bytes(16)}
    with pytest.raises(Exception, match="mixed dims"):
        composite_rasters(spark.createDataFrame(pd.DataFrame(rows))).collect()
    with pytest.raises(ValueError, match="method"):
        composite_rasters(spark.createDataFrame(pd.DataFrame(rows)), "median")
