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
