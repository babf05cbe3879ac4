"""Raster->vector conversion: winding/closure rules + Spark pipeline path."""

import numpy as np
import pandas as pd
import pytest

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
