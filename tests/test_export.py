"""Export direction: MVT tiles -> world features -> GeoJSON. On the
equirect pixel lattice the whole circle is EXACT (projection and inverse
are dyadic-rational), so world-in == world-out bit-for-bit."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.operators import tiling
from vectortiles_spark.operators.clip import clip_features
from vectortiles_spark.operators.export import tiles_to_geojson, tiles_to_world_features
from vectortiles_spark.sources.geojson import read_geojson

EXT = 4096
Z = 2


def _px_to_lonlat(px, py):
    span = (1 << Z) * EXT
    return px * 360.0 / span - 180.0, 85.0 - py * 170.0 / span


def _mk_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "layer string, geom_type int, feature_id long, geom array<array<array<array<double>>>>",
    )


def _ll(pts):
    lon, lat = _px_to_lonlat(np.asarray(pts, float)[:, 0], np.asarray(pts, float)[:, 1])
    return [[float(a), float(b)] for a, b in zip(lon, lat)]


def test_full_circle_world_to_tiles_to_world(spark):
    """clip -> encode -> decode -> unproject returns the original
    lattice-aligned world geometry exactly, for all three families."""
    line = _ll([[100, 100], [900, 900], [2000, 500]])
    ring = _ll([[4500, 4500], [6000, 4500], [6000, 6000], [4500, 6000], [4500, 4500]])
    hole = _ll([[5000, 5000], [5000, 5500], [5500, 5500], [5000, 5000]])
    pt = _ll([[300, 700]])
    df = _mk_df(
        spark,
        [
            ("l", 2, 1, [[line]]),
            ("l", 3, 2, [[ring, hole]]),
            ("l", 1, 3, [[pt]]),
        ],
    )
    tiles = tiling.encode_tiles(
        tiling.geom_features(clip_features(df, z=Z, projection="equirect"))
    )
    back = {
        r.feature_id: r
        for r in tiles_to_world_features(tiles, projection="equirect").collect()
    }
    assert back[1].geom_type == 2 and back[1].geom == [[line]]
    assert back[2].geom_type == 3
    # winding is canonicalized by the encoder; compare as point SETS per ring
    rings = back[2].geom[0]
    assert len(rings) == 2
    assert {tuple(p) for p in rings[0]} == {tuple(p) for p in ring}
    assert {tuple(p) for p in rings[1]} == {tuple(p) for p in hole}
    assert back[3].geom_type == 1 and back[3].geom == [[pt]]
    assert back[1].properties == {}


def test_metadata_comes_back_as_properties(spark):
    pts = spark.createDataFrame(
        [(11, "gold", 7.5, 1.0, 2.0)], "id long, seg string, bal double, lon double, lat double"
    )
    feats = tiling.point_features(
        pts, z=Z, layer="c", feature_id=F.col("id"),
        meta={"seg": F.col("seg"), "bal": F.col("bal")},
    )
    tiles = tiling.encode_tiles(feats)
    (row,) = tiles_to_world_features(tiles).collect()
    assert row.feature_id == 11 and row.properties == {"seg": "gold", "bal": "7.5"}


def test_tiles_to_geojson_files_reread(spark, tmp_path):
    """The GeoJSON files written from tiles read back into the same
    canonical frame (lattice-exact)."""
    line = _ll([[100, 100], [1500, 900]])
    df = _mk_df(spark, [("l", 2, 5, [[line]])])
    tiles = tiling.encode_tiles(
        tiling.geom_features(clip_features(df, z=Z, projection="equirect"))
    )
    out = str(tmp_path / "gj")
    tiles_to_geojson(tiles, out, projection="equirect")
    (row,) = read_geojson(spark, out, layer="l").collect()
    assert row.feature_id == 5 and row.geom == [[line]]


def test_webmercator_unprojection_roundtrips():
    from vectortiles_spark.operators.clip import project_webmercator
    from vectortiles_spark.operators.export import unproject_webmercator

    rng = np.random.Generator(np.random.PCG64(8))
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-84, 84, 200)
    px, py = project_webmercator(lon, lat, 5, EXT)
    lon2, lat2 = unproject_webmercator(px, py, 5, EXT)
    assert np.allclose(lon2, lon, atol=1e-9) and np.allclose(lat2, lat, atol=1e-9)
