"""GeoJSON source/sink: type mapping, write -> read roundtrip, and the
feed into the clip pipeline. Everything JVM-side (no Python per row)."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.sources.geojson import geojson_lines, read_geojson, write_geojson


def _write_lines(tmp_path, rows):
    d = tmp_path / "src"
    d.mkdir()
    with open(d / "f.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(d)


def test_read_all_geometry_types(spark, tmp_path):
    src = _write_lines(
        tmp_path,
        [
            {"type": "Feature", "id": 1, "properties": {"n": "p"},
             "geometry": {"type": "Point", "coordinates": [1.5, -2.5]}},
            {"type": "Feature", "id": 2, "properties": None,
             "geometry": {"type": "MultiPoint", "coordinates": [[0, 0], [3, 4]]}},
            {"type": "Feature", "id": 3, "properties": {"n": "l"},
             "geometry": {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0]]}},
            {"type": "Feature", "id": 4, "properties": {},
             "geometry": {"type": "MultiLineString", "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]]}},
            {"type": "Feature", "id": 5, "properties": {"n": "pg"},
             "geometry": {"type": "Polygon", "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 0]], [[1, 1], [2, 1], [2, 2], [1, 1]]]}},
            {"type": "Feature",
             "geometry": {"type": "MultiPolygon", "coordinates": [[[[0, 0], [1, 0], [1, 1], [0, 0]]], [[[5, 5], [6, 5], [6, 6], [5, 5]]]]}},
            {"type": "Feature", "id": 9, "properties": {},
             "geometry": {"type": "GeometryCollection", "coordinates": []}},
        ],
    )
    got = {r.feature_id: r for r in read_geojson(spark, src, layer="t").collect()}
    assert set(got) == {1, 2, 3, 4, 5, 0}  # collection dropped; missing id -> 0
    assert got[1].geom_type == 1 and got[1].geom == [[[[1.5, -2.5]]]]
    assert got[2].geom == [[[[0.0, 0.0]]], [[[3.0, 4.0]]]]  # parts per point
    assert got[3].geom_type == 2 and got[3].geom == [[[[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]]]]
    assert len(got[4].geom) == 2 and got[4].geom[1] == [[[2.0, 2.0], [3.0, 3.0]]]
    assert got[5].geom_type == 3 and len(got[5].geom[0]) == 2  # exterior + hole
    assert len(got[0].geom) == 2  # multipolygon: 2 parts
    assert got[1].properties == {"n": "p"} and got[2].properties == {}


def test_write_read_roundtrip_identity(spark, tmp_path):
    """write_geojson(read_geojson(x)) == x for every geometry family,
    coordinates bit-exact (shortest-roundtrip JSON doubles)."""
    rng = np.random.Generator(np.random.PCG64(3))
    rows = []
    for i in range(30):
        kind = i % 4
        if kind == 0:
            geom = [[[rng.uniform(-180, 180, 2).tolist()]]]
            gt = 1
        elif kind == 1:
            geom = [[rng.uniform(-90, 90, (5, 2)).tolist()]]
            gt = 2
        elif kind == 2:
            ring = rng.uniform(0, 50, (4, 2)).tolist()
            geom = [[ring + ring[:1]]]
            gt = 3
        else:
            geom = [[rng.uniform(0, 9, (3, 2)).tolist()], [rng.uniform(10, 19, (3, 2)).tolist()]]
            gt = 2
        rows.append(("t", gt, i, {"k": str(i)}, geom))
    df = spark.createDataFrame(
        rows,
        "layer string, geom_type int, feature_id long, properties map<string,string>, "
        "geom array<array<array<array<double>>>>",
    )
    out = str(tmp_path / "out")
    write_geojson(df, out)
    back = read_geojson(spark, out, layer="t")
    key = lambda r: (r.feature_id, r.geom_type,
                     tuple(tuple(tuple(tuple(p) for p in ring) for ring in part) for part in r.geom),
                     tuple(sorted(r.properties.items())))
    assert sorted(map(key, back.collect())) == sorted(map(key, df.collect()))


def test_geojson_feeds_clip_pipeline(spark, tmp_path):
    """read_geojson output drops straight into clip_features -> encode."""
    from vectortiles_spark.mvt import codec
    from vectortiles_spark.operators import tiling
    from vectortiles_spark.operators.clip import clip_features

    src = _write_lines(
        tmp_path,
        [
            {"type": "Feature", "id": 1, "properties": {},
             "geometry": {"type": "LineString",
                          "coordinates": [[-0.5, 0.5], [0.5, -0.5], [1.5, 0.5]]}},
        ],
    )
    feats = read_geojson(spark, src, layer="roads")
    clipped = clip_features(feats.drop("properties"), z=3)
    tiles = tiling.encode_tiles(tiling.geom_features(clipped)).collect()
    assert len(tiles) >= 2  # the line crosses the lon=0 tile boundary at z=3
    n = sum(len(l.features) for t in tiles for l in codec.decode_tile(bytes(t.mvt)).values())
    assert n == len(tiles)


def test_geojson_lines_is_pure_column_plan(spark):
    """The sink is Column algebra only — no BatchEvalPython / ArrowEval
    (python UDF) nodes in the plan."""
    df = spark.createDataFrame(
        [("t", 1, 1, {"a": "b"}, [[[[1.0, 2.0]]]])],
        "layer string, geom_type int, feature_id long, properties map<string,string>, "
        "geom array<array<array<array<double>>>>",
    )
    plan = geojson_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_read_tolerates_rfc_edge_cases(spark, tmp_path):
    """Altitude elements strip, malformed features drop (not crash),
    string ids hash stably, numeric-string ids parse."""
    src = _write_lines(
        tmp_path,
        [
            {"type": "Feature", "id": 1, "properties": {},
             "geometry": {"type": "Point", "coordinates": [10.0, 20.0, 5.0]}},
            {"type": "Feature", "id": 2, "properties": {},
             "geometry": {"type": "LineString", "coordinates": [[0, 0, 1], [1, 1, 2]]}},
            {"type": "Feature", "id": 3, "properties": {},
             "geometry": {"type": "Point"}},                      # no coordinates
            {"type": "Feature", "id": 4, "properties": {},
             "geometry": {"type": "LineString", "coordinates": [[0], [1, 1]]}},  # short position
            {"type": "Feature", "id": "way/123abc", "properties": {},
             "geometry": {"type": "Point", "coordinates": [1, 1]}},
            {"type": "Feature", "id": "42", "properties": {},
             "geometry": {"type": "Point", "coordinates": [2, 2]}},
        ],
    )
    got = {r.feature_id: r for r in read_geojson(spark, src).collect()}
    assert got[1].geom == [[[[10.0, 20.0]]]]          # altitude stripped
    assert got[2].geom == [[[[0.0, 0.0], [1.0, 1.0]]]]
    assert 3 not in got and 4 not in got              # malformed dropped
    assert got[42].geom == [[[[2.0, 2.0]]]]           # numeric string parses
    hashed = [k for k in got if k not in (1, 2, 42)]
    assert len(hashed) == 1 and hashed[0] != 0        # string id -> stable hash
    # and the surviving frame feeds clip without crashing
    from vectortiles_spark.operators.clip import clip_features
    assert clip_features(
        read_geojson(spark, src).drop("properties"), z=2
    ).count() >= 4


def test_export_respects_wire_extent(spark):
    """Tiles encoded at a non-default extent export to the same world
    coordinates as default-extent tiles (the layer's own wire extent
    drives the unprojection)."""
    from vectortiles_spark.operators import tiling
    from vectortiles_spark.operators.clip import clip_features
    from vectortiles_spark.operators.export import tiles_to_world_features

    span = (1 << 2) * 4096
    lon, lat = 512 * 360.0 / span - 180.0, 85.0 - 512 * 170.0 / span
    df = spark.createDataFrame(
        [("l", 1, 1, [[[[lon, lat]]]])],
        "layer string, geom_type int, feature_id long, geom array<array<array<array<double>>>>",
    )
    outs = []
    for ext in (4096, 512):
        clipped = clip_features(df, z=2, extent=ext, projection="equirect")
        tiles = tiling.encode_tiles(tiling.geom_features(clipped), extent=ext)
        (row,) = tiles_to_world_features(tiles, projection="equirect").collect()
        outs.append(row.geom[0][0][0])
    assert outs[0] == outs[1] == [lon, lat]
