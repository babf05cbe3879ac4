"""MBTiles source/sink: spec conformance (TMS row flip, gzip tile_data,
metadata table, unique index), write-read roundtrip through Spark, and
empty/missing-file behavior."""

import gzip
import os
import sqlite3

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.mvt import codec
from vectortiles_spark.operators import tiling
from vectortiles_spark.sources.mbtiles import read_mbtiles, read_metadata, write_mbtiles
from vectortiles_spark.sources.synth import images_df


@pytest.fixture(scope="module")
def tileset(spark, tmp_path_factory):
    imgs = images_df(spark, 3000, seed=7)
    feats = tiling.point_features(
        imgs, z=5, layer="images", feature_id=F.xxhash64("image_id"),
        meta={"caption": F.col("caption")},
    )
    tiles = tiling.encode_tiles(feats).cache()
    path = str(tmp_path_factory.mktemp("mb") / "test.mbtiles")
    write_mbtiles(tiles, path, metadata={"name": "t", "minzoom": 5, "maxzoom": 5})
    return tiles, path


def test_roundtrip_bytes_exact(spark, tileset):
    tiles, path = tileset
    want = {(r.tile_z, r.tile_x, r.tile_y): bytes(r.mvt) for r in tiles.collect()}
    got = {
        (r.tile_z, r.tile_x, r.tile_y): bytes(r.mvt)
        for r in read_mbtiles(spark, path).collect()
    }
    assert got == want


def test_spec_conformance(tileset):
    tiles, path = tileset
    con = sqlite3.connect(path)
    # TMS flip: stored row = 2^z - 1 - xyz_y
    rows = con.execute("SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles").fetchall()
    want = {(r.tile_z, r.tile_x, r.tile_y): bytes(r.mvt) for r in tiles.collect()}
    for zl, tc, tr, td in rows:
        y = (1 << zl) - 1 - tr
        assert (zl, tc, y) in want
        # spec: pbf tile_data SHOULD be gzipped
        assert td[:2] == b"\x1f\x8b"
        assert gzip.decompress(td) == want[(zl, tc, y)]
    # unique index exists (required by most consumers)
    idx = con.execute("PRAGMA index_list(tiles)").fetchall()
    assert any(i[2] == 1 for i in idx), idx  # unique
    meta = read_metadata(path)
    assert meta["format"] == "pbf" and meta["minzoom"] == "5"
    con.close()


def test_blobs_decode(spark, tileset):
    tiles, path = tileset
    back = read_mbtiles(spark, path).collect()
    n = 0
    for r in back:
        t = codec.decode_tile(bytes(r.mvt))
        n += sum(len(l.features) for l in t.values())
    assert n == int(tiles.agg(F.sum("n_features")).collect()[0][0])


def test_zoom_filter_and_splits(spark, tileset):
    tiles, path = tileset
    n = read_mbtiles(spark, path, z=5, n_splits=7).count()
    assert n == tiles.count()
    assert read_mbtiles(spark, path, z=9).count() == 0


def test_missing_and_empty(spark, tmp_path):
    assert read_mbtiles(spark, str(tmp_path / "nope.mbtiles")).count() == 0
    empty = spark.createDataFrame([], "tile_z int, tile_x int, tile_y int, mvt binary")
    p = str(tmp_path / "empty.mbtiles")
    write_mbtiles(empty, p)
    assert read_mbtiles(spark, p).count() == 0
    assert read_metadata(p)["format"] == "pbf"


def test_uncompressed_write_reads_back(spark, tileset, tmp_path):
    tiles, _ = tileset
    p = str(tmp_path / "plain.mbtiles")
    write_mbtiles(tiles, p, compress=False)
    want = {(r.tile_z, r.tile_x, r.tile_y): bytes(r.mvt) for r in tiles.collect()}
    got = {
        (r.tile_z, r.tile_x, r.tile_y): bytes(r.mvt)
        for r in read_mbtiles(spark, p).collect()
    }
    assert got == want
