"""Tilestats grains: attribute typing/ranges and layer rollups."""

import numpy as np

from vectortiles_spark.mvt import codec
from vectortiles_spark.operators.tilestats import (
    attribute_stats,
    layer_stats,
    tilestats,
)


def _tile_df(spark):
    lay = codec.Layer("things")
    lay.features.append(
        codec.Feature(1, {"name": (1, "alpha"), "size": (3, 2.5)}, 1,
                      np.array([[10, 10]], np.int64))
    )
    lay.features.append(
        codec.Feature(2, {"name": (1, "beta"), "size": (4, 7)}, 2,
                      [np.array([[0, 0], [50, 50]], np.int64)])
    )
    lay.features.append(
        codec.Feature(
            3, {"name": (1, "alpha"), "flag": (7, True)}, 3,
            [[np.array([[0, 0], [30, 0], [30, 30], [0, 30], [0, 0]], np.int64)]],
        )
    )
    other = codec.Layer("empty_meta")
    other.features.append(codec.Feature(9, {}, 1, np.array([[5, 5]], np.int64)))
    rows = [
        (3, 1, 2, bytearray(codec.encode_tile([lay]))),
        (3, 1, 3, bytearray(codec.encode_tile([other]))),
    ]
    return spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, mvt binary"
    )


def test_attribute_and_layer_grains(spark):
    from vectortiles_spark.operators.tiling import decode_tiles

    feats = decode_tiles(_tile_df(spark))
    att = {
        (r.layer, r.attribute): r for r in attribute_stats(feats).collect()
    }
    # name: pure string, 2 distinct over 3 rows
    nm = att[("things", "name")]
    assert (nm.att_type, nm.n_rows, nm.n_distinct) == ("string", 3, 2)
    assert (nm.min_str, nm.max_str) == ("alpha", "beta")
    assert nm.min_num is None
    # size: DOUBLE in one feature, INT in another -> same class 'number'
    sz = att[("things", "size")]
    assert (sz.att_type, sz.n_rows, sz.n_distinct) == ("number", 2, 2)
    assert (sz.min_num, sz.max_num) == (2.5, 7.0)
    # flag: boolean
    fl = att[("things", "flag")]
    assert (fl.att_type, fl.n_rows, fl.n_distinct) == ("boolean", 1, 1)
    # a layer with no metadata contributes no attribute rows
    assert not [k for k in att if k[0] == "empty_meta"]

    lays = {r.layer: r for r in layer_stats(feats).collect()}
    th = lays["things"]
    assert (th.n_features, th.n_points, th.n_lines, th.n_polys, th.n_tiles) == (
        3, 1, 1, 1, 1,
    )
    em = lays["empty_meta"]
    assert (em.n_features, em.n_points, em.n_tiles) == (1, 1, 1)


def test_mixed_type_attribute(spark):
    lay = codec.Layer("m")
    lay.features.append(
        codec.Feature(1, {"v": (1, "s")}, 1, np.array([[1, 1]], np.int64))
    )
    lay.features.append(
        codec.Feature(2, {"v": (4, 3)}, 1, np.array([[2, 2]], np.int64))
    )
    df = spark.createDataFrame(
        [(0, 0, 0, bytearray(codec.encode_tile([lay])))],
        "tile_z int, tile_x int, tile_y int, mvt binary",
    )
    (row,) = tilestats(df).collect()
    assert row.att_type == "mixed"
    assert row.n_distinct == 2
    assert row.n_features == 1 + 1
