"""resample_rasters: integer-exact grid resampling (SURVEY.md D42)."""

import numpy as np
import pandas as pd
import pytest

from vectortiles_spark.operators.raster import composite_rasters, resample_rasters


def _df(spark, grids, w=None, h=None):
    rows = []
    for i, g in enumerate(grids):
        rows.append({
            "tile_z": 3, "tile_x": i, "tile_y": 0,
            "w": w if w is not None else g.shape[1],
            "h": h if h is not None else g.shape[0],
            "px": g.tobytes() if g is not None else None,
        })
    return spark.createDataFrame(pd.DataFrame(rows))


def _out(df):
    return {
        (r["tile_x"], r["tile_y"]): (
            r["w"], r["h"],
            np.frombuffer(r["px"], dtype=np.uint8).reshape(r["h"], r["w"]),
        )
        for r in df.collect()
    }


def test_box_downsample_is_exact_integer_mean(spark):
    rng = np.random.RandomState(5)
    g = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    out = _out(resample_rasters(_df(spark, [g]), 4, 4))
    _, _, got = out[(0, 0)]
    exp = g.astype(np.int64).reshape(4, 4, 4, 4).transpose(0, 2, 1, 3)
    exp = exp.reshape(4, 4, 16).sum(axis=2) // 16
    np.testing.assert_array_equal(got, exp)


def test_one_combined_floor_not_floor_of_floors(spark):
    # per-axis floor-of-means would give a different answer on this block
    g = np.array([[1, 1], [1, 2]], dtype=np.uint8)
    out = _out(resample_rasters(_df(spark, [g]), 1, 1))
    assert out[(0, 0)][2][0, 0] == 5 // 4  # exact combined mean floor


def test_nearest_upsample_repeats_pixels(spark):
    g = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    out = _out(resample_rasters(_df(spark, [g]), 4, 4))
    _, _, got = out[(0, 0)]
    np.testing.assert_array_equal(got, np.repeat(np.repeat(g, 2, 0), 2, 1))


def test_mixed_axes_up_then_down(spark):
    rng = np.random.RandomState(9)
    g = rng.randint(0, 256, (8, 2)).astype(np.uint8)
    out = _out(resample_rasters(_df(spark, [g]), 4, 4))  # x: 2->4 up, y: 8->4 down
    _, _, got = out[(0, 0)]
    up = np.repeat(g.astype(np.int64), 2, axis=1)
    exp = up.reshape(4, 2, 4, 1).sum(axis=(1, 3)) // 2
    np.testing.assert_array_equal(got, exp)


def test_identity_roundtrip_with_composite(spark):
    # up 8->16 then down 16->8 is the identity (repeat then exact mean)
    rng = np.random.RandomState(2)
    g = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    up = resample_rasters(_df(spark, [g]), 16, 16)
    down = resample_rasters(up, 8, 8)
    np.testing.assert_array_equal(_out(down)[(0, 0)][2], g)
    # and the result now composites with a same-grid snapshot without raising
    both = down.unionAll(_df(spark, [g]))
    assert composite_rasters(both, method="max").count() == 1


def test_non_integer_ratio_raises(spark):
    g = np.zeros((6, 6), dtype=np.uint8)
    with pytest.raises(Exception, match="not an integer"):
        resample_rasters(_df(spark, [g]), 4, 4).collect()


def test_corrupt_rows_drop(spark):
    g = np.zeros((4, 4), dtype=np.uint8)
    df = _df(spark, [g, None], w=4, h=4)
    assert resample_rasters(df, 2, 2).count() == 1


def test_zero_shuffle_plan(spark):
    from vectortiles_spark.plans import audit

    g = np.zeros((4, 4), dtype=np.uint8)
    assert audit.count_shuffles(resample_rasters(_df(spark, [g]), 2, 2)) == 0


def test_null_dims_drop_not_crash(spark):
    rows = pd.DataFrame([
        {"tile_z": 3, "tile_x": 0, "tile_y": 0, "w": 4, "h": 4,
         "px": bytes(16)},
        {"tile_z": 3, "tile_x": 1, "tile_y": 0, "w": 4, "h": None,
         "px": bytes(16)},
    ])
    df = spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, w int, h int, px binary"
    )
    assert resample_rasters(df, 2, 2).count() == 1


def test_null_dims_drop_in_composite(spark):
    rows = pd.DataFrame([
        {"tile_z": 3, "tile_x": 0, "tile_y": 0, "w": 4, "h": 4,
         "px": bytes(16)},
        {"tile_z": 3, "tile_x": 0, "tile_y": 0, "w": None, "h": 4,
         "px": bytes(16)},
    ])
    df = spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, w int, h int, px binary"
    )
    assert composite_rasters(df, method="max").count() == 1
