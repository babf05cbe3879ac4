"""focal_map: 3x3 stencil with cross-tile halo exchange (SURVEY.md D40).

The ground truth is a single global NumPy computation over the assembled
mosaic with a constant pad outside it; the operator must reproduce it
bit-for-bit from the tiled relation, for every op, including tiles whose
neighbors are missing (sparse grids) and non-zero pad values.
"""

import numpy as np
import pandas as pd
import pytest

from vectortiles_spark.operators.raster import focal_map


def _global_focal(g: np.ndarray, op: str, default: int) -> np.ndarray:
    h, w = g.shape
    pad = np.full((h + 2, w + 2), default, dtype=np.int32)
    pad[1:h + 1, 1:w + 1] = g
    if op == "grad":
        gx = np.abs(pad[1:h + 1, 2:] - pad[1:h + 1, :w])
        gy = np.abs(pad[2:, 1:w + 1] - pad[:h, 1:w + 1])
        return np.minimum(gx + gy, 255).astype(np.uint8)
    red = np.maximum.reduce if op == "max" else np.minimum.reduce
    return red(
        [pad[r:r + h, c:c + w] for r in range(3) for c in range(3)]
    ).astype(np.uint8)


def _tile_df(spark, g: np.ndarray, ts: int, skip=()):
    h, w = g.shape
    rows = [
        {"tile_z": 3, "tile_x": tx, "tile_y": ty, "w": ts, "h": ts,
         "px": np.ascontiguousarray(
             g[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
         ).tobytes()}
        for ty in range(h // ts) for tx in range(w // ts)
        if (tx, ty) not in skip
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def _collect_grids(df, ts: int) -> dict:
    return {
        (r["tile_x"], r["tile_y"]): np.frombuffer(
            r["px"], dtype=np.uint8
        ).reshape(ts, ts)
        for r in df.collect()
    }


@pytest.mark.parametrize("op", ["max", "min", "grad"])
def test_focal_matches_global_computation(spark, op):
    rng = np.random.RandomState(7)
    g = rng.randint(0, 256, size=(96, 96)).astype(np.uint8)
    out = _collect_grids(focal_map(_tile_df(spark, g, 32), op=op), 32)
    exp = _global_focal(g, op, 0)
    assert len(out) == 9
    for (tx, ty), grid in out.items():
        np.testing.assert_array_equal(
            grid, exp[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32],
            err_msg=f"tile ({tx},{ty}) op={op}",
        )


@pytest.mark.parametrize("op", ["max", "grad"])
def test_sparse_grid_hole_is_padded(spark, op):
    rng = np.random.RandomState(11)
    g = rng.randint(0, 256, size=(24, 24)).astype(np.uint8)
    out = _collect_grids(
        focal_map(_tile_df(spark, g, 8, skip={(1, 1)}), op=op), 8
    )
    assert (1, 1) not in out  # absent tile emits nothing
    gg = g.astype(np.int32).copy()
    gg[8:16, 8:16] = 0  # the hole reads as pad from every neighbor
    exp = _global_focal(gg.astype(np.uint8), op, 0)
    for (tx, ty), grid in out.items():
        np.testing.assert_array_equal(
            grid, exp[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8],
            err_msg=f"tile ({tx},{ty}) op={op}",
        )


def test_nonzero_default_pad_with_min(spark):
    g = np.full((16, 16), 200, dtype=np.uint8)
    out = _collect_grids(
        focal_map(_tile_df(spark, g, 8), op="min", default=255), 8
    )
    # pad=255 never wins a min against the constant-200 mosaic
    for grid in out.values():
        assert (grid == 200).all()
    out0 = _collect_grids(focal_map(_tile_df(spark, g, 8), op="min"), 8)
    # pad=0 wins exactly on the outer border of the 2x2 mosaic
    full = np.zeros((16, 16), dtype=np.uint8) + 200
    exp = _global_focal(full, "min", 0)
    for (tx, ty), grid in out0.items():
        np.testing.assert_array_equal(
            grid, exp[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8]
        )


def test_duplicate_raster_raises(spark):
    g = np.zeros((8, 8), dtype=np.uint8)
    df = _tile_df(spark, g, 8).unionAll(_tile_df(spark, g, 8))
    with pytest.raises(Exception, match="dedupe the raster relation"):
        focal_map(df, op="max").collect()


def test_mixed_tile_sizes_raise(spark):
    rows = pd.DataFrame([
        {"tile_z": 3, "tile_x": 0, "tile_y": 0, "w": 8, "h": 8,
         "px": bytes(64)},
        {"tile_z": 3, "tile_x": 1, "tile_y": 0, "w": 4, "h": 4,
         "px": bytes(16)},
    ])
    with pytest.raises(Exception, match="does not match"):
        focal_map(spark.createDataFrame(rows), op="max").collect()


def test_corrupt_rows_drop_not_crash(spark):
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    rows = pd.DataFrame([
        {"tile_z": 3, "tile_x": 0, "tile_y": 0, "w": 8, "h": 8,
         "px": g.tobytes()},
        {"tile_z": 3, "tile_x": 1, "tile_y": 0, "w": 8, "h": 8,
         "px": bytes(3)},  # short payload: drops
        {"tile_z": 3, "tile_x": 0, "tile_y": 1, "w": -1, "h": 8,
         "px": bytes(64)},  # bad dims: drops
        {"tile_z": 3, "tile_x": 1, "tile_y": 1, "w": 8, "h": 8,
         "px": None},  # NULL: drops
    ])
    out = _collect_grids(
        focal_map(spark.createDataFrame(rows), op="grad"), 8
    )
    assert set(out) == {(0, 0)}
    np.testing.assert_array_equal(out[(0, 0)], _global_focal(g, "grad", 0))


def test_bad_args_raise(spark):
    g = _tile_df(spark, np.zeros((8, 8), dtype=np.uint8), 8)
    with pytest.raises(ValueError, match="unknown op"):
        focal_map(g, op="blur")
    with pytest.raises(ValueError, match="uint8 range"):
        focal_map(g, default=300)


def test_null_dims_drop_not_crash(spark):
    # pandas renders NULL ints as NaN — the `is None` guard alone never
    # fires on the mapInPandas path (review regression)
    rows = pd.DataFrame([
        {"tile_z": 3, "tile_x": 0, "tile_y": 0, "w": 8, "h": 8,
         "px": bytes(64)},
        {"tile_z": 3, "tile_x": 1, "tile_y": 0, "w": None, "h": 8,
         "px": bytes(64)},
    ])
    df = spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, w int, h int, px binary"
    )
    out = focal_map(df, op="max").collect()
    assert {r["tile_x"] for r in out} == {0}


# --- hillshade ------------------------------------------------------------

import math  # noqa: E402


def _global_hillshade(
    g: np.ndarray, default: int, az=315.0, alt=45.0, zf=1.0
) -> np.ndarray:
    """Single-mosaic replica of the operator's pinned formula."""
    h, w = g.shape
    pad = np.full((h + 2, w + 2), default, dtype=np.int32)
    pad[1:h + 1, 1:w + 1] = g
    _alt = math.radians(alt)
    _azm = math.radians(360.0 - az + 90.0)
    sin_alt, zf_cos_alt = math.sin(_alt), zf * math.cos(_alt)
    sin_az, cos_az = math.sin(_azm), math.cos(_azm)
    nw, n_, ne = pad[:h, :w], pad[:h, 1:w + 1], pad[:h, 2:]
    w_, e_ = pad[1:h + 1, :w], pad[1:h + 1, 2:]
    sw_, s_, se = pad[2:, :w], pad[2:, 1:w + 1], pad[2:, 2:]
    dzdx = ((ne + 2 * e_ + se) - (nw + 2 * w_ + sw_)) / 8.0
    dzdy = ((sw_ + 2 * s_ + se) - (nw + 2 * n_ + ne)) / 8.0
    num = sin_alt + zf_cos_alt * (sin_az * dzdy - cos_az * dzdx)
    den = np.sqrt(1.0 + zf * zf * (dzdx * dzdx + dzdy * dzdy))
    val = 255.0 * num / den
    return np.floor(
        np.minimum(np.maximum(val, 0.0), 255.0) + 0.5
    ).astype(np.uint8)


def test_hillshade_formula_equals_trig_form():
    # the operator's trig-free formulation == the textbook Horn/ESRI
    # atan-aspect form, to float precision, over random gradients
    rng = np.random.default_rng(2)
    dzdx = rng.uniform(-30, 30, 2000)
    dzdy = rng.uniform(-30, 30, 2000)
    for az, alt, zf in ((315.0, 45.0, 1.0), (90.0, 30.0, 2.5)):
        _alt = math.radians(alt)
        azm = math.radians(360.0 - az + 90.0)
        mine = (
            255.0
            * (math.sin(_alt) + zf * math.cos(_alt)
               * (math.sin(azm) * dzdy - math.cos(azm) * dzdx))
            / np.sqrt(1.0 + zf * zf * (dzdx * dzdx + dzdy * dzdy))
        )
        slope = np.arctan(zf * np.hypot(dzdx, dzdy))
        aspect = np.arctan2(dzdy, -dzdx)
        trig = 255.0 * (
            np.cos(math.pi / 2 - _alt) * np.cos(slope)
            + np.sin(math.pi / 2 - _alt) * np.sin(slope) * np.cos(azm - aspect)
        )
        assert np.max(np.abs(mine - trig)) < 1e-9


def test_hillshade_flat_terrain_and_halo(spark):
    # flat mosaic with default == the constant: every pixel shades to
    # round(255 * sin(altitude)) — borders included (halo sees default)
    g = np.full((32, 32), 77, dtype=np.uint8)
    out = _collect_grids(
        focal_map(_tile_df(spark, g, 16), op="hillshade", default=77), 16
    )
    expect = int(np.floor(255.0 * math.sin(math.radians(45.0)) + 0.5))
    for grid in out.values():
        assert (grid == expect).all()


def test_hillshade_matches_global_computation(spark):
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    ref = _global_hillshade(g, default=0)
    out = _collect_grids(
        focal_map(_tile_df(spark, g, 16), op="hillshade"), 16
    )
    assert len(out) == 16
    for (tx, ty), grid in out.items():
        np.testing.assert_array_equal(
            grid, ref[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
        )


def test_hillshade_params_change_lighting_and_validate(spark):
    g = np.arange(256, dtype=np.uint8).reshape(16, 16)
    df = _tile_df(spark, g, 16)
    a = _collect_grids(focal_map(df, op="hillshade"), 16)[(0, 0)]
    b = _collect_grids(
        focal_map(df, op="hillshade", azimuth_deg=135.0), 16
    )[(0, 0)]
    assert not np.array_equal(a, b)  # opposite light direction
    with pytest.raises(ValueError, match="altitude"):
        focal_map(df, op="hillshade", altitude_deg=0.0)


# --- isolines -------------------------------------------------------------

from vectortiles_spark.operators.raster import isolines  # noqa: E402


def test_isolines_vertical_ramp(spark):
    # column ramp v = 10*c, level 25: one vertical contour at x = 2.5
    g = np.tile((np.arange(8) * 10).astype(np.uint8), (8, 1))
    segs = isolines(_tile_df(spark, g, 8), level=25.0).collect()
    assert len(segs) == 7  # one per cell row
    for s in segs:
        assert (s.gx1, s.gx2) == (2.5, 2.5)
        assert s.gy2 == s.gy1 + 1.0  # T -> B order, case 6
        assert s.level == 25.0


def test_isolines_saddle_pinned(spark):
    # a=200 b=0 / d=0 c=200 at level 100 -> case 10 -> (T-L, B-R)
    g = np.array([[200, 0], [0, 200]], dtype=np.uint8)
    segs = sorted(
        ((s.gx1, s.gy1, s.gx2, s.gy2) for s in
         isolines(_tile_df(spark, g, 2), level=100.0).collect())
    )
    assert len(segs) == 2
    (x11, y11, x12, y12), (x21, y21, x22, y22) = segs
    # T-L: T = (0.5, 0), L = (0, 0.5); B-R: B = (0.5, 1), R = (1, 0.5)
    assert {(x11, y11, x12, y12), (x21, y21, x22, y22)} == {
        (0.5, 0.0, 0.0, 0.5), (0.5, 1.0, 1.0, 0.5),
    }


def test_isolines_seamless_across_tiles(spark):
    # the 4-tile halo-exchanged run must equal the single-big-tile run
    # segment-for-segment (bit-exact doubles) — THE seam contract
    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    tiled = {
        (s.gx1, s.gy1, s.gx2, s.gy2)
        for s in isolines(_tile_df(spark, g, 16), level=125.5).collect()
    }
    whole = {
        (s.gx1, s.gy1, s.gx2, s.gy2)
        for s in isolines(_tile_df(spark, g, 32), level=125.5).collect()
    }
    assert tiled == whole and len(whole) > 50


def test_isolines_sparse_hole_skips_cells(spark):
    # missing NE tile: cells needing its pixels are skipped, others equal
    rng = np.random.default_rng(8)
    g = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    full = {
        (s.gx1, s.gy1, s.gx2, s.gy2)
        for s in isolines(_tile_df(spark, g, 16), level=125.5).collect()
    }
    holey = {
        (s.gx1, s.gy1, s.gx2, s.gy2)
        for s in isolines(
            _tile_df(spark, g, 16, skip={(1, 0)}), level=125.5
        ).collect()
    }
    assert holey < full  # strictly fewer, nothing fabricated
    # every remaining segment identical to the full run
    assert holey == {s for s in full if s in holey}


def test_isolines_validation(spark):
    g = np.zeros((4, 4), dtype=np.uint8)
    df = _tile_df(spark, g, 4)
    dup = df.union(df)
    import pytest as _pytest

    with _pytest.raises(Exception, match="dedupe"):
        isolines(dup, level=10.0).collect()
