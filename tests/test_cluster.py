"""Point clustering (operators/cluster.py): semantics, passthrough,
sink integration, and the one-exchange plan shape."""

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from vectortiles_spark.operators.cluster import (
    cluster_features,
    cluster_points,
    cluster_pyramid,
)
from vectortiles_spark.operators.tiling import encode_tiles
from vectortiles_spark.mvt import codec


def _pts(spark, rows):
    return spark.createDataFrame(
        [Row(pid=i, lon=lo, lat=la, w=w) for i, lo, la, w in rows]
    )


def test_singleton_passthrough(spark):
    # two points in different bins of the same tile: each row IS the point
    df = _pts(spark, [(1, 0.01, 0.01, 2.5), (2, 5.0, 5.0, 1.0)])
    out = cluster_points(
        df, z=2, radius_px=256, lon="lon", lat="lat", id_col="pid",
        agg={"w": "sum"}, projection="equirect",
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r.point_count == 1
        assert r.is_cluster == 0
        # centroid of one point is the point's own pixel
        assert 0 <= r.px < 4096 and 0 <= r.py < 4096
        assert r.px >> 8 == r.bin_x and r.py >> 8 == r.bin_y
    by_id = {r.rep_id: r for r in out}
    assert by_id[1].w_sum == 2.5 and by_id[2].w_sum == 1.0


def test_cluster_merge_centroid_and_aggs(spark):
    # three points within one 256px bin at z=0 (equirect, extent 4096):
    # lon step of 360/4096 deg = 1 px
    base = -180.0 + 360.0 / 4096.0 * 512.5  # inside bin_x=2
    step = 360.0 / 4096.0
    df = _pts(
        spark,
        [(7, base, 0.0, 1.0), (3, base + step, 0.0, 2.0), (9, base + 2 * step, 0.0, 4.0)],
    )
    out = cluster_points(
        df, z=0, radius_px=256, id_col="pid", agg={"w": "sum"},
        projection="equirect",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.point_count == 3
    assert r.is_cluster == 1
    assert r.rep_id == 3  # min id, deterministic representative
    assert r.w_sum == 7.0
    # integer centroid: sum(px) div 3 — px are consecutive ints
    assert r.px == (512 + 513 + 514) // 3


def test_webmercator_matches_tile_grid(spark):
    from vectortiles_spark.functions.tiles import tile_px, tile_py, tile_x, tile_y

    df = _pts(spark, [(1, 13.4, 52.5, 0.0)])
    out = cluster_points(df, z=6, radius_px=64, id_col="pid").collect()[0]
    ref = df.select(
        tile_x(F.col("lon"), 6).alias("tx"),
        tile_y(F.col("lat"), 6).alias("ty"),
        tile_px(F.col("lon"), 6).alias("px"),
        tile_py(F.col("lat"), 6).alias("py"),
    ).collect()[0]
    assert (out.tile_x, out.tile_y, out.px, out.py) == (
        ref.tx, ref.ty, ref.px, ref.py,
    )


def test_cluster_features_encode_roundtrip(spark):
    df = _pts(spark, [(1, 0.01, 0.01, 0.0), (2, 0.011, 0.01, 0.0), (3, -100.0, 10.0, 0.0)])
    cl = cluster_points(df, z=1, radius_px=1024, id_col="pid", projection="equirect")
    feats = cluster_features(cl, layer="poi")
    tiles = encode_tiles(feats, single_layer="poi", trusted=True).collect()
    assert tiles
    seen = {}
    for t in tiles:
        lay = codec.decode_tile(bytes(t.mvt))["poi"]
        for f in lay.features:
            seen[f.feature_id] = f
    # points 1+2 share a 1024px bin at z=1 -> one cluster rep'd by min id 1
    assert set(seen) == {1, 3}
    assert seen[1].metadata["point_count"] == (codec.VAL_INT, 2)
    assert seen[1].metadata["clustered"] == (codec.VAL_BOOL, True)
    assert seen[3].metadata["point_count"] == (codec.VAL_INT, 1)
    assert seen[3].metadata["clustered"] == (codec.VAL_BOOL, False)


def test_pyramid_levels(spark):
    df = _pts(spark, [(1, 0.01, 0.01, 0.0), (2, 120.0, -40.0, 0.0)])
    out = cluster_pyramid(
        df, 0, 2, radius_px=2048, id_col="pid", projection="equirect"
    )
    rows = out.collect()
    zs = sorted({r.tile_z for r in rows})
    assert zs == [0, 1, 2]
    # z=0: one world tile, two 2048px bins or one — check total counts conserve
    for z in zs:
        assert sum(r.point_count for r in rows if r.tile_z == z) == 2


def test_validation_errors(spark):
    df = _pts(spark, [(1, 0.0, 0.0, 0.0)])
    with pytest.raises(ValueError, match="power of two"):
        cluster_points(df, z=1, radius_px=100)
    with pytest.raises(ValueError, match="divide extent"):
        cluster_points(df, z=1, radius_px=8192)
    with pytest.raises(ValueError, match="unsupported agg"):
        cluster_points(df, z=1, agg={"w": "median"})
    with pytest.raises(ValueError, match="unknown projection"):
        cluster_points(df, z=1, projection="sinusoidal")


def test_plan_single_exchange(spark):
    """The scale contract: ONE hash exchange, with a partial_ hash
    aggregate below it (map-side combine), so shuffle volume is bounded
    by output cardinality."""
    df = _pts(spark, [(i, float(i % 300) / 10 - 15, 0.0, 1.0) for i in range(1, 400)])
    cl = cluster_points(df, z=3, radius_px=256, id_col="pid", agg={"w": "sum"})
    plan = cl._sc._jvm.PythonSQLUtils.explainString(
        cl._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert "partial_count" in plan, plan


# --- hexbin ---------------------------------------------------------------

from vectortiles_spark.operators.cluster import (  # noqa: E402
    _SQRT3,
    _SQRT3_2,
    _SQRT3_3,
    _TWO_3,
    hexbin_points,
)


def _hex_assign_ref(gx, gy, s):
    """Independent scalar replica of the operator's pinned IEEE chain."""
    import math

    qf = (_SQRT3_3 * gx - gy / 3.0) / s
    rf = (_TWO_3 * gy) / s
    yf = -qf - rf
    rq = math.floor(qf + 0.5)
    ry = math.floor(yf + 0.5)
    rr = math.floor(rf + 0.5)
    dq, dy, dr = abs(rq - qf), abs(ry - yf), abs(rr - rf)
    if dq > dy and dq > dr:
        return (-ry - rr, rr)
    if not (dy > dr):
        return (rq, -rq - ry)
    return (rq, rr)


def test_hexbin_matches_scalar_reference_and_counts(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (int(i), float(lo), float(la), float(w))
        for i, (lo, la, w) in enumerate(
            zip(
                rng.uniform(-179, 179, 300),
                rng.uniform(-84, 84, 300),
                rng.uniform(0, 10, 300),
            )
        )
    ]
    df = _pts(spark, rows)
    out = hexbin_points(
        df, z=3, size_px=96, id_col="pid", agg={"w": "sum"},
        projection="equirect",
    )
    got = {(r.hq, r.hr): r for r in out.collect()}
    # replicate the equirect global-pixel projection + hex chain per point
    from vectortiles_spark.functions.tiles import projected_tile_pixel

    proj = df.select(
        "pid",
        *projected_tile_pixel(F.col("lon"), F.col("lat"), 3, 4096, "equirect"),
    ).collect()
    exp = {}
    for r in proj:
        tx, ty, px, py = r[1], r[2], r[3], r[4]
        gx, gy = float(tx * 4096 + px), float(ty * 4096 + py)
        exp.setdefault(_hex_assign_ref(gx, gy, 96.0), []).append(r.pid)
    assert set(got) == set(exp)
    for k, pids in exp.items():
        assert got[k].point_count == len(pids)
        assert got[k].rep_id == min(pids)
        # hex center replay
        assert got[k].cx_px == (_SQRT3 * k[0] + _SQRT3_2 * k[1]) * 96.0
        assert got[k].cy_px == 1.5 * k[1] * 96.0


def test_hexbin_center_is_nearest(spark):
    # the assigned hex center must be the NEAREST center among the
    # point's own hex and its 6 axial neighbors (the defining property
    # of cube rounding, up to exact-tie boundaries the rng avoids)
    import numpy as np

    rng = np.random.default_rng(9)
    for _ in range(200):
        gx = float(rng.uniform(0, 32768))
        gy = float(rng.uniform(0, 32768))
        s = 96.0
        q, r = _hex_assign_ref(gx, gy, s)

        def center(qq, rr):
            return ((_SQRT3 * qq + _SQRT3_2 * rr) * s, 1.5 * rr * s)

        d0 = (center(q, r)[0] - gx) ** 2 + (center(q, r)[1] - gy) ** 2
        for dq, dr in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)):
            cx, cy = center(q + dq, r + dr)
            d = (cx - gx) ** 2 + (cy - gy) ** 2
            assert d0 <= d + 1e-6, (gx, gy, q, r, dq, dr)


def test_hexbin_spans_tile_borders(spark):
    # two points a fraction of a pixel apart across the z=1 tile seam
    # land in ONE hex row (global-pixel binning, not per-tile)
    step = 360.0 / (2 * 4096)  # one global pixel in degrees at z=1
    lon_seam = 0.0  # tile_x 0 -> 1 boundary at lon 0
    df = _pts(
        spark,
        [(1, lon_seam - step, 0.0, 1.0), (2, lon_seam + step, 0.0, 1.0)],
    )
    out = hexbin_points(df, z=1, size_px=128, id_col="pid",
                        projection="equirect").collect()
    assert len(out) == 1
    assert out[0].point_count == 2


def test_hexbin_validation(spark):
    df = _pts(spark, [(1, 0.0, 0.0, 1.0)])
    with pytest.raises(ValueError, match="size_px"):
        hexbin_points(df, z=2, size_px=0)
    with pytest.raises(ValueError, match="projection"):
        hexbin_points(df, z=2, projection="sinusoidal")
    with pytest.raises(ValueError, match="collide"):
        hexbin_points(
            df.withColumnRenamed("w", "hq"), z=2, agg={"hq": "sum"},
            projection="equirect",
        )
    with pytest.raises(ValueError, match="unsupported agg"):
        hexbin_points(df, z=2, agg={"w": "median"}, projection="equirect")
