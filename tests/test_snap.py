"""snap_join: nearest-segment snap (map-matching primitive, SURVEY.md D41).

Ground truth is a NumPy brute force over all (point, segment) pairs with
the identical projection-clamp arithmetic; the grid-pruned operator must
reproduce its matches and winners exactly.
"""

import numpy as np
import pandas as pd
import pytest

from vectortiles_spark.operators.spatial_join import snap_join


def _brute(pts: np.ndarray, segs: np.ndarray, radius: float) -> dict:
    """{point_id: (seg_id, t, sx, sy, d2)} by argmin (d2, seg_id)."""
    out = {}
    for pid, px, py in pts:
        best = None
        for sid, ax, ay, bx, by in segs:
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            t = 0.0 if len2 == 0 else min(
                1.0, max(0.0, ((px - ax) * dx + (py - ay) * dy) / len2)
            )
            sx, sy = ax + t * dx, ay + t * dy
            d2 = (px - sx) * (px - sx) + (py - sy) * (py - sy)
            if d2 <= radius * radius:
                k = (d2, sid)
                if best is None or k < (best[4], best[0]):
                    best = (sid, t, sx, sy, d2)
        if best is not None:
            out[pid] = best
    return out


def _dfs(spark, pts, segs):
    p = spark.createDataFrame(
        pd.DataFrame(pts, columns=["point_id", "x", "y"]).astype(
            {"point_id": "int64"}
        )
    )
    s = spark.createDataFrame(
        pd.DataFrame(segs, columns=["seg_id", "ax", "ay", "bx", "by"]).astype(
            {"seg_id": "int64"}
        )
    )
    return p, s


def test_snap_matches_brute_force(spark):
    rng = np.random.RandomState(3)
    pts = np.column_stack([
        np.arange(200), rng.uniform(-500, 500, 200), rng.uniform(-500, 500, 200)
    ])
    segs = np.column_stack([
        np.arange(60),
        rng.uniform(-500, 500, 60), rng.uniform(-500, 500, 60),
        rng.uniform(-500, 500, 60), rng.uniform(-500, 500, 60),
    ])
    p, s = _dfs(spark, pts, segs)
    got = {
        r["point_id"]: (r["seg_id"], r["t"], r["snap_x"], r["snap_y"],
                        r["dist2"])
        for r in snap_join(p, s, radius=80.0).collect()
    }
    exp = _brute(pts, segs, 80.0)
    assert set(got) == set(exp)
    for pid, (sid, t, sx, sy, d2) in exp.items():
        gsid, gt, gsx, gsy, gd2 = got[pid]
        assert gsid == sid, pid
        assert (gt, gsx, gsy, gd2) == (t, sx, sy, d2), pid


def test_degenerate_segment_snaps_t0(spark):
    p, s = _dfs(spark, [(1, 3.0, 4.0)], [(7, 0.0, 0.0, 0.0, 0.0)])
    row = snap_join(p, s, radius=10.0).collect()[0]
    assert (row["seg_id"], row["t"]) == (7, 0.0)
    assert row["dist2"] == 25.0 and row["dist"] == 5.0


def test_out_of_range_point_drops(spark):
    p, s = _dfs(spark, [(1, 100.0, 100.0)], [(7, 0.0, 0.0, 1.0, 0.0)])
    assert snap_join(p, s, radius=10.0).count() == 0


def test_equidistant_tie_breaks_on_seg_id(spark):
    # both segments are distance 5 from the origin point
    p, s = _dfs(
        spark, [(1, 0.0, 0.0)],
        [(9, 5.0, -1.0, 5.0, 1.0), (4, -1.0, 5.0, 1.0, 5.0)],
    )
    row = snap_join(p, s, radius=6.0).collect()[0]
    assert row["seg_id"] == 4 and row["dist"] == 5.0


def test_long_segment_guard_raises(spark):
    p, s = _dfs(spark, [(1, 0.0, 0.0)], [(7, 0.0, 0.0, 1e7, 0.0)])
    with pytest.raises(Exception, match="covers more than"):
        snap_join(p, s, radius=1.0, max_cells_per_segment=100).collect()


def test_snap_plan_shape(spark):
    from vectortiles_spark.plans import audit

    p, s = _dfs(spark, [(1, 0.0, 0.0)], [(7, 0.0, 0.0, 1.0, 0.0)])
    out = snap_join(p, s, radius=10.0)
    audit.assert_no_cartesian(out)
    assert audit.count_shuffles(out) <= 3  # join (x2) + argmin agg
