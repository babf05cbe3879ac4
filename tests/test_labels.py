"""Label points (polygon centroids) + per-group convex hulls."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.mvt.geometry import (
    GEOM_POINT,
    GEOM_POLYGON,
    geom_from_stream,
    geom_to_stream,
)
from vectortiles_spark.operators.labels import (
    _feature_centroid,
    _monotone_chain,
    convex_hull,
    label_points,
)


def _ring(pts):
    return np.asarray(pts + pts[:1], dtype=np.int64)


def _rect(x0, y0, x1, y1):
    """Exterior orientation (surveyor > 0, top-left origin)."""
    return _ring([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


def _hole(x0, y0, x1, y1):
    """Interior orientation (mirror traversal, surveyor < 0)."""
    return _ring([(x0, y0), (x0, y1), (x1, y1), (x1, y0)])


def ref_centroid(polys):
    """Independent scalar reference: textbook signed-area centroid."""
    sx = sy = sa = 0
    for poly in polys:
        for ring in poly:
            r = [(int(x), int(y)) for x, y in np.asarray(ring).reshape(-1, 2)]
            for (xa, ya), (xb, yb) in zip(r[:-1], r[1:]):
                c = xa * yb - xb * ya
                sa += c
                sx += (xa + xb) * c
                sy += (ya + yb) * c
    if sa == 0:
        return None
    return sx / (3.0 * sa), sy / (3.0 * sa), sa


def feats_df(spark, rows):
    """rows: (feature_id, polys). Build canonical feature rows."""
    data = [
        (3, 1, 2, "zones", GEOM_POLYGON, fid,
         [int(v) for v in geom_to_stream(GEOM_POLYGON, polys)])
        for fid, polys in rows
    ]
    return spark.createDataFrame(
        data,
        "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
        "feature_id bigint, geom_cmds array<bigint>",
    )


def test_rect_centroid_is_center(spark):
    out = label_points(feats_df(spark, [(1, [[_rect(10, 20, 110, 80)]])]))
    row = out.collect()[0]
    assert (row.px, row.py) == (60, 50)
    assert row.area2 == 2 * 100 * 60
    assert row.geom_type == GEOM_POINT
    assert row.layer == "zones_labels"
    # stream is the canonical single-point command stream
    pt = geom_from_stream(GEOM_POINT, np.asarray(row.geom_cmds, np.uint32))
    assert pt.tolist() == [[60, 50]]


def test_hole_shifts_centroid(spark):
    # rect [0,100]x[0,100] minus hole [60,90]x[10,90]: mass removed right
    # of center pulls the centroid LEFT of 50.
    polys = [[_rect(0, 0, 100, 100), _hole(60, 10, 90, 90)]]
    out = label_points(feats_df(spark, [(1, polys)])).collect()[0]
    exp = ref_centroid(polys)
    assert out.px == int(np.floor(exp[0] + 0.5))
    assert out.py == int(np.floor(exp[1] + 0.5))
    assert out.area2 == exp[2] == 2 * (100 * 100) - 2 * (30 * 80)
    assert out.px < 50


def test_triangle_and_multipart_match_reference(spark):
    tri = [[_ring([(0, 0), (90, 0), (0, 60)])]]
    multi = [[_rect(0, 0, 10, 10)], [_rect(100, 100, 120, 140)]]
    rows = [(1, tri), (2, multi)]
    got = {r.feature_id: r for r in label_points(feats_df(spark, rows)).collect()}
    for fid, polys in rows:
        cx, cy, sa = ref_centroid(polys)
        assert got[fid].px == int(np.floor(cx + 0.5))
        assert got[fid].py == int(np.floor(cy + 0.5))
        assert got[fid].area2 == sa


def test_randomized_against_reference(spark):
    rng = np.random.default_rng(7)
    rows = []
    for fid in range(30):
        x0, y0 = rng.integers(0, 2000, 2)
        w, h = rng.integers(5, 900, 2)
        polys = [[_rect(x0, y0, x0 + w, y0 + h)]]
        if fid % 3 == 0 and w > 20 and h > 20:
            polys[0].append(
                _hole(x0 + 5, y0 + 5, x0 + int(w) // 2, y0 + int(h) // 2)
            )
        rows.append((fid, polys))
    got = {
        r.feature_id: r
        for r in label_points(feats_df(spark, rows).repartition(5)).collect()
    }
    assert len(got) == 30
    for fid, polys in rows:
        cx, cy, sa = ref_centroid(polys)
        assert got[fid].px == int(np.floor(cx + 0.5)), fid
        assert got[fid].py == int(np.floor(cy + 0.5)), fid
        assert got[fid].area2 == sa


def test_zero_area_dropped_and_nonpolygon_raises(spark):
    # a ring traced out and straight back has zero area -> dropped
    flat = [[_ring([(0, 0), (50, 0), (25, 0)])]]
    out = label_points(
        feats_df(spark, [(1, flat), (2, [[_rect(0, 0, 10, 10)]])])
    )
    assert [r.feature_id for r in out.collect()] == [2]
    bad = feats_df(spark, [(1, [[_rect(0, 0, 10, 10)]])]).withColumn(
        "geom_type", F.lit(2)
    )
    with pytest.raises(Exception, match="non-polygon"):
        label_points(bad).collect()


def test_centroid_guards():
    with pytest.raises(ValueError, match="2\\^14"):
        _feature_centroid([[_rect(0, 0, 1 << 14, 5)]])


def _brute_hull_check(P, H):
    """Every hull vertex is extreme; every input point is inside-or-on
    the hull polygon; consecutive hull turns are strictly CCW."""
    Hs = {tuple(p) for p in H}
    n = len(H)
    if n >= 3:
        for i in range(n):
            o, a, b = H[i], H[(i + 1) % n], H[(i + 2) % n]
            cr = int(a[0] - o[0]) * int(b[1] - o[1]) - int(a[1] - o[1]) * int(
                b[0] - o[0]
            )
            assert cr > 0, "hull walk must turn strictly CCW"
    for p in P:
        if tuple(p) in Hs:
            continue
        if n < 3:
            # collinear input: p must lie on the segment
            (x0, y0), (x1, y1) = H[0], H[-1]
            assert (p[0] - x0) * (y1 - y0) == (p[1] - y0) * (x1 - x0)
            continue
        inside = all(
            int(H[(i + 1) % n][0] - H[i][0]) * int(p[1] - H[i][1])
            - int(H[(i + 1) % n][1] - H[i][1]) * int(p[0] - H[i][0])
            >= 0
            for i in range(n)
        )
        assert inside, f"{p} outside claimed hull"


def test_monotone_chain_randomized():
    rng = np.random.default_rng(11)
    for trial in range(25):
        P = rng.integers(-500, 500, (rng.integers(1, 60), 2)).astype(np.int64)
        P = np.unique(P, axis=0)
        H = _monotone_chain(P)
        _brute_hull_check(P, H)
        # lexicographic-min start
        assert tuple(H[0]) == tuple(P[np.lexsort((P[:, 1], P[:, 0]))][0])


def test_convex_hull_spark_matches_kernel_and_partitioning(spark):
    rng = np.random.default_rng(3)
    rows = []
    for g in range(4):
        for _ in range(40):
            rows.append((g, int(rng.integers(0, 300)), int(rng.integers(0, 300))))
    rows.append((9, 5, 5))  # singleton group
    df = spark.createDataFrame(rows, "g int, px bigint, py bigint")
    out = convex_hull(df, ["g"], "px", "py")
    got = sorted(
        (r.g, r.hull_idx, r.px, r.py) for r in out.collect()
    )
    got7 = sorted(
        (r.g, r.hull_idx, r.px, r.py)
        for r in convex_hull(df.repartition(7), ["g"], "px", "py").collect()
    )
    assert got == got7
    by_g = {}
    for g, i, x, y in got:
        by_g.setdefault(g, []).append((i, x, y))
    assert [p[1:] for p in sorted(by_g[9])] == [(5, 5)]
    for g in range(4):
        P = np.asarray(
            [(x, y) for (gg, x, y) in rows if gg == g], dtype=np.int64
        )
        H = _monotone_chain(np.unique(P, axis=0))
        assert [p[1:] for p in sorted(by_g[g])] == [tuple(p) for p in H]


# --- line label anchors ---------------------------------------------------

from vectortiles_spark.mvt.geometry import GEOM_LINESTRING  # noqa: E402
from vectortiles_spark.operators.labels import line_label_anchors  # noqa: E402


def lines_df(spark, rows):
    """rows: (feature_id, parts) with parts = list of [[x,y],...]."""
    import numpy as np

    data = [
        (3, 1, 2, "roads", GEOM_LINESTRING, fid,
         [int(v) for v in geom_to_stream(
             GEOM_LINESTRING,
             [np.asarray(p, dtype=np.int64) for p in parts],
         )])
        for fid, parts in rows
    ]
    return spark.createDataFrame(
        data,
        "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
        "feature_id bigint, geom_cmds array<bigint>",
    )


def ref_anchor(parts):
    """Independent scalar replica: longest part (first wins ties), first
    vertex at-or-past half its sequential arc length."""
    import math

    best = None
    for pi, pts in enumerate(parts):
        cum, acc = [], 0.0
        for (xa, ya), (xb, yb) in zip(pts[:-1], pts[1:]):
            acc = acc + math.sqrt(
                float(xb - xa) * float(xb - xa)
                + float(yb - ya) * float(yb - ya)
            )
            cum.append(acc)
        tot = cum[-1] if cum else 0.0
        if best is None or tot > best[0]:
            best = (tot, pi, cum, pts)
    if best is None or best[0] == 0.0:
        return None
    tot, pi, cum, pts = best
    half = tot / 2.0
    for j, c in enumerate(cum):
        if c >= half:
            return pts[j + 1], pi, tot
    return pts[-1], pi, tot


def test_line_anchor_staircase_and_midpoint(spark):
    # 2-segment L: lengths 100 then 60; half=80 -> first vertex past 80
    # along the walk is the corner+60 end? cum=[100,160], half=80 ->
    # j=0 -> vertex 1 (the corner)
    rows = [(1, [[[0, 0], [100, 0], [100, 60]]])]
    out = line_label_anchors(lines_df(spark, rows)).collect()[0]
    assert (out.px, out.py) == (100, 0)
    assert out.part_idx == 0 and out.len_px == 160.0
    assert out.geom_type == GEOM_POINT and out.layer == "roads_labels"
    pt = geom_from_stream(GEOM_POINT, np.asarray(out.geom_cmds, np.uint32))
    assert pt.tolist() == [[100, 0]]


def test_line_anchor_longest_part_and_randomized(spark):
    rng = np.random.default_rng(13)
    rows = []
    for fid in range(25):
        nparts = 1 + fid % 3
        parts = []
        for _ in range(nparts):
            n = int(rng.integers(2, 8))
            pts = rng.integers(0, 4000, (n, 2)).astype(int).tolist()
            # drop consecutive duplicates (zero-length segments legal but
            # keep the construction clean)
            parts.append(pts)
        rows.append((fid, parts))
    got = {
        r.feature_id: r
        for r in line_label_anchors(
            lines_df(spark, rows).repartition(4)
        ).collect()
    }
    for fid, parts in rows:
        exp = ref_anchor(parts)
        if exp is None:
            assert fid not in got
            continue
        (ex, ey), epi, etot = exp
        r = got[fid]
        assert (r.px, r.py) == (ex, ey), fid
        assert r.part_idx == epi
        assert r.len_px == etot


def test_line_anchor_zero_length_drop_and_nonline_raise(spark):
    rows = [(1, [[[5, 5], [5, 5]]]), (2, [[[0, 0], [10, 0]]])]
    out = line_label_anchors(lines_df(spark, rows)).collect()
    assert [r.feature_id for r in out] == [2]
    bad = lines_df(spark, [(1, [[[0, 0], [10, 0]]])]).withColumn(
        "geom_type", F.lit(1)
    )
    with pytest.raises(Exception, match="non-linestring"):
        line_label_anchors(bad).collect()


# --- point buffers --------------------------------------------------------

from vectortiles_spark.operators.labels import buffer_cos_sin, point_buffers  # noqa: E402


def test_point_buffers_roundtrip_and_winding(spark):
    import numpy as np

    from vectortiles_spark.mvt.geometry import surveyor
    from vectortiles_spark.operators.tiling import decode_tiles, encode_tiles

    pts = spark.createDataFrame(
        [(3, 1, 2, 7, 1000, 2000), (3, 1, 2, 8, 300, 300)],
        "tile_z int, tile_x int, tile_y int, feature_id bigint, px int, py int",
    )
    feats = point_buffers(pts, radius_px=50, n_vertices=12)
    back = decode_tiles(encode_tiles(feats)).collect()
    assert len(back) == 2
    table = buffer_cos_sin(12)
    by_id = {r.feature_id: r for r in back}
    for fid, cx, cy in ((7, 1000, 2000), (8, 300, 300)):
        polys = geom_from_stream(
            GEOM_POLYGON, np.asarray(by_id[fid].geom_cmds, np.uint32)
        )
        assert len(polys) == 1 and len(polys[0]) == 1
        ring = polys[0][0]
        assert len(ring) == 13  # 12 + closing point
        exp = [
            (cx + int(np.floor(50.0 * c + 0.5)),
             cy + int(np.floor(50.0 * s + 0.5)))
            for c, s in table
        ]
        assert [tuple(p) for p in ring[:-1]] == exp
        assert surveyor(ring) > 0  # exterior winding


def test_point_buffers_validation(spark):
    pts = spark.createDataFrame(
        [(3, 1, 2, 7, 10, 10)],
        "tile_z int, tile_x int, tile_y int, feature_id bigint, px int, py int",
    )
    with pytest.raises(ValueError, match="radius"):
        point_buffers(pts, radius_px=1)
    with pytest.raises(ValueError, match="n_vertices"):
        point_buffers(pts, radius_px=8, n_vertices=2)


def test_convex_hull_group_col_collision_raises(spark):
    df = spark.createDataFrame(
        [(1, 2, 3)], "px bigint, py bigint, g int"
    )
    with pytest.raises(ValueError, match="collide"):
        convex_hull(df, ["px"], "px", "py")
