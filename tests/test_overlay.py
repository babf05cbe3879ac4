"""overlay_areas: tabulate intersection over tile grids (SURVEY.md D44)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.operators import tiling
from vectortiles_spark.operators.raster import overlay_areas


def _rect_feats(spark, rows):
    """rows: (feature_id, tile_x, x0, y0, x1, y1) extent-coord rects."""
    pdf = pd.DataFrame(
        rows, columns=["feature_id", "tile_x", "x0", "y0", "x1", "y1"]
    )
    df = spark.createDataFrame(pdf)
    c = lambda n: F.col(n).cast("double")
    ring = F.array(
        F.array(c("x0"), c("y0")), F.array(c("x1"), c("y0")),
        F.array(c("x1"), c("y1")), F.array(c("x0"), c("y1")),
        F.array(c("x0"), c("y0")),
    )
    return tiling.geom_features(df.select(
        F.lit(3).alias("tile_z"),
        F.col("tile_x").cast("int"),
        F.lit(0).cast("int").alias("tile_y"),
        F.lit("r").alias("layer"),
        F.lit(3).alias("geom_type"),
        F.col("feature_id").cast("bigint"),
        F.array(F.array(ring)).alias("geom"),
    ))


def _pix_overlap(a, b, w=64, extent=4096):
    """exact pixel-center count of rect intersection per axis pair."""
    step = extent // w
    cnt = 1
    for lo_a, hi_a, lo_b, hi_b in (
        (a[0], a[2], b[0], b[2]), (a[1], a[3], b[1], b[3])
    ):
        lo, hi = max(lo_a, lo_b), min(hi_a, hi_b)
        n = sum(1 for c in range(w) if lo <= step * c + step // 2 < hi)
        cnt *= n
    return cnt


def test_rect_overlap_counts_exact(spark):
    a_rows = [(1, 0, 0, 0, 2048, 2048), (2, 0, 1024, 1024, 3072, 3072)]
    b_rows = [(10, 0, 1024, 0, 4096, 4096), (11, 0, 0, 0, 512, 512)]
    out = {
        (r["feature_a"], r["feature_b"]): r["n_px"]
        for r in overlay_areas(
            _rect_feats(spark, a_rows), _rect_feats(spark, b_rows)
        ).collect()
    }
    for fa, _, *ra in a_rows:
        for fb, _, *rb in b_rows:
            exp = _pix_overlap(ra, rb)
            assert out.get((fa, fb), 0) == exp, (fa, fb)


def test_disjoint_tiles_never_pair(spark):
    a = _rect_feats(spark, [(1, 0, 0, 0, 4096, 4096)])
    b = _rect_feats(spark, [(2, 1, 0, 0, 4096, 4096)])
    assert overlay_areas(a, b).count() == 0


def test_pair_guard_raises(spark):
    rows_a = [(i, 0, 0, 0, 4096, 4096) for i in range(20)]
    rows_b = [(i, 0, 0, 0, 4096, 4096) for i in range(20)]
    with pytest.raises(Exception, match="max_pairs_per_tile"):
        overlay_areas(
            _rect_feats(spark, rows_a), _rect_feats(spark, rows_b),
            max_pairs_per_tile=100,
        ).collect()


def test_non_polygon_raises(spark):
    a = _rect_feats(spark, [(1, 0, 0, 0, 64, 64)])
    b = _rect_feats(spark, [(2, 0, 0, 0, 64, 64)]).withColumn(
        "geom_type", F.lit(1)
    )
    with pytest.raises(Exception, match="filter to polygons"):
        overlay_areas(a, b).collect()


def test_bad_grid_raises(spark):
    a = _rect_feats(spark, [(1, 0, 0, 0, 64, 64)])
    with pytest.raises(ValueError, match="must divide extent"):
        overlay_areas(a, a, w=60, h=64)


def test_one_cogroup_shuffle_per_side(spark):
    from vectortiles_spark.plans import audit

    a = _rect_feats(spark, [(1, 0, 0, 0, 64, 64)])
    b = _rect_feats(spark, [(2, 0, 0, 0, 64, 64)])
    out = overlay_areas(a, b)
    audit.assert_no_cartesian(out)
    assert audit.count_shuffles(out) <= 2
