"""quality_stats: integer-exact image quality features (SURVEY.md D43)."""

import numpy as np
import pandas as pd

from vectortiles_spark.images import codec as ic
from vectortiles_spark.operators.images import quality_stats


def _expected(img: np.ndarray) -> dict:
    g = img.astype(np.int64).sum(axis=2) // 3
    h, w = g.shape
    lap = (
        4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
        - g[1:-1, :-2] - g[1:-1, 2:]
    ) if min(h, w) >= 3 else np.zeros((0, 0), np.int64)
    return {
        "n_px": h * w,
        "gray_sum": int(g.sum()),
        "lap_sum": int(np.abs(lap).sum()),
        "contrast": int(g.max() - g.min()),
        "n_dark": int((g < 32).sum()),
        "n_bright": int((g > 223).sum()),
    }


def _df(spark, imgs, extra=()):
    rows = [
        {"image_id": f"i{k}", "bytes": ic.encode_ppm(im), "fmt": "ppm"}
        for k, im in enumerate(imgs)
    ] + list(extra)
    return spark.createDataFrame(pd.DataFrame(rows))


def test_quality_matches_numpy_twin(spark):
    rng = np.random.RandomState(13)
    imgs = [rng.randint(0, 256, (12, 9, 3)).astype(np.uint8) for _ in range(5)]
    got = {r["image_id"]: r.asDict() for r in quality_stats(_df(spark, imgs)).collect()}
    for k, im in enumerate(imgs):
        row = got[f"i{k}"]
        assert row["ok"] is True
        exp = _expected(im)
        for key, val in exp.items():
            assert row[key] == val, (k, key)


def test_blur_collapses_laplacian_energy(spark):
    rng = np.random.RandomState(4)
    sharp = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    # 4x box blur via exact block means, re-expanded
    blur = (
        sharp.astype(np.int64).reshape(8, 4, 8, 4, 3).sum(axis=(1, 3)) // 16
    ).astype(np.uint8).repeat(4, axis=0).repeat(4, axis=1)
    rows = {
        r["image_id"]: r["lap_sum"]
        for r in quality_stats(_df(spark, [sharp, blur])).collect()
    }
    assert rows["i0"] > 2 * rows["i1"]


def test_flat_image_scores_zero(spark):
    flat = np.full((8, 8, 3), 120, dtype=np.uint8)
    row = quality_stats(_df(spark, [flat])).collect()[0]
    assert (row["lap_sum"], row["contrast"]) == (0, 0)
    assert row["n_dark"] == 0 and row["n_bright"] == 0


def test_exposure_counters(spark):
    im = np.zeros((4, 4, 3), dtype=np.uint8)
    im[0, :, :] = 255  # one bright row, three dark rows
    row = quality_stats(_df(spark, [im])).collect()[0]
    assert row["n_bright"] == 4 and row["n_dark"] == 12


def test_corrupt_rows_flag_not_crash(spark):
    good = np.full((4, 4, 3), 50, dtype=np.uint8)
    extra = [
        {"image_id": "bad1", "bytes": b"\x00\x01garbage", "fmt": "ppm"},
        {"image_id": "bad2", "bytes": None, "fmt": "ppm"},
    ]
    got = {r["image_id"]: r for r in quality_stats(
        _df(spark, [good], extra)
    ).collect()}
    assert got["i0"]["ok"] is True
    assert got["bad1"]["ok"] is False and got["bad1"]["lap_sum"] is None
    assert got["bad2"]["ok"] is False


def test_zero_shuffle_plan(spark):
    from vectortiles_spark.plans import audit

    g = np.zeros((4, 4, 3), dtype=np.uint8)
    assert audit.count_shuffles(quality_stats(_df(spark, [g]))) == 0
