"""Deterministic sampling/split operators + the slippy-map tileset
source/sink."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.operators.sampling import hash_split, sample_per_group


def _docs(spark, n=400):
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "lang": [("en", "de", "fr")[i % 3] for i in range(n)],
            "source": [f"s{i % 4}" for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_sample_per_group_matches_reference_and_is_partition_invariant(spark):
    df, pdf = _docs(spark)
    got = {
        (r.lang, r.source, r.sample_rank): r.doc_id
        for r in sample_per_group(df, ["lang", "source"], 3, "doc_id").collect()
    }
    # pandas reference: md5 of the id string, first 3 per group
    pdf = pdf.assign(h=[hashlib.md5(str(i).encode()).hexdigest() for i in pdf.doc_id])
    want = {}
    for (lang, src), g in pdf.groupby(["lang", "source"]):
        for rk, (_, row) in enumerate(g.sort_values(["h", "doc_id"]).head(3).iterrows(), 1):
            want[(lang, src, rk)] = row.doc_id
    assert got == want
    # partitioning cannot change the pick
    got2 = {
        (r.lang, r.source, r.sample_rank): r.doc_id
        for r in sample_per_group(df.repartition(13), ["lang", "source"], 3, "doc_id").collect()
    }
    assert got2 == got


def test_hash_split_deterministic_ratios_and_stability(spark):
    df, pdf = _docs(spark, 2000)
    out = hash_split(df, "doc_id", {"train": 8, "val": 1, "test": 1}).collect()
    counts = {}
    assign = {}
    for r in out:
        counts[r.split] = counts.get(r.split, 0) + 1
        assign[r.doc_id] = r.split
    assert set(counts) == {"train", "val", "test"}
    # ratios roughly honored (hash-uniform): train ~ 80%
    assert 0.7 < counts["train"] / 2000 < 0.9
    # reference assignment: first 8 md5 hex chars mod 10
    for i in (0, 1, 17, 555, 1999):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10
        want = "train" if b < 8 else ("val" if b < 9 else "test")
        assert assign[i] == want, (i, b)
    # growing the table cannot move existing rows between splits
    df2, _ = _docs(spark, 3000)
    assign2 = {r.doc_id: r.split for r in hash_split(df2, "doc_id", {"train": 8, "val": 1, "test": 1}).collect()}
    assert all(assign2[i] == s for i, s in assign.items())
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"train": 0})


def test_tileset_write_read_roundtrip(spark, tmp_path):
    from vectortiles_spark.operators import tiling
    from vectortiles_spark.sources.synth import images_df
    from vectortiles_spark.sources.tileset import read_tileset, write_tileset

    imgs = images_df(spark, 80, seed=5)
    feats = tiling.point_features(
        imgs, z=4, layer="images", feature_id=F.xxhash64("image_id")
    )
    tiles = tiling.encode_tiles(feats)
    want = {(r.tile_z, r.tile_x, r.tile_y): bytes(r.mvt) for r in tiles.collect()}
    root = str(tmp_path / "tiles")
    write_tileset(tiles, root)
    back = read_tileset(spark, root)
    got = {(r.tile_z, r.tile_x, r.tile_y): bytes(r.mvt) for r in back.collect()}
    assert got == want and len(got) > 3
    # z= narrows the listing glob; here everything is one zoom
    assert read_tileset(spark, root, z=4).count() == len(want)
    # decoded features from the reread tree match a direct decode
    a = sorted(
        (r.tile_x, r.tile_y, r.feature_id)
        for r in tiling.decode_tiles(back).collect()
    )
    b = sorted(
        (r.tile_x, r.tile_y, r.feature_id)
        for r in tiling.decode_tiles(tiles).collect()
    )
    assert a == b


def test_read_tileset_missing_zoom_is_empty_not_error(spark, tmp_path):
    from vectortiles_spark.sources.tileset import read_tileset

    root = str(tmp_path / "none")
    assert read_tileset(spark, root).count() == 0
    assert read_tileset(spark, root, z=9).count() == 0
    assert [f.name for f in read_tileset(spark, root).schema.fields] == [
        "tile_z", "tile_x", "tile_y", "mvt",
    ]


# --------------------------- weighted_sample ---------------------------


def _aes_replica(rows, k, seed):
    """Pure-Python replica of weighted_sample's priority formula."""
    import hashlib
    import math

    pri = {}
    for rid, wgt in rows:
        if wgt is None or wgt <= 0:
            continue
        h = int(hashlib.md5(f"{rid}#{seed}".encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / float(1 << 60)
        pri[rid] = math.log(u) / wgt
    return [r for r, _ in sorted(pri.items(), key=lambda t: (-t[1], t[0]))[:k]]


def test_weighted_sample_matches_replica_and_is_partition_invariant(spark):
    from vectortiles_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7) % 10)) for i in range(300)] + [(300, None), (301, 0.0)]
    want = set(_aes_replica(rows, 20, seed=5))
    for nparts in (1, 8):
        df = spark.createDataFrame(rows, "id long, w double").repartition(nparts)
        got = {r.id for r in weighted_sample(df, "w", 20, id_col="id", seed=5).collect()}
        assert got == want, nparts
    # a different seed redraws
    got2 = {
        r.id
        for r in weighted_sample(
            spark.createDataFrame(rows, "id long, w double"), "w", 20,
            id_col="id", seed=6,
        ).collect()
    }
    assert got2 != want


def test_weighted_sample_bias_follows_weights():
    """Statistical check of the formula itself (pure Python, no Spark):
    one heavy item (w=9) among nine light (w=1) must win the k=1 draw
    about 9/18 of the time across independent seeds."""
    rows = [(0, 9.0)] + [(i, 1.0) for i in range(1, 10)]
    wins = sum(1 for s in range(2000) if _aes_replica(rows, 1, seed=s)[0] == 0)
    frac = wins / 2000
    assert 0.42 <= frac <= 0.58, frac  # expect 0.5, ~3 sigma band ±0.033


def test_weighted_sample_per_group(spark):
    from vectortiles_spark.operators.sampling import weighted_sample

    rows = [(g, i, 1.0 + i % 3) for g in ("a", "b") for i in range(50)]
    df = spark.createDataFrame(rows, "g string, id long, w double")
    got = weighted_sample(df, "w", 5, id_col="id", by=["g"], seed=1).collect()
    from collections import Counter

    per = Counter(r.g for r in got)
    assert per == {"a": 5, "b": 5}
