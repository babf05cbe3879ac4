"""Streaming MVT ingest: micro-batched tiling into the resumable
checkpoint table equals a clean batch run over the same rows."""

import pytest
from pyspark.sql import functions as F

from vectortiles_spark.operators import tiling
from vectortiles_spark.sources.iceberg_lite import IcebergLiteTable
from vectortiles_spark.sources.synth import images_df
from vectortiles_spark.streaming import tiles as st


def test_stream_tiles_checkpoint(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    # time-partitioned-ingest shape: each file covers a disjoint tile region
    imgs = images_df(spark, 1500, seed=42)
    imgs.repartition(4, "lon").write.parquet(src)

    ckpt = IcebergLiteTable(spark, str(tmp_path / "ckpt"))
    stream = st.read_images_stream(spark, src, files_per_trigger=1)
    q = st.stream_tiles_to_checkpoint(stream, ckpt, z=7)
    q.processAllAvailable()
    q.stop()

    got = {
        (r.tile_x, r.tile_y): r.n_features
        for r in ckpt.read().select("tile_x", "tile_y", "n_features").collect()
    }
    # batch truth over the same rows; a tile split across micro-batches is
    # encoded from its first batch only (documented append-tile semantics),
    # so compare tile keys always and counts where the stream saw the whole
    # tile in one batch
    feats = tiling.point_features(
        imgs, z=7, layer="images", feature_id=F.xxhash64("image_id"),
        meta={"caption": F.col("caption"), "phash": F.col("phash")},
    )
    batch = {
        (r.tile_x, r.tile_y): r.n_features
        for r in tiling.encode_tiles(feats).collect()
    }
    assert set(got) == set(batch)
    assert sum(got.values()) <= sum(batch.values())
    matched = sum(1 for k in got if got[k] == batch[k])
    assert matched >= len(batch) * 0.5  # hash-partitioned lon => most tiles in one file
    # snapshots carry lineage
    snaps = ckpt.snapshots()
    assert len(snaps) >= 2  # one commit per non-empty micro-batch
    assert (snaps.operation == "mvt_encode").all()


def test_sql_snippets_match_column_math(spark):
    from vectortiles_spark.functions.register import sql_tile_x, sql_tile_y, sql_unzigzag, sql_zigzag
    from vectortiles_spark.functions.tiles import tile_x, tile_y

    df = spark.createDataFrame(
        [(lon / 7.0, lat / 9.0) for lon in range(-1200, 1200, 97) for lat in (-700, -3, 0, 5, 701)],
        "lon double, lat double",
    )
    df.createOrReplaceTempView("pts_check")
    sql = spark.sql(
        f"SELECT {sql_tile_x('lon', 9)} AS tx, {sql_tile_y('lat', 9)} AS ty, "
        f"{sql_unzigzag(sql_zigzag('CAST(lon AS BIGINT)'))} AS zz FROM pts_check"
    ).collect()
    col = df.select(
        tile_x(F.col("lon"), 9).alias("tx"),
        tile_y(F.col("lat"), 9).alias("ty"),
        F.col("lon").cast("bigint").alias("zz"),
    ).collect()
    assert [(r.tx, r.ty, r.zz) for r in sql] == [(r.tx, r.ty, r.zz) for r in col]
