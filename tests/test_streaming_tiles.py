"""Streaming MVT ingest: lossless version-append + compaction equals a
clean batch run; first-wins mode documented for tile-monotone sources."""

import pytest
from pyspark.sql import functions as F

from vectortiles_spark.mvt import codec
from vectortiles_spark.operators import tiling
from vectortiles_spark.sources.iceberg_lite import IcebergLiteTable
from vectortiles_spark.sources.synth import images_df
from vectortiles_spark.streaming import tiles as st

N = 1200
Z = 7


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ingest") / "src")
    # adversarial: lon-hash partitioning makes every file overlap most tiles
    images_df(spark, N, seed=42).repartition(4, "lon").write.parquet(src)
    return src


def _batch_truth(spark):
    feats = tiling.point_features(
        images_df(spark, N, seed=42), z=Z, layer="images",
        feature_id=F.xxhash64("image_id"),
        meta={"caption": F.col("caption"), "phash": F.col("phash")},
    )
    return tiling.encode_tiles(feats)


def test_versions_mode_is_lossless_and_compacts_to_batch(spark, stream_src, tmp_path):
    ckpt = IcebergLiteTable(spark, str(tmp_path / "ck_versions"))
    q = st.stream_tiles_to_checkpoint(
        st.read_images_stream(spark, stream_src), ckpt, z=Z, mode="versions"
    )
    q.processAllAvailable()
    q.stop()
    # lossless: total features across all versions == all rows
    assert ckpt.read().agg(F.sum("n_features")).collect()[0][0] == N
    # compaction == clean batch run, feature-for-feature
    compacted = {
        (r.tile_x, r.tile_y): codec.roundtrip_features(bytes(r.mvt))
        for r in st.compact_tiles(ckpt).collect()
    }
    batch = {
        (r.tile_x, r.tile_y): codec.roundtrip_features(bytes(r.mvt))
        for r in _batch_truth(spark).collect()
    }
    assert compacted == batch
    # lineage: one snapshot per non-empty micro-batch
    snaps = ckpt.snapshots()
    assert len(snaps) >= 2
    assert (snaps.operation == "mvt_encode").all()


def test_first_wins_mode_unique_tiles(spark, stream_src, tmp_path):
    ckpt = IcebergLiteTable(spark, str(tmp_path / "ck_first"))
    q = st.stream_tiles_to_checkpoint(
        st.read_images_stream(spark, stream_src), ckpt, z=Z, mode="first_wins"
    )
    q.processAllAvailable()
    q.stop()
    rows = ckpt.read().select("tile_x", "tile_y").collect()
    keys = [(r.tile_x, r.tile_y) for r in rows]
    assert len(keys) == len(set(keys))  # exactly-once per tile
    # and the tile-key set equals the batch run's
    batch_keys = {(r.tile_x, r.tile_y) for r in _batch_truth(spark).collect()}
    assert set(keys) == batch_keys


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


def test_clip_simplify_compose_with_streaming(spark, tmp_path):
    """The geometry passes (clip -> simplify -> geom_features) are
    stateless mapInArrow transforms, so they compose into Structured
    Streaming unchanged: a file-source stream of world lines produces
    exactly the batch result."""
    from vectortiles_spark.operators.clip import clip_features
    from vectortiles_spark.operators.simplify import simplify_geoms
    from vectortiles_spark.sources.synth import LINES_SCHEMA, lines_df

    src = str(tmp_path / "lines_src")
    lines_df(spark, 300, seed=11).repartition(3).write.parquet(src)

    def transform(df):
        return tiling.geom_features(
            simplify_geoms(clip_features(df, z=6, buffer_px=4), tolerance=6.0)
        )

    stream = spark.readStream.schema(LINES_SCHEMA).parquet(src)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("clip_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "select tile_x, tile_y, feature_id, geom_cmds from clip_stream"
    ).collect()
    want = transform(spark.read.parquet(src)).select(
        "tile_x", "tile_y", "feature_id", "geom_cmds"
    ).collect()
    key = lambda r: (r.tile_x, r.tile_y, r.feature_id, tuple(r.geom_cmds))
    assert sorted(map(key, got)) == sorted(map(key, want)) and len(want) > 300
