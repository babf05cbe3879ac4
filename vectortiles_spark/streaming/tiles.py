"""Streaming MVT ingest: a continuously arriving image table is tiled
incrementally, each micro-batch committed to the Iceberg-lite checkpoint
table with lineage — the streaming twin of the batch pipeline, giving
exactly-once tile output on top of Spark's at-least-once foreachBatch
(the checkpoint anti-join makes re-delivered batches no-ops per tile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import resume, tiling
from ..sources.iceberg_lite import IcebergLiteTable
from ..sources.synth import IMAGES_SCHEMA


def read_images_stream(spark: SparkSession, path: str, files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def stream_tiles_to_checkpoint(
    images_stream: DataFrame,
    checkpoint_table: IcebergLiteTable,
    z: int = 10,
    layer: str = "images",
    max_per_tile: int | None = None,
):
    """writeStream.foreachBatch: features -> resume-filtered encode ->
    checkpoint commit. NOTE: within one run, a tile whose points span
    multiple micro-batches is encoded from the FIRST batch containing it
    and later points for that tile are skipped (append-tile semantics);
    re-tiling merged data is the batch pipeline's job — the streaming path
    is for monotone tile regions (e.g. time-partitioned ingest)."""
    from pyspark.sql import functions as F

    def process(batch_df: DataFrame, epoch_id: int):
        feats = tiling.point_features(
            batch_df, z=z, layer=layer,
            feature_id=F.xxhash64("image_id"),
            meta={"caption": F.col("caption"), "phash": F.col("phash")},
        )
        resume.run_with_resume(
            feats, checkpoint_table, tiling.encode_tiles, max_per_tile=max_per_tile
        )

    return (
        images_stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .start()
    )
