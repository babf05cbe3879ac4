"""Streaming MVT ingest: a continuously arriving image table is tiled
incrementally, each micro-batch committed to the Iceberg-lite checkpoint
table with lineage.

Two dedup modes:

* ``mode="versions"`` (default, LOSSLESS): every micro-batch emits its own
  version of each touched tile; a tile key can appear once per epoch, each
  version covering that epoch's features. ``compact_tiles`` merges all
  versions into clean one-row-per-tile output by decoding every version's
  features and re-encoding (the engine's own decode/encode operators — the
  streaming analog of an Iceberg compaction).
* ``mode="first_wins"``: the checkpoint anti-join drops tiles already
  committed — exactly-once per TILE, appropriate only when the source is
  tile-monotone (e.g. region-partitioned backfill); with overlapping
  batches later features for a committed tile are dropped (measured: a
  lon-hashed source lost >50% of features — hence not the default).
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


def _commit_epoch_versions(
    feats: DataFrame,
    checkpoint_table: IcebergLiteTable,
    epoch_id: int,
    max_per_tile: int | None = None,
    layer: str | None = None,
) -> bool:
    """Versions-mode epoch commit, IDEMPOTENT under foreachBatch's
    at-least-once retry: a crash between our commit and Spark's offset
    commit re-runs the epoch on restart, and a blind append would
    double-count every feature through compact_tiles. The
    lineage_source_snapshot column checkpoint_tiles writes is the
    idempotence key — an already-committed epoch is skipped. Returns
    True when a commit happened."""
    from pyspark.sql import functions as F

    try:
        committed = checkpoint_table.read()
        already = (
            committed.filter(
                F.col("lineage_source_snapshot") == int(epoch_id)
            ).limit(1).count() > 0
        )
    except (FileNotFoundError, ValueError):
        already = False  # empty/uninitialized checkpoint table
    if already:
        return False
    tiles = tiling.encode_tiles(feats, max_per_tile=max_per_tile, single_layer=layer).persist()
    try:
        if tiles.isEmpty():
            return False
        resume.checkpoint_tiles(tiles, checkpoint_table, source_snapshot=epoch_id)
        return True
    finally:
        tiles.unpersist()


def stream_tiles_to_checkpoint(
    images_stream: DataFrame,
    checkpoint_table: IcebergLiteTable,
    z: int = 10,
    layer: str = "images",
    max_per_tile: int | None = None,
    mode: str = "versions",
    checkpoint_dir: str | None = None,
):
    from pyspark.sql import functions as F

    def process(batch_df: DataFrame, epoch_id: int):
        feats = tiling.point_features(
            batch_df, z=z, layer=layer,
            feature_id=F.xxhash64("image_id"),
            meta={"caption": F.col("caption"), "phash": F.col("phash")},
        )
        if mode == "first_wins":
            resume.run_with_resume(
                feats, checkpoint_table, tiling.encode_tiles,
                source_snapshot=epoch_id,
                max_per_tile=max_per_tile, single_layer=layer,
            )
        else:
            _commit_epoch_versions(
                feats, checkpoint_table, epoch_id,
                max_per_tile=max_per_tile, layer=layer,
            )

    # a STREAMING checkpoint dir makes source progress durable: without
    # it a restarted query replays every file, and versions mode (no
    # anti-join by design) would re-append every tile version. first_wins
    # mode is restart-safe either way (the Iceberg-lite anti-join dedupes)
    writer = images_stream.writeStream.outputMode("append").foreachBatch(process)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def compact_tiles(
    checkpoint_table: IcebergLiteTable,
    snapshot_id: int | None = None,
    max_per_tile: int | None = None,
    single_layer: str | None = None,
) -> DataFrame:
    """Merge all tile versions into one clean MVT row per tile: decode every
    version's features (distributed) and re-encode. Pass the SAME
    ``max_per_tile``/``single_layer`` the ingest used — the compacted
    union of N capped versions can exceed the per-tile cap, and only
    re-applying it here keeps the output equivalent to a batch run over
    the union of all ingested rows."""
    versions = checkpoint_table.read(snapshot_id).select("tile_z", "tile_x", "tile_y", "mvt")
    feats = tiling.decode_tiles(versions)
    return tiling.encode_tiles(feats, max_per_tile=max_per_tile, single_layer=single_layer)
