"""Checkpoint/resume for the tiling pipeline (SURVEY.md §2.D11, north_rule).

Completed tiles are committed per batch to an IcebergLiteTable manifest with
lineage (source snapshot, stage) and row-count metrics; resuming a killed
job is a ``left_anti`` join of the work units against the completed set —
no recomputation of finished tiles, no driver-side bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.iceberg_lite import IcebergLiteTable

TILE_KEY = ["tile_z", "tile_x", "tile_y"]


def checkpoint_tiles(
    tiles: DataFrame,
    table: IcebergLiteTable,
    source_snapshot: int | None = None,
    stage: str = "mvt_encode",
) -> int:
    """Commit encoded tiles + progress metrics as a new snapshot.

    Stored per tile: key, mvt payload, n_features (row-count metric),
    mvt byte size, and lineage columns (stage, source snapshot id, the
    PHYSICAL partition that produced the row — the north-rule
    per-partition lineage grain; roll up with partition_metrics)."""
    out = tiles.withColumns(
        {
            "lineage_stage": F.lit(stage),
            "lineage_source_snapshot": F.lit(source_snapshot).cast("int"),
            "lineage_partition": F.spark_partition_id(),
            "metric_mvt_bytes": F.length("mvt").cast("long"),
        }
    )
    return table.append(out, partition_by="tile_z", operation=stage)


def partition_metrics(
    table: IcebergLiteTable, snapshot_id: int | None = None
) -> DataFrame:
    """Per (stage, source snapshot, physical partition) progress metrics
    from the committed manifest: tile count, feature sum, byte volume —
    the operational view a 1000-executor run monitors for stragglers and
    skew without touching the payload column (column pruning keeps the
    mvt blobs out of this scan)."""
    return (
        table.read(snapshot_id)
        .groupBy("lineage_stage", "lineage_source_snapshot", "lineage_partition")
        .agg(
            F.count("*").alias("n_tiles"),
            F.sum("n_features").alias("n_features"),
            F.sum("metric_mvt_bytes").alias("mvt_bytes"),
        )
    )


def completed_tiles(table: IcebergLiteTable, snapshot_id: int | None = None) -> DataFrame:
    return table.read(snapshot_id).select(*TILE_KEY).distinct()


def resume_filter(features: DataFrame, table: IcebergLiteTable) -> DataFrame:
    """Drop feature rows belonging to already-completed tiles (anti-join).

    The completed-tile set is small relative to features (one row per tile)
    so Spark broadcasts it; the anti-join happens before the encode shuffle,
    so resumed runs never shuffle finished tiles at all."""
    try:
        done = completed_tiles(table)
    except ValueError:  # empty checkpoint table -> nothing to skip
        return features
    return features.join(F.broadcast(done), TILE_KEY, "left_anti")


def run_with_resume(
    features: DataFrame,
    table: IcebergLiteTable,
    encode_fn,
    source_snapshot: int | None = None,
    **encode_kw,
) -> int:
    """One resumable unit of work: filter done tiles, encode the rest,
    checkpoint. Returns the new snapshot id (or the current one if there
    was nothing left to do). ``source_snapshot`` threads provenance (e.g.
    a streaming epoch id) into the committed lineage, matching what
    versions-mode ingest records."""
    todo = resume_filter(features, table)
    tiles = encode_fn(todo, **encode_kw).persist()
    try:
        if tiles.isEmpty():  # persist: the emptiness probe must not re-run
            return table.current_snapshot() or 0  # the encode for the write
        return checkpoint_tiles(tiles, table, source_snapshot=source_snapshot)
    finally:
        tiles.unpersist()
