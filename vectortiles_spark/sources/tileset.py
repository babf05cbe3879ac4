"""Slippy-map tileset directory source/sink: {root}/{z}/{x}/{y}.mvt.

The standard on-disk layout every tile server and map renderer consumes
(gdal/mb-util/tippecanoe all speak it). The sink turns the engine's tile
frame (tile_z, tile_x, tile_y, mvt) into that tree; the source reads the
tree back into the same frame using Spark's built-in ``binaryFile``
format, so ingest gets distributed scan, predicate-pushdown on the path,
and partition-parallel decode for free.

Scale shape: the source is a pure scan (no shuffle); pair it with
``decode_tiles(layers=...)`` for layer-selective ingest. The sink's only
shuffle is the repartition to bound files-per-task; tiles are written
from executors via foreachPartition, one file per tile, atomic
temp+rename per file so a killed job never leaves torn tiles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tileset(tiles: DataFrame, root: str, partitions: int | None = None) -> None:
    """Write a (tile_z, tile_x, tile_y, mvt) frame as {root}/{z}/{x}/{y}.mvt.

    Executor-side writes (foreachPartition): each task writes its tiles to
    ``.tmp`` then os.replace()s into place — readers never observe a torn
    tile and re-running after a kill is idempotent. Local/NFS paths only
    (the sandbox has no object store; on S3 you'd write via the Hadoop FS
    API instead)."""
    cols = tiles.select("tile_z", "tile_x", "tile_y", "mvt")
    if partitions:
        cols = cols.repartition(partitions)

    def write_part(rows):
        import uuid

        # attempt-unique temp name: two attempts of the same task (zombie
        # + retry, or speculative execution) sharing one ".tmp" path could
        # interleave writes and PUBLISH a torn tile via the other
        # attempt's rename — per-attempt suffix keeps rename atomicity
        suffix = f".{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
        for r in rows:
            d = os.path.join(root, str(r.tile_z), str(r.tile_x))
            os.makedirs(d, exist_ok=True)
            final = os.path.join(d, f"{r.tile_y}.mvt")
            tmp = final + suffix
            with open(tmp, "wb") as f:
                f.write(bytes(r.mvt))
            os.replace(tmp, final)

    cols.foreachPartition(write_part)


def read_tileset(spark, root: str, z: int | None = None) -> DataFrame:
    """Read {root}/{z}/{x}/{y}.mvt back into (tile_z, tile_x, tile_y, mvt).

    Built on the ``binaryFile`` source: distributed file listing + scan,
    with the tile address parsed from the path by Column regexes (stays in
    whole-stage codegen). ``z`` narrows the glob BEFORE listing, so a
    single-zoom read never even enumerates other zooms' files."""
    glob = f"{root}/{z if z is not None else '*'}/*/*.mvt"
    try:
        df = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.mvt")
            .load(glob)
        )
        df.schema  # force analysis so PATH_NOT_FOUND surfaces here
    except Exception as exc:
        # binaryFile rejects a glob with zero matches; an absent zoom or an
        # empty tileset is a legitimate empty read, not a job kill. Newer
        # Spark raises PATH_NOT_FOUND, older AnalysisException says
        # "Path does not exist" — match both.
        msg = str(exc)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        return spark.createDataFrame(
            [], "tile_z int, tile_x int, tile_y int, mvt binary"
        )
    path = F.col("path")
    return df.select(
        F.regexp_extract(path, r"/(\d+)/(\d+)/(\d+)\.mvt$", 1).cast("int").alias("tile_z"),
        F.regexp_extract(path, r"/(\d+)/(\d+)/(\d+)\.mvt$", 2).cast("int").alias("tile_x"),
        F.regexp_extract(path, r"/(\d+)/(\d+)/(\d+)\.mvt$", 3).cast("int").alias("tile_y"),
        F.col("content").alias("mvt"),
    )
