"""Streaming hexagonal density binning — live heatmap tiles.

The streaming twin of ``operators/cluster.py:hexbin_points``: a stream of
geo-tagged events becomes watermarked per-window hex density rows (the
live layer behind a realtime density map). The hex assignment is the
SAME Column expressions as the batch operator (``hex_axial_cols`` /
``hex_center_cols`` — one home, so batch, stream, and the DuckDB oracle
cannot drift); the streaming part is a standard watermarked tumbling-
window aggregate, so state is bounded by (watermark / window) windows x
live hexes, and late rows beyond the watermark drop exactly like
``streaming/events.py:windowed_counts``.

Stream == batch contract (pinned in tests/test_streaming.py): for the
same finite input, the streamed rows equal the batch plan's rows — the
hex columns are deterministic projections, and Spark's windowed count
over a watermark on closed input equals the batch groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tiles import projected_tile_pixel
from ..mvt import codec
from ..operators.cluster import hex_axial_cols, hex_center_cols


def hexbin_stream(
    events: DataFrame,
    z: int,
    size_px: int = 128,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    projection: str = "webmercator",
    extent: int = codec.DEFAULT_EXTENT,
) -> DataFrame:
    """Streaming (window_start, hq, hr, point_count, cx_px, cy_px) rows
    in append mode. ``events`` must be a streaming DataFrame carrying a
    timestamp ``ts_col`` plus ``lon``/``lat``."""
    if not events.isStreaming:
        raise ValueError("hexbin_stream: events must be a streaming DataFrame")
    if size_px < 1:
        raise ValueError(f"size_px={size_px} must be >= 1")
    if projection not in ("webmercator", "equirect"):
        raise ValueError(f"unknown projection {projection!r}")
    tx, ty, px, py = projected_tile_pixel(
        F.col(lon), F.col(lat), z, extent, projection
    )
    gx = (tx.cast("bigint") * extent + px).cast("double")
    gy = (ty.cast("bigint") * extent + py).cast("double")
    hq, hr = hex_axial_cols(gx, gy, size_px)
    binned = events.select(
        F.col(ts_col).alias("ts"), hq.alias("hq"), hr.alias("hr")
    )
    agg = (
        binned.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "hq", "hr")
        .agg(F.count("*").alias("point_count"))
    )
    cx, cy = hex_center_cols(F.col("hq"), F.col("hr"), size_px)
    return agg.select(
        F.col("win.start").alias("window_start"),
        "hq", "hr", "point_count",
        cx.alias("cx_px"), cy.alias("cy_px"),
    )


def hexbin_batch_twin(
    events: DataFrame,
    z: int,
    size_px: int = 128,
    window: str = "1 hour",
    ts_col: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    projection: str = "webmercator",
    extent: int = codec.DEFAULT_EXTENT,
) -> DataFrame:
    """The batch plan the stream must equal on the same closed input —
    identical projections and window bucketing, no watermark needed."""
    tx, ty, px, py = projected_tile_pixel(
        F.col(lon), F.col(lat), z, extent, projection
    )
    gx = (tx.cast("bigint") * extent + px).cast("double")
    gy = (ty.cast("bigint") * extent + py).cast("double")
    hq, hr = hex_axial_cols(gx, gy, size_px)
    binned = events.select(
        F.col(ts_col).alias("ts"), hq.alias("hq"), hr.alias("hr")
    )
    agg = binned.groupBy(
        F.window("ts", window).alias("win"), "hq", "hr"
    ).agg(F.count("*").alias("point_count"))
    cx, cy = hex_center_cols(F.col("hq"), F.col("hr"), size_px)
    return agg.select(
        F.col("win.start").alias("window_start"),
        "hq", "hr", "point_count",
        cx.alias("cx_px"), cy.alias("cy_px"),
    )
