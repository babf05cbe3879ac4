"""Streaming geodesic geofence matching.

A stream of (id, lon, lat) points joined against a STATIC fence-point set
within a radius on the sphere — the alerting/attribution shape (vehicle
enters coverage, photo taken near a POI). Composition of the engine's
geodesic distance-band join (operators/spatial_join.py:distance_join)
with Structured Streaming: every op in that plan (pure-Column projection,
bounded explode, cell equi-join, haversine filter) is STATELESS, so the
stream-static inner join needs no watermark and holds zero streaming
state — each micro-batch pays exactly the batch plan's cost and the
stream twin's output provably equals the batch operator's on the same
rows (pinned in tests/test_streaming.py).

Scale shape: the fence set is the static right side, shuffled once per
micro-batch on its single cell key (broadcast it upstream with
F.broadcast if it is dim-table sized); the stream side's explode is
bounded by data latitude exactly as in the batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.spatial_join import distance_join


def geofence_stream(
    points: DataFrame,
    fences: DataFrame,
    radius_m: float,
    point_id: str = "point_id",
    fence_id: str = "fence_id",
) -> DataFrame:
    """Match a streaming point set against static fences within
    ``radius_m`` meters (haversine). ``points`` is a streaming DataFrame
    with (point_id, lon, lat); ``fences`` is a static DataFrame with
    (fence_id, lon, lat). Returns (point_id, fence_id, dist_m) rows in
    append mode."""
    if not points.isStreaming:
        raise ValueError("points must be a streaming DataFrame")
    if fences.isStreaming:
        raise ValueError("fences must be static (stream-static join)")
    return distance_join(
        points, fences, radius_m, left_id=point_id, right_id=fence_id
    )
