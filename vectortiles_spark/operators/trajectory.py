"""Trajectory analytics over point streams (movement-data charter).

A ping relation (entity, timestamp, lon, lat) is split into trajectory
SEGMENTS at time gaps, then aggregated to per-segment movement stats —
the canonical first stage of any fleet/mobility pipeline (trip extraction,
odometer, dwell analysis). Everything is window + aggregate Column algebra
with the shared haversine twins (functions/geodesic.py): zero UDFs, and a
DuckDB twin spells the identical arithmetic for the value oracle.

Scale shape: ONE exchange total. The gap window partitions by entity; the
per-(entity, segment) aggregate's clustering requirement is satisfied by
that same hash partitioning (a subset of the group key), so Catalyst
inserts no second shuffle — pinned in tests/test_trajectory.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geodesic import haversine_m


def segment_trajectories(
    pings: DataFrame,
    gap_s: float = 1800.0,
    id_col: str = "entity_id",
    ts_col: str = "ts",
    order_col: str | None = None,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Split each entity's time-ordered pings at gaps > ``gap_s`` seconds
    and aggregate per segment: ping count, start/end timestamps, exact
    integer-ish duration, and travelled haversine distance (leg sum,
    rounded to cm so the float fold order cannot leak into the oracle
    hash).

    ``order_col`` breaks timestamp ties deterministically (pass the event
    id); without it, equal timestamps within an entity would make the leg
    order — and therefore the distance — partitioning-dependent.

    Returns (id_col, segment, n_pings, start_ts, end_ts, duration_s,
    dist_m) with ``segment`` numbered 1.. per entity in time order.
    """
    if gap_s <= 0:
        raise ValueError(f"gap_s must be positive, got {gap_s}")
    order = [ts_col] + ([order_col] if order_col else [])
    w = Window.partitionBy(id_col).orderBy(*order)
    # fractional epoch seconds via the cast chain (TIMESTAMP_NTZ needs the
    # hop through TIMESTAMP; unix_timestamp would truncate sub-seconds,
    # which the DuckDB twin's epoch() keeps)
    ep = F.col(ts_col).cast("timestamp").cast("double")
    prev_ts = F.lag(ts_col).over(w)
    gap = ep - F.lag(ep).over(w)
    new_seg = F.when(prev_ts.isNull() | (gap > F.lit(float(gap_s))), 1).otherwise(0)
    leg = F.when(
        new_seg == 1, F.lit(0.0)
    ).otherwise(
        haversine_m(
            F.lag(lon).over(w), F.lag(lat).over(w), F.col(lon), F.col(lat)
        )
    )
    tagged = pings.select(
        F.col(id_col),
        F.col(ts_col),
        F.sum(new_seg).over(w).alias("segment"),
        leg.alias("_leg"),
    )
    return tagged.groupBy(id_col, "segment").agg(
        F.count("*").alias("n_pings"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            F.max(F.col(ts_col).cast("timestamp").cast("double"))
            - F.min(F.col(ts_col).cast("timestamp").cast("double"))
        ).alias("duration_s"),
        F.round(F.sum("_leg"), 2).alias("dist_m"),
    )
