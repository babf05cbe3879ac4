"""Structured Streaming operators over the events stream.

The engine's streaming surface (the reference is batch-only; this is
engine-side capability per the charter): watermarked windowed aggregation
and a custom stateful sessionizer via applyInPandasWithState. Batch twins
of both live in plans/queries.py (q_events_hourly, q_sessionize) and are
value-checked against DuckDB; the streaming tests assert stream output ==
batch twin output on the same data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str, files_per_trigger: int = 1) -> DataFrame:
    """Parquet directory as a stream (one file per micro-batch by default)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(sf_dir)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregate: late rows beyond the watermark
    are dropped; state is bounded by (watermark / window) windows per key."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("win.start").alias("hour"), "event_type", "n", "total_value")
    )


SESSION_OUT_SCHEMA = "user_id bigint, session_id int, n_events int, first_ts timestamp, last_ts timestamp"
SESSION_STATE_SCHEMA = (
    "session_id int, n_events int, first_ts timestamp, last_ts timestamp, "
    "prev_last_ts timestamp"
)
SESSION_GAP_S = 1800


def _sessionize_fn(key, pdfs, state: GroupState):
    """Custom stateful operator: per-user session accumulation with a
    30-minute inactivity gap, emitting every CLOSED session (append mode).

    State per user: (current session id, count, first/last ts). The open
    tail session stays in state — at-least-once emission of closed sessions
    is the contract; a timeout-based flush would make ``processAllAvailable``
    spin forever on idle timers in test harnesses."""
    (user_id,) = key
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    closed = []
    if state.exists:
        # applyInPandasWithState state schemas are NOT evolvable: a
        # checkpoint written before prev_last_ts existed carries 4-tuples.
        # Absorb such legacy state (prev_last -> None, weakening only the
        # late-data gap refinement) instead of crashing the restarted query.
        got = tuple(state.get)
        sid, n, first_ts, last_ts = got[:4]
        prev_last = got[4] if len(got) > 4 else None
    else:
        sid, n, first_ts, last_ts, prev_last = 0, 0, None, None, None
    for ts in rows["ts"]:
        if last_ts is not None and ts < last_ts:
            # cross-batch OUT-OF-ORDER event: never move the session cursor
            # backwards (doing so corrupts boundaries — first_ts > last_ts).
            # Inside the open session's span: absorb. BEFORE the span:
            # absorb (extending first_ts) only while staying clear of the
            # previously EMITTED session — an event within the gap of that
            # session belonged to it (or bridges the two), and since append
            # mode cannot retract it, extending the open session backwards
            # would emit consecutive sessions violating the gap invariant.
            # Those events — like ones older still — surface as standalone
            # session_id=-1 rows so consumers can distinguish late data.
            near_open = (first_ts - ts).total_seconds() <= SESSION_GAP_S
            clear_of_prev = (
                prev_last is None or (ts - prev_last).total_seconds() > SESSION_GAP_S
            )
            if ts >= first_ts or (near_open and clear_of_prev):
                n += 1
                if ts < first_ts:
                    first_ts = ts
            else:
                closed.append({"user_id": user_id, "session_id": -1,
                               "n_events": 1, "first_ts": ts, "last_ts": ts})
            continue
        if last_ts is not None and (ts - last_ts).total_seconds() > SESSION_GAP_S:
            closed.append({"user_id": user_id, "session_id": sid, "n_events": n,
                           "first_ts": first_ts, "last_ts": last_ts})
            prev_last = last_ts
            sid, n, first_ts = sid + 1, 0, None
        if first_ts is None:
            first_ts = ts
        n += 1
        last_ts = ts
    state.update((sid, n, first_ts, last_ts, prev_last))
    if closed:
        yield pd.DataFrame(closed)


def sessionize_stream(events: DataFrame) -> DataFrame:
    """groupBy(user).applyInPandasWithState sessionizer (SURVEY-charter
    custom stateful streaming operator).

    Checkpoint compatibility: SESSION_STATE_SCHEMA gained prev_last_ts in
    r4. Spark's state-store schema check typically rejects restarts from
    pre-change checkpoints outright (discard the checkpoint to upgrade);
    if the check is disabled, _sessionize_fn additionally tolerates
    legacy 4-field state rows (prev_last_ts treated as unknown)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query to completion over the available files
    (memory sink; synchronous via processAllAvailable — test harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def hopping_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked HOPPING-window aggregate (each event lands in
    window/slide windows; state bounded by the watermark horizon).
    Batch twin: plans/queries.py:q_events_hopping — same epoch-aligned
    window placement, value-checked against DuckDB."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total_value")
    )


def dedup_stream(
    events: DataFrame, watermark: str = "2 hours", keys: tuple[str, ...] = ("event_id",)
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: duplicates arriving
    within the watermark horizon of the first sighting are dropped, and
    key state is evicted once the watermark passes — the only dedup
    shape that survives an unbounded stream (a plain dropDuplicates
    accretes state forever). The batch twin is q_dedup_exact's
    keep-first semantics restricted to the horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
