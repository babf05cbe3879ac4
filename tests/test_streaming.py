"""Structured Streaming: stream output must equal the batch twin (which is
itself DuckDB-oracle-checked in the driver battery)."""

import shutil

import pytest
from pyspark.sql import functions as F

from vectortiles_spark.plans.queries import q_events_hourly
from vectortiles_spark.streaming import events as ev

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Events split into several files so the stream sees multiple batches."""
    out = str(tmp_path / "events_stream")
    spark.read.parquet(f"{SF}/events.parquet").repartition(4).write.parquet(out)
    return out


def test_windowed_counts_stream_equals_batch(spark, events_dir):
    stream = ev.read_events_stream(spark, events_dir, files_per_trigger=2)
    agg = ev.windowed_counts(stream)
    ev.run_stream_to_memory(agg, "win_out", output_mode="append")
    got = {
        (r.hour, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    want = {
        (r.hour, r.event_type): (r.n, r.total_value)
        for r in q_events_hourly(spark, SF).collect()
    }
    # append mode only emits windows finalized by the watermark; the last
    # (max_ts - watermark) windows stay open when the stream drains. Every
    # emitted window must match the batch twin exactly, and the only
    # missing ones must be in that open tail.
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert want[k] == v
    max_hour = max(h for h, _ in want)
    import datetime

    # a window [h, h+1h) is finalized only once watermark (max_ts - 2h)
    # passes h+1h; with max_ts < max_hour+1h, windows from max_hour-3h on
    # may legitimately still be open
    cutoff = max_hour - datetime.timedelta(hours=3)
    missing = set(want) - set(got)
    assert all(h >= cutoff for h, _ in missing), missing


def test_sessionize_stream_closes_sessions(spark, events_dir):
    stream = ev.read_events_stream(spark, events_dir, files_per_trigger=4)
    sess = ev.sessionize_stream(stream)
    ev.run_stream_to_memory(sess, "sess_out", output_mode="append")
    rows = spark.sql("SELECT * FROM sess_out").collect()
    # closed sessions only (open tails are still in state) — each closed
    # session must respect the 30-min gap rule vs the next one
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert rows, "no sessions closed — gap rule never triggered?"
    for user, sessions in by_user.items():
        sessions.sort(key=lambda r: r.session_id)
        for a, b in zip(sessions, sessions[1:]):
            assert b.session_id > a.session_id
            assert (b.first_ts - a.last_ts).total_seconds() > ev.SESSION_GAP_S
        for s in sessions:
            assert s.n_events >= 1
            assert s.first_ts <= s.last_ts


def test_sessionize_stream_out_of_order_batches(spark, events_dir):
    """files_per_trigger=1 delivers each user's events out of global ts
    order across micro-batches; the sessionizer must never corrupt session
    boundaries (first_ts > last_ts) — far-late events surface as marked
    session_id=-1 rows instead of dragging the open session backwards."""
    stream = ev.read_events_stream(spark, events_dir, files_per_trigger=1)
    sess = ev.sessionize_stream(stream)
    ev.run_stream_to_memory(sess, "sess_ooo_out", output_mode="append")
    rows = spark.sql("SELECT * FROM sess_ooo_out").collect()
    assert rows, "stream emitted nothing"
    for r in rows:
        assert r.first_ts <= r.last_ts, (
            f"corrupted session: {r.user_id} s{r.session_id} "
            f"first={r.first_ts} last={r.last_ts}"
        )
        if r.session_id >= 0:
            assert r.n_events >= 1
        else:
            assert r.n_events == 1  # late marker rows are single events


def test_sessionize_late_event_cannot_bridge_emitted_session():
    """Review scenario: session A (ends 09:29) already emitted, open
    session B starts 10:00; a late 09:45 event sits within the gap of
    BOTH. Absorbing it into B would emit B with first_ts only 16 min
    after A.last_ts — violating the closed-session gap invariant — so it
    must surface as a session_id=-1 late marker instead."""
    import pandas as pd

    class FakeState:
        def __init__(self):
            self._v = None
        @property
        def exists(self):
            return self._v is not None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self._v = v

    t = lambda s: pd.Timestamp(f"2026-01-01 {s}")
    state = FakeState()
    out1 = list(ev._sessionize_fn(
        (1,),
        [pd.DataFrame({"ts": [t("09:00"), t("09:29"), t("10:00"), t("10:10")],
                       "event_id": [1, 2, 3, 4]})],
        state,
    ))
    emitted = pd.concat(out1)
    assert len(emitted) == 1 and emitted.iloc[0]["last_ts"] == t("09:29")
    out2 = list(ev._sessionize_fn(
        (1,), [pd.DataFrame({"ts": [t("09:45")], "event_id": [5]})], state
    ))
    late = pd.concat(out2)
    assert len(late) == 1 and late.iloc[0]["session_id"] == -1
    # the open session's boundary must NOT have moved backwards
    sid, n, first_ts, last_ts, prev_last = state.get
    assert first_ts == t("10:00") and prev_last == t("09:29")
    # a backward event clear of the previous session still absorbs
    out3 = list(ev._sessionize_fn(
        (1,), [pd.DataFrame({"ts": [t("10:05")], "event_id": [6]})], state
    ))
    assert out3 == []
    assert state.get[1] == 3  # absorbed into the open session


def test_hopping_counts_stream_equals_batch(spark, events_dir):
    from vectortiles_spark.plans.queries import q_events_hopping

    stream = ev.read_events_stream(spark, events_dir, files_per_trigger=2)
    agg = ev.hopping_counts(stream)
    ev.run_stream_to_memory(agg, "hop_out", output_mode="append")
    got = {
        (r.win_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM hop_out").collect()
    }
    want = {
        (r.win_start, r.event_type): (r.n, r.total_value)
        for r in q_events_hopping(spark, SF).collect()
    }
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert want[k] == v
    # only the watermark-open tail may be missing (hop windows close when
    # watermark (max_ts - 2h) passes win_start + 1h)
    import datetime

    max_start = max(s for s, _ in want)
    cutoff = max_start - datetime.timedelta(hours=3)
    missing = set(want) - set(got)
    assert all(s >= cutoff for s, _ in missing), sorted(missing)[:5]


def test_dedup_stream_drops_in_horizon_duplicates(spark, tmp_path):
    """Every event written TWICE (same micro-batch horizon) must come out
    once; state is keyed on event_id within the watermark."""
    src = spark.read.parquet(f"{SF}/events.parquet").limit(500)
    out = str(tmp_path / "dup_stream")
    src.repartition(2).write.parquet(out)
    src.repartition(3).write.mode("append").parquet(out)

    stream = ev.read_events_stream(spark, out, files_per_trigger=10)
    ev.run_stream_to_memory(ev.dedup_stream(stream), "dedup_out", output_mode="append")
    got = spark.sql("SELECT event_id, count(*) AS c FROM dedup_out GROUP BY 1")
    dupes = got.filter("c > 1").count()
    assert dupes == 0
    assert got.count() == 500


def test_geofence_stream_equals_batch(spark, tmp_path):
    """Stream-static geodesic geofence == batch distance_join on the same
    rows (the stateless plan makes this an exact-equality contract, not a
    watermark-tail one)."""
    import numpy as np

    from vectortiles_spark.operators.spatial_join import distance_join
    from vectortiles_spark.streaming.geofence import geofence_stream

    rng = np.random.default_rng(5)
    pts = [
        (int(i), float(lo), float(la))
        for i, (lo, la) in enumerate(
            zip(rng.uniform(-180, 180, 300), rng.uniform(-85, 85, 300))
        )
    ]
    fences = [
        (int(j), float(lo), float(la))
        for j, (lo, la) in enumerate(
            zip(rng.uniform(-180, 180, 40), rng.uniform(-85, 85, 40))
        )
    ]
    pdf = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    fdf = spark.createDataFrame(fences, "fence_id long, lon double, lat double")
    src = str(tmp_path / "geofence_pts")
    pdf.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("point_id long, lon double, lat double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = geofence_stream(stream, fdf, 1_500_000.0)
    ev.run_stream_to_memory(out, "geofence_out", output_mode="append")
    got = {
        (r.point_id, r.fence_id): r.dist_m
        for r in spark.sql("SELECT * FROM geofence_out").collect()
    }
    want = {
        (r.left_id, r.right_id): r.dist_m
        for r in distance_join(
            pdf.withColumnRenamed("point_id", "left_id"),
            fdf.withColumnRenamed("fence_id", "right_id"),
            1_500_000.0,
        ).collect()
    }
    assert got == want and got, "stream != batch"


def test_geofence_stream_rejects_misuse(spark, tmp_path):
    from vectortiles_spark.streaming.geofence import geofence_stream

    static = spark.createDataFrame(
        [(1, 0.0, 0.0)], "point_id long, lon double, lat double"
    )
    with pytest.raises(ValueError, match="streaming"):
        geofence_stream(static, static, 1000.0)


def test_hexbin_stream_equals_batch(spark, tmp_path):
    """Watermarked streaming hexbin == the batch twin on the same closed
    input (append mode emits every window once all files are consumed;
    the hex assignment Columns are shared, so any drift is structural)."""
    import datetime as dt

    import numpy as np

    from vectortiles_spark.streaming.hexbin import (
        hexbin_batch_twin,
        hexbin_stream,
    )

    rng = np.random.default_rng(23)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (
            t0 + dt.timedelta(minutes=int(rng.integers(0, 600))),
            float(lo),
            float(la),
        )
        for lo, la in zip(
            rng.uniform(-179, 179, 400), rng.uniform(-84, 84, 400)
        )
    ]
    schema = "ts timestamp, lon double, lat double"
    pdf = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "hex_events")
    # time-ordered file slices (range partition 0 = earliest): arrival
    # order then matches event time, so a 3h watermark never out-skews
    # the 2h per-file slices and nothing is dropped as late
    pdf.repartitionByRange(5, "ts").sortWithinPartitions("ts").write.parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    out = hexbin_stream(
        stream, z=3, size_px=512, window="1 hour", watermark="3 hours",
        projection="equirect",
    )
    ev.run_stream_to_memory(out, "hexbin_out", output_mode="append")
    got = {
        (r.window_start, r.hq, r.hr): (r.point_count, r.cx_px, r.cy_px)
        for r in spark.sql("SELECT * FROM hexbin_out").collect()
    }
    want = {
        (r.window_start, r.hq, r.hr): (r.point_count, r.cx_px, r.cy_px)
        for r in hexbin_batch_twin(
            pdf, z=3, size_px=512, window="1 hour", projection="equirect"
        ).collect()
    }
    # append mode only emits watermark-finalized windows: every emitted
    # row must equal the batch twin, and anything missing must be in the
    # open tail (same contract as test_windowed_counts_stream_equals_batch)
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert want[k] == v, k
    max_win = max(w for w, _, _ in want)
    cutoff = max_win - dt.timedelta(hours=5)
    missing = set(want) - set(got)
    assert all(w >= cutoff for w, _, _ in missing), missing


def test_hexbin_stream_rejects_misuse(spark):
    import pytest as _pytest

    from vectortiles_spark.streaming.hexbin import hexbin_stream

    pdf = spark.createDataFrame([], "ts timestamp, lon double, lat double")
    with _pytest.raises(ValueError, match="streaming"):
        hexbin_stream(pdf, z=3)
