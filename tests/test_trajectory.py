"""Trajectory segmentation vs a brute-force replica + plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.functions.geodesic import haversine_np
from vectortiles_spark.operators.trajectory import segment_trajectories


def _pings(n=400, entities=7, seed=3):
    rng = np.random.Generator(np.random.PCG64(seed))
    ent = rng.integers(0, entities, n)
    # bursty timestamps: clustered pings with occasional long gaps
    ts = np.cumsum(rng.choice([5.0, 30.0, 60.0, 4000.0], n, p=[0.5, 0.3, 0.15, 0.05]))
    lon = rng.uniform(-10, 10, n)
    lat = rng.uniform(40, 50, n)
    return pd.DataFrame(
        {"entity_id": ent, "ping_id": np.arange(n),
         "ts": pd.to_datetime(ts, unit="s"), "lon": lon, "lat": lat}
    )


def _brute(pdf, gap_s):
    out = {}
    for ent, g in pdf.sort_values(["entity_id", "ts", "ping_id"]).groupby("entity_id"):
        seg, prev = 0, None
        for _, row in g.iterrows():
            t = row["ts"].timestamp()
            if prev is None or t - prev[0] > gap_s:
                seg += 1
                out[(ent, seg)] = [0, row["ts"], row["ts"], 0.0]
            else:
                out[(ent, seg)][3] += float(
                    haversine_np(
                        np.array([prev[1]]), np.array([prev[2]]),
                        np.array([row["lon"]]), np.array([row["lat"]]),
                    )[0]
                )
            rec = out[(ent, seg)]
            rec[0] += 1
            rec[2] = row["ts"]
            prev = (t, row["lon"], row["lat"])
    return {
        k: (v[0], v[1], v[2], round(v[3], 2)) for k, v in out.items()
    }


def test_segment_trajectories_matches_brute(spark):
    pdf = _pings()
    df = spark.createDataFrame(pdf)
    got = {
        (r.entity_id, r.segment): (r.n_pings, r.start_ts, r.end_ts, r.dist_m)
        for r in segment_trajectories(
            df, gap_s=600.0, order_col="ping_id"
        ).collect()
    }
    want = {
        k: (v[0], v[1].to_pydatetime(), v[2].to_pydatetime(), v[3])
        for k, v in _brute(pdf, 600.0).items()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == want[k][1] and got[k][2] == want[k][2], k
        assert abs(got[k][3] - want[k][3]) <= 0.01, (k, got[k][3], want[k][3])


def test_segment_trajectories_partitioning_invariant(spark):
    pdf = _pings(seed=9)
    a = spark.createDataFrame(pdf).repartition(1)
    b = spark.createDataFrame(pdf).repartition(13)
    ga = {(r.entity_id, r.segment): r.dist_m
          for r in segment_trajectories(a, gap_s=600, order_col="ping_id").collect()}
    gb = {(r.entity_id, r.segment): r.dist_m
          for r in segment_trajectories(b, gap_s=600, order_col="ping_id").collect()}
    assert ga == gb


def test_segment_trajectories_single_exchange_plan(spark):
    """The per-(entity, segment) aggregate must reuse the window's
    hash partitioning on entity_id: exactly ONE exchange in the plan."""
    df = spark.createDataFrame(_pings(80))
    plan = (
        segment_trajectories(df, order_col="ping_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_segment_trajectories_validation(spark):
    df = spark.createDataFrame(_pings(10))
    with pytest.raises(ValueError, match="gap_s"):
        segment_trajectories(df, gap_s=0)
