"""As-of join and binned interval join: brute-force oracles, boundary
semantics, determinism, and plan-shape audits (one shuffle / no
cartesian) for operators/temporal.py."""

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from vectortiles_spark.operators.temporal import asof_join, interval_join

T0 = datetime(2024, 1, 1)


def _ts(s: float) -> datetime:
    return T0 + timedelta(seconds=s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ------------------------------ asof_join ------------------------------


def _brute_asof(left, right, tol=None):
    """left: (id, key, t); right: (key, t, v) -> {id: (rt, v) | None}."""
    out = {}
    for lid, lk, lt in left:
        best = None
        for rk, rt, rv in right:
            if rk == lk and rt <= lt and (best is None or rt > best[0]):
                best = (rt, rv)
        if best is not None and tol is not None and (lt - best[0]).total_seconds() > tol:
            best = None
        out[lid] = best
    return out


def _run_asof(spark, left, right, tol=None):
    ldf = _mk(spark, [Row(id=i, k=k, ts=t) for i, k, t in left],
              "id long, k long, ts timestamp")
    rdf = _mk(spark, [Row(k=k, ts=t, v=v) for k, t, v in right],
              "k long, ts timestamp, v double")
    got = asof_join(ldf, rdf, on="ts", by=["k"], value_cols=["v"],
                    tolerance_s=tol).collect()
    for r in got:  # a nulled match must null ts AND values together
        assert (r.ts_right is None) == (r.v_right is None), r
    return {r.id: (None if r.ts_right is None else (r.ts_right, r.v_right))
            for r in got}


def test_asof_basic_backward_match(spark):
    left = [(1, 10, _ts(100)), (2, 10, _ts(50)), (3, 20, _ts(100))]
    right = [(10, _ts(40), 1.0), (10, _ts(99), 2.0), (20, _ts(101), 3.0)]
    got = _run_asof(spark, left, right)
    assert got == {
        1: (_ts(99), 2.0),   # most recent prior, not just any prior
        2: (_ts(40), 1.0),
        3: None,             # key 20's only right row is in the future
    }


def test_asof_exact_tie_is_inclusive(spark):
    got = _run_asof(spark, [(1, 5, _ts(100))], [(5, _ts(100), 7.0)])
    assert got == {1: (_ts(100), 7.0)}


def test_asof_tolerance_nulls_but_keeps_row(spark):
    """Tolerance is inclusive (pandas merge_asof / the DuckDB twin): a gap
    strictly over it nulls the match columns, the left row survives."""
    left = [(1, 5, _ts(1000)), (2, 5, _ts(130))]  # gaps: 900s and 30s
    right = [(5, _ts(100), 7.0)]
    got = _run_asof(spark, left, right, tol=60)
    assert got == {1: None, 2: (_ts(100), 7.0)}
    got = _run_asof(spark, left, right, tol=30.0)  # gap == tol: inclusive
    assert got == {1: None, 2: (_ts(100), 7.0)}
    got = _run_asof(spark, left, right, tol=29.9)
    assert got == {1: None, 2: None}
    got = _run_asof(spark, left, right, tol=900)
    assert got == {1: (_ts(100), 7.0), 2: (_ts(100), 7.0)}


def test_asof_keys_never_cross(spark):
    got = _run_asof(spark, [(1, 1, _ts(100))], [(2, _ts(50), 9.0)])
    assert got == {1: None}


def test_asof_suffix_collision_raises(spark):
    ldf = _mk(spark, [Row(id=1, k=1, ts=_ts(0), v_right=0.0)],
              "id long, k long, ts timestamp, v_right double")
    rdf = _mk(spark, [Row(k=1, ts=_ts(0), v=1.0)], "k long, ts timestamp, v double")
    with pytest.raises(ValueError, match="collides"):
        asof_join(ldf, rdf, on="ts", by=["k"], value_cols=["v"])


def test_asof_randomized_vs_brute_force(spark):
    rng = random.Random(42)
    left = [(i, rng.randrange(4), _ts(rng.randrange(0, 5000)))
            for i in range(120)]
    # unique (key, ts) on the right, as the contract requires
    seen, right = set(), []
    while len(right) < 60:
        k, t = rng.randrange(4), rng.randrange(0, 5000)
        if (k, t) not in seen:
            seen.add((k, t))
            right.append((k, _ts(t), float(rng.randrange(1000))))
    for tol in (None, 300):
        got = _run_asof(spark, left, right, tol=tol)
        want = _brute_asof([(i, k, t) for i, k, t in left],
                           [(k, t, v) for k, t, v in right], tol=tol)
        assert got == want


def test_asof_single_exchange_plan(spark):
    """The union+window formulation must cost exactly ONE shuffle (on the
    key) — no join node, no second exchange."""
    ldf = _mk(spark, [Row(id=1, k=1, ts=_ts(0))], "id long, k long, ts timestamp")
    rdf = _mk(spark, [Row(k=1, ts=_ts(0), v=1.0)], "k long, ts timestamp, v double")
    plan = asof_join(ldf, rdf, on="ts", by=["k"], value_cols=["v"])
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange") == 1, phys
    assert "Join" not in phys, phys


# ---------------------------- interval_join ----------------------------


def _brute_interval(points, intervals):
    """points: (id, t); intervals: (wid, s, e) half-open."""
    return sorted(
        (pid, wid)
        for pid, t in points
        for wid, s, e in intervals
        if s <= t < e
    )


def _run_interval(spark, points, intervals, bin_s):
    pdf = _mk(spark, [Row(id=i, ts=t) for i, t in points], "id long, ts timestamp")
    idf = _mk(spark, [Row(wid=w, s=s, e=e) for w, s, e in intervals],
              "wid long, s timestamp, e timestamp")
    got = interval_join(pdf, idf, ts_col="ts", start_col="s", end_col="e",
                        bin_s=bin_s)
    return sorted((r.id, r.wid) for r in got.collect())


def test_interval_half_open_boundaries(spark):
    ivs = [(1, _ts(100), _ts(200))]
    pts = [(1, _ts(100)), (2, _ts(199)), (3, _ts(200)), (4, _ts(99))]
    # start inclusive, end exclusive
    assert _run_interval(spark, pts, ivs, bin_s=50) == [(1, 1), (2, 1)]


def test_interval_spanning_many_bins_matches_once(spark):
    """An interval covering many bins must pair with a point exactly once
    (a point has one bin), even when the interval explodes to 20 bins."""
    ivs = [(7, _ts(0), _ts(1000))]
    pts = [(i, _ts(i * 100 + 1)) for i in range(10)]
    got = _run_interval(spark, pts, ivs, bin_s=50)
    assert got == [(i, 7) for i in range(10)]


def test_interval_randomized_vs_brute_force(spark):
    rng = random.Random(7)
    pts = [(i, _ts(rng.randrange(0, 2000))) for i in range(150)]
    ivs = [
        (w, _ts(s), _ts(s + rng.randrange(1, 400)))
        for w in range(25)
        for s in [rng.randrange(0, 2000)]
    ]
    for bin_s in (30.0, 128.0, 1000.0):
        assert _run_interval(spark, pts, ivs, bin_s=bin_s) == _brute_interval(pts, ivs)


def test_interval_join_is_equi_join_not_cartesian(spark):
    pdf = _mk(spark, [Row(id=1, ts=_ts(0))], "id long, ts timestamp")
    idf = _mk(spark, [Row(wid=1, s=_ts(0), e=_ts(10))],
              "wid long, s timestamp, e timestamp")
    plan = interval_join(pdf, idf, ts_col="ts", start_col="s", end_col="e",
                         bin_s=10)
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in phys and "NestedLoop" not in phys, phys


def test_asof_reserved_names_raise(spark):
    bad = _mk(spark, [Row(id=1, k=1, ts=_ts(0), __asof_tag=1)],
              "id long, k long, ts timestamp, __asof_tag int")
    rdf = _mk(spark, [Row(k=1, ts=_ts(0), v=1.0)], "k long, ts timestamp, v double")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(bad, rdf, on="ts", by=["k"], value_cols=["v"])


def test_interval_shared_column_raises(spark):
    pdf = _mk(spark, [Row(id=1, ts=_ts(0), v=1.0)], "id long, ts timestamp, v double")
    idf = _mk(spark, [Row(wid=1, s=_ts(0), e=_ts(10), v=2.0)],
              "wid long, s timestamp, e timestamp, v double")
    with pytest.raises(ValueError, match="both sides"):
        interval_join(pdf, idf, ts_col="ts", start_col="s", end_col="e", bin_s=10)


def test_asof_matches_pandas_merge_asof(spark):
    """Differential against the canonical semantics implementation:
    pandas merge_asof (backward, inclusive tolerance) on randomized data."""
    import pandas as pd

    rng = random.Random(99)
    left = pd.DataFrame({
        "id": range(200),
        "k": [rng.randrange(5) for _ in range(200)],
        "ts": [_ts(rng.randrange(0, 3000)) for _ in range(200)],
    })
    seen, rrows = set(), []
    while len(rrows) < 80:
        k, t = rng.randrange(5), rng.randrange(0, 3000)
        if (k, t) not in seen:
            seen.add((k, t))
            rrows.append((k, _ts(t), float(rng.randrange(100))))
    right = pd.DataFrame(rrows, columns=["k", "ts", "v"])

    for tol in (None, 250):
        want_df = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts", by="k",
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        )
        want = {
            int(r.id): None if pd.isna(r.v) else float(r.v)
            for r in want_df.itertuples()
        }
        got_rows = asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="ts", by=["k"], value_cols=["v"], tolerance_s=tol,
        ).collect()
        got = {
            int(r.id): None if r.v_right is None else float(r.v_right)
            for r in got_rows
        }
        assert got == want
