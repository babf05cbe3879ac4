"""Distinct-count sketches: brute-force md5 replication of the register
and bottom-k maths, estimate accuracy bounds, duplicate-insensitivity,
and the partial-bottom-k == global-kth invariant (operators/sketches.py)."""

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from vectortiles_spark.operators.sketches import (
    HASH_BITS,
    hash60,
    hll_estimate,
    hll_registers,
    kmv_distinct,
)


def _h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _brute_registers(values, b):
    m, wbits = 1 << b, HASH_BITS - b
    regs = {}
    for v in values:
        h = _h60(v)
        bucket, w = h % m, h // m
        rho = (wbits + 1) - w.bit_length() if w > 0 else wbits + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _brute_hll(values, b):
    m, wbits = 1 << b, HASH_BITS - b
    regs = _brute_registers(values, b)
    scale = float(1 << (wbits + 1))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(1 << ((wbits + 1) - r) for r in regs.values())
    v_empty = m - len(regs)
    raw = (alpha * m * m * scale) / (float(s) + v_empty * scale)
    if raw <= 2.5 * m and v_empty > 0:
        return m * math.log(m / float(v_empty))
    return raw


def _brute_kmv(values, k):
    hs = sorted({_h60(v) for v in values})
    if len(hs) < k:
        return float(len(hs))
    return (k - 1) / (hs[k - 1] / float(1 << HASH_BITS))


def test_hash60_matches_python_md5(spark):
    vals = [0, 1, 42, -7, 123456789]
    df = spark.createDataFrame([Row(x=v) for v in vals], "x long")
    got = {r.x: r.h for r in df.select("x", hash60(F.col("x")).alias("h")).collect()}
    assert got == {v: _h60(v) for v in vals}


def test_registers_match_brute_force(spark):
    vals = list(range(500))
    df = spark.createDataFrame([Row(g="a", x=v) for v in vals], "g string, x long")
    got = {
        r.bucket: r.rho
        for r in hll_registers(df, "x", ["g"], b=6).collect()
    }
    assert got == _brute_registers(vals, 6)


@pytest.mark.parametrize("b", [6, 10])
def test_hll_estimate_matches_brute_force_exactly(spark, b):
    """Same integer register sums + the same single float division ->
    the Spark estimate equals the Python replay bit-for-bit."""
    rows = [Row(g="a", x=v) for v in range(3000)] + [
        Row(g="b", x=v) for v in range(40)  # small group: ln correction path
    ]
    df = spark.createDataFrame(rows, "g string, x long")
    est = {
        r.g: r.hll_est
        for r in hll_estimate(hll_registers(df, "x", ["g"], b=b), ["g"], b=b).collect()
    }
    assert est["a"] == _brute_hll(range(3000), b)
    assert est["b"] == _brute_hll(range(40), b)


def test_hll_duplicate_insensitive(spark):
    ones = spark.createDataFrame([Row(g="a", x=v) for v in range(200)],
                                 "g string, x long")
    dups = ones.union(ones).union(ones)
    b = 8
    e1 = hll_estimate(hll_registers(ones, "x", ["g"], b=b), ["g"], b=b).collect()
    e3 = hll_estimate(hll_registers(dups, "x", ["g"], b=b), ["g"], b=b).collect()
    assert e1[0].hll_est == e3[0].hll_est


def test_hll_accuracy_within_theory(spark):
    """Relative error should land well inside ~3 sigma of 1.04/sqrt(m)."""
    n, b = 20000, 10
    df = spark.createDataFrame([Row(g="a", x=v) for v in range(n)],
                               "g string, x long")
    est = hll_estimate(hll_registers(df, "x", ["g"], b=b), ["g"], b=b).collect()[0]
    assert abs(est.hll_est / n - 1.0) < 3 * 1.04 / math.sqrt(1 << b)


def test_kmv_matches_brute_force_exactly(spark):
    rows = [Row(g="a", x=v) for v in range(5000)] + [
        Row(g="b", x=v) for v in range(10)  # below k: exact-count path
    ]
    # duplicates must not perturb the k-th distinct hash
    df = spark.createDataFrame(rows + rows[:100], "g string, x long")
    got = {r.g: r.kmv_est for r in kmv_distinct(df, "x", ["g"], k=64).collect()}
    assert got["a"] == _brute_kmv(range(5000), 64)
    assert got["b"] == 10.0
    assert abs(got["a"] / 5000 - 1.0) < 3 * 1.0 / math.sqrt(64)


def test_kmv_partial_is_lossless_across_partitions(spark):
    """The per-partition bottom-k partial must leave the global k-th
    distinct hash intact however rows are distributed."""
    vals = list(range(2000))
    want = _brute_kmv(vals, 32)
    for nparts in (1, 7):
        df = spark.createDataFrame(
            [Row(g="a", x=v) for v in vals], "g string, x long"
        ).repartition(nparts)
        got = kmv_distinct(df, "x", ["g"], k=32).collect()[0].kmv_est
        assert got == want, nparts


# ----------------------- histogram quantiles -----------------------


def _brute_hist_q(values, width, q):
    from collections import Counter

    counts = Counter(int(math.floor(v / width)) for v in values)
    n = sum(counts.values())
    tgt = q * n
    cum = 0
    for b in sorted(counts):
        prev = cum
        cum += counts[b]
        if cum >= tgt:
            return b * width + width * (tgt - prev) / counts[b]
    raise AssertionError("unreachable")


def test_histogram_quantiles_match_brute_force(spark):
    from vectortiles_spark.operators.sketches import histogram_quantiles

    vals = [((i * 7919) % 1000) / 3.0 for i in range(2000)]
    df = spark.createDataFrame([Row(g="a", x=v) for v in vals], "g string, x double")
    got = histogram_quantiles(df, "x", ["g"], width=25.0, qs=(0.5, 0.95)).collect()[0]
    assert got.q_0_5 == _brute_hist_q(vals, 25.0, 0.5)
    assert got.q_0_95 == _brute_hist_q(vals, 25.0, 0.95)


def test_histogram_quantiles_error_bounded_by_width(spark):
    """|sketch - exact| <= width for continuous quantiles (the estimate
    lives inside the bucket containing the target rank)."""
    from vectortiles_spark.operators.sketches import histogram_quantiles

    vals = sorted(((i * 104729) % 100000) / 7.0 for i in range(5000))
    df = spark.createDataFrame([Row(g="a", x=v) for v in vals], "g string, x double")
    for width in (50.0, 500.0):
        got = histogram_quantiles(df, "x", ["g"], width=width, qs=(0.5,)).collect()[0]
        exact = vals[len(vals) // 2]
        assert abs(got.q_0_5 - exact) <= width, (width, got.q_0_5, exact)


def test_histogram_quantiles_state_is_mergeable(spark):
    """Computing the sketch over the union == computing it over shards
    and merging counts (additivity of the (bucket,count) state)."""
    from vectortiles_spark.operators.sketches import histogram_quantiles

    a = [float(v) for v in range(0, 700)]
    b = [float(v) for v in range(300, 1000)]
    df_all = spark.createDataFrame(
        [Row(g="a", x=v) for v in a + b], "g string, x double"
    )
    got = histogram_quantiles(df_all, "x", ["g"], width=100.0, qs=(0.5,)).collect()[0]
    assert got.q_0_5 == _brute_hist_q(a + b, 100.0, 0.5)


def test_kmv_null_group_key_survives_partial(spark):
    """A NULL group key must keep its candidates through the partial
    (pandas groupby drops NaN keys unless dropna=False)."""
    rows = [Row(g=None, x=v) for v in range(500)] + [
        Row(g="a", x=v) for v in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, x long").repartition(5)
    got = {r.g: r.kmv_est for r in kmv_distinct(df, "x", ["g"], k=32).collect()}
    want = _brute_kmv(range(500), 32)
    assert got == {None: want, "a": want}


# --------------------------- count-min sketch ---------------------------


def _brute_cms(values, queries, d, w):
    """Pure-Python CMS replica: build counters, answer point queries."""
    counters = {}
    for v in values:
        for j in range(d):
            b = _h60(f"{v}#cms{j}") % w
            counters[(j, b)] = counters.get((j, b), 0) + 1
    out = {}
    for q in queries:
        out[q] = min(
            counters.get((j, _h60(f"{q}#cms{j}") % w), 0) for j in range(d)
        )
    return out


def test_cms_matches_brute_force_and_guarantee(spark):
    from collections import Counter

    from vectortiles_spark.operators.sketches import cms_counts, cms_estimate

    vals = [f"w{(i * 13) % 40}" for i in range(1000)]
    truth = Counter(vals)
    df = spark.createDataFrame([Row(g="a", x=v) for v in vals], "g string, x string")
    sketch = cms_counts(df, "x", ["g"], d=3, w=16)
    items = spark.createDataFrame(
        [Row(g="a", x=q) for q in ["w0", "w7", "w39", "never-inserted"]],
        "g string, x string",
    )
    got = {
        r.x: r.cms_est
        for r in cms_estimate(sketch, items, "x", ["g"], d=3, w=16).collect()
    }
    want = _brute_cms(vals, list(got), 3, 16)
    assert got == want
    for q, est in got.items():
        assert est >= truth.get(q, 0)  # one-sided guarantee


def test_cms_state_is_mergeable(spark):
    """Sketch(union) == merge of shard sketches by adding counters."""
    from vectortiles_spark.operators.sketches import cms_counts

    a = [Row(g="a", x=f"v{i % 7}") for i in range(100)]
    b = [Row(g="a", x=f"v{i % 11}") for i in range(80)]
    df_all = spark.createDataFrame(a + b, "g string, x string")
    whole = {
        (r.cms_row, r.cms_bucket): r.cnt
        for r in cms_counts(df_all, "x", ["g"], d=2, w=8).collect()
    }
    merged: dict = {}
    for shard in (a, b):
        sdf = spark.createDataFrame(shard, "g string, x string")
        for r in cms_counts(sdf, "x", ["g"], d=2, w=8).collect():
            k = (r.cms_row, r.cms_bucket)
            merged[k] = merged.get(k, 0) + r.cnt
    assert whole == merged


# ------------------------- KMV set operations -------------------------


def _brute_set_ops(va, vb, k):
    """Pure-Python replica of kmv_set_ops over raw value lists."""
    ha = sorted({_h60(v) for v in va})[:k]
    hb = sorted({_h60(v) for v in vb})[:k]
    uk = sorted(set(ha) | set(hb))[:k]
    ku = len(uk)
    n_both = sum(1 for h in uk if h in set(ha) and h in set(hb))
    if ku < k:
        union_est = float(ku)
    else:
        union_est = float(k - 1) / (uk[k - 1] / float(1 << HASH_BITS))
    jac = n_both / ku
    return ku, n_both, union_est, jac, jac * union_est


def test_kmv_set_ops_matches_brute_force(spark):
    from vectortiles_spark.operators.sketches import kmv_set_ops

    va = [f"tok{i}" for i in range(600)]
    vb = [f"tok{i}" for i in range(300, 900)]  # 50% overlap
    a = spark.createDataFrame([Row(v=x) for x in va * 2])  # dup-insensitive
    b = spark.createDataFrame([Row(v=x) for x in vb])
    row = kmv_set_ops(a, b, "v", k=128).collect()[0]
    ku, n_both, ue, je, ie = _brute_set_ops(va, vb, 128)
    assert row["ku"] == ku == 128
    assert row["n_both"] == n_both
    assert row["union_est"] == ue
    assert row["jaccard_est"] == je
    assert row["intersect_est"] == ie
    # accuracy sanity at k=128: truth is |U|=900, J=300/900
    assert abs(row["union_est"] / 900.0 - 1.0) < 0.25
    assert abs(row["jaccard_est"] - 1 / 3) < 0.15


def test_kmv_set_ops_exact_below_k(spark):
    """Union smaller than k => all three outputs are EXACT."""
    from vectortiles_spark.operators.sketches import kmv_set_ops

    va = [f"a{i}" for i in range(40)] + ["shared1", "shared2"]
    vb = [f"b{i}" for i in range(30)] + ["shared1", "shared2"]
    a = spark.createDataFrame([Row(v=x) for x in va])
    b = spark.createDataFrame([Row(v=x) for x in vb])
    row = kmv_set_ops(a, b, "v", k=256).collect()[0]
    assert row["ku"] == 72 and row["n_both"] == 2
    assert row["union_est"] == 72.0
    assert row["jaccard_est"] == 2 / 72
    assert row["intersect_est"] == (2 / 72) * 72.0


def test_kmv_set_ops_partition_invariant(spark):
    """The bounded per-partition partial is lossless: any repartitioning
    yields the identical row."""
    from vectortiles_spark.operators.sketches import kmv_set_ops

    va = [f"x{i}" for i in range(500)]
    vb = [f"x{i}" for i in range(250, 750)]
    a = spark.createDataFrame([Row(v=x) for x in va])
    b = spark.createDataFrame([Row(v=x) for x in vb])
    r1 = kmv_set_ops(a.coalesce(1), b.coalesce(1), "v", k=64).collect()[0]
    r2 = kmv_set_ops(a.repartition(13), b.repartition(7), "v", k=64).collect()[0]
    assert r1 == r2
