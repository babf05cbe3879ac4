"""Mergeable distinct-count sketches: HLL-style registers and a KMV
(k-minimum-values / bottom-k) estimator.

Why these exist: at 100 TB an exact COUNT(DISTINCT x) shuffles every
distinct value; a sketch shuffles bounded state (4096 registers / k
candidate hashes per group) and is mergeable map-side, so the shuffle
payload is independent of row count.  Both sketches here are built on a
SHARED deterministic hash (md5 -> first 15 hex digits -> 60-bit int)
that DuckDB can replay bit-for-bit, so the estimates — not just the row
counts — sit under the exact value oracle:

* register max() is duplicate-insensitive and order-free;
* the HLL harmonic sum is kept in INTEGER space (each register
  contributes 2^(maxrho - rho), summed as BIGINT — exact regardless of
  Spark's partition-order addition) and converted to a double by ONE
  final division, so no float-accumulation-order divergence can leak
  into the value hash;
* KMV needs only the k-th smallest distinct hash — integers throughout,
  one final double division for the estimate.

Reference parity note: the reference engine (fosskers/vectortiles) has
no sketch layer; this module is part of the training-pipeline charter
(SURVEY.md "beyond the reference" ops), with DuckDB as the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex digits of md5 — fits a signed 64-bit int
_HASH_SCALE = float(1 << HASH_BITS)


def hash60(col: Column) -> Column:
    """md5(value-as-string) -> first 15 hex digits -> non-negative 60-bit
    BIGINT.  The exact DuckDB twin is ``('0x' || substr(md5(x::VARCHAR),
    1, 15))::BIGINT`` (see :func:`duck_hash60`)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def duck_hash60(expr: str) -> str:
    """The DuckDB SQL twin of :func:`hash60` over a SQL expression."""
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"


# ------------------------------- HLL -------------------------------


def hll_registers(df: DataFrame, col: str, by: list[str], b: int = 12) -> DataFrame:
    """Per-group HLL registers: split the 60-bit hash into a ``b``-bit
    bucket and a (60-b)-bit suffix ``w``; the register value is
    rho = (position of the highest set bit of w, counted from the top)
    + 1, i.e. ``wbits - bitlength(w) + 1`` (``wbits + 1`` when w == 0).

    Output: ``by..., bucket, rho`` — one row per NON-EMPTY bucket.
    max() is duplicate-insensitive, so no pre-distinct is needed (the
    minhash lesson: a distinct here would be a redundant full shuffle).
    Registers merge across shards/time by the same groupBy-max, which is
    what makes the sketch streamable and map-side combinable.
    """
    m = 1 << b
    wbits = HASH_BITS - b
    src = df.select(*by, hash60(F.col(col)).alias("__h"))
    # integer split: pmod keeps the bucket non-negative, `div` is exact
    # 64-bit integer division (a float divide would lose bits past 2^53)
    parts = src.select(
        *by,
        F.pmod(F.col("__h"), F.lit(m)).alias("bucket"),
        F.expr(f"__h div {m}").alias("__w"),
    )
    # bit length via base-2 string length: exact integer/string algebra
    # in both engines (log2() rounding at powers of two is not portable)
    rho = (
        F.when(
            F.col("__w") > 0,
            F.lit(wbits + 1) - F.length(F.conv(F.col("__w").cast("string"), 10, 2)),
        )
        .otherwise(F.lit(wbits + 1))
        .cast("int")
    )
    return (
        parts.select(*by, "bucket", rho.alias("__rho"))
        .groupBy(*by, "bucket")
        .agg(F.max("__rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, by: list[str], b: int = 12) -> DataFrame:
    """Collapse per-group registers into the HLL cardinality estimate.

    The harmonic denominator sum(2^-rho) is computed as the BIGINT
    sum(2^(maxrho-rho)) — every term a power of two, no float addition
    anywhere — then one double division applies alpha_m * m^2.  Empty
    buckets contribute rho=0 (scaled term 2^maxrho each) and drive the
    linear-counting small-range correction E = m*ln(m/V) when
    E <= 2.5m and V > 0 (Flajolet et al. 2007).

    Output: ``by..., hll_est`` (double).
    """
    m = 1 << b
    wbits = HASH_BITS - b
    maxrho = wbits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = float(1 << maxrho)
    per = registers.groupBy(*by).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {maxrho} - rho)")).alias("__s"),
        F.count("*").alias("__np"),
    )
    v = F.lit(m) - F.col("__np")  # empty buckets
    denom = F.col("__s").cast("double") + v.cast("double") * F.lit(scale)
    raw = F.lit(alpha * m * m * scale) / denom
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return per.select(*by, est.alias("hll_est"))


def _d(x: float) -> str:
    """A float literal DuckDB parses as DOUBLE (plain decimals become
    DECIMAL and overflow in products); 17 significant digits round-trip
    the exact IEEE value, matching the Spark side's F.lit(float)."""
    return f"{float(x):.17e}"


def hll_estimate_sql(table_expr: str, col: str, by: list[str], b: int = 12) -> str:
    """DuckDB replay of hll_registers + hll_estimate: returns a SQL
    fragment selecting ``by..., hll_est`` from ``table_expr``."""
    m = 1 << b
    wbits = HASH_BITS - b
    maxrho = wbits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = float(1 << maxrho)
    # numerator alpha * m^2 * scale, pre-multiplied exactly as the Spark
    # side's F.lit(alpha * m * m * scale) computes it
    num = alpha * m * m * scale
    bys = ", ".join(by)
    h = duck_hash60(col)
    raw = f"{_d(num)} / (s::DOUBLE + ({m} - np)::DOUBLE * {_d(scale)})"
    return f"""
WITH __hashed AS (
  SELECT {bys}, {h} AS h FROM {table_expr}
), __parts AS (
  SELECT {bys}, h % {m} AS bucket, h // {m} AS w FROM __hashed
), __regs AS (
  SELECT {bys}, bucket,
         max(CASE WHEN w > 0
             THEN {maxrho} - length(ltrim(bin(w), '0'))
             ELSE {maxrho} END) AS rho
  FROM __parts GROUP BY {bys}, bucket
), __per AS (
  SELECT {bys},
         sum(1::BIGINT << ({maxrho} - rho)) AS s,
         count(*) AS np
  FROM __regs GROUP BY {bys}
)
SELECT {bys},
       CASE WHEN {raw} <= {_d(2.5 * m)} AND ({m} - np) > 0
            THEN {_d(m)} * ln({_d(m)} / ({m} - np)::DOUBLE)
            ELSE {raw}
       END AS hll_est
FROM __per
"""


# ------------------------------- KMV -------------------------------


def kmv_distinct(df: DataFrame, col: str, by: list[str], k: int = 256) -> DataFrame:
    """KMV (bottom-k) distinct estimate per group: with h_k the k-th
    smallest DISTINCT normalized hash, E = (k-1) / (h_k / 2^60); groups
    with fewer than k distinct hashes report the exact distinct count.

    Scale shape: a per-partition partial keeps only the k smallest
    distinct hashes per group (mapInPandas, <= k * n_partitions * groups
    rows survive), so the ONE shuffle moves bounded candidate sets, not
    the full distinct-value stream — the same partial-aggregate shape
    Spark gives groupBy max, applied to an order statistic it can't
    express natively.  The global k-th is then exact because the true
    bottom-k of a union is contained in the union of per-part bottom-ks.

    Output: ``by..., kmv_est`` (double).
    """
    src = df.select(*by, hash60(F.col(col)).alias("__h"))
    schema = src.schema
    bys = list(by)

    def _partial(batches):
        import pandas as pd

        acc: pd.DataFrame | None = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat((acc, pdf), ignore_index=True)
            acc = (
                acc.drop_duplicates()
                .sort_values([*bys, "__h"], kind="stable")
                # dropna=False: pandas silently DROPS null group keys by
                # default, which would lose a null-keyed group's whole
                # candidate set while the SQL twin keeps it
                .groupby(bys, sort=False, dropna=False)
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc

    cand = src.mapInPandas(_partial, schema)
    w = Window.partitionBy(*bys).orderBy("__h")
    ranked = cand.distinct().withColumn("__rn", F.row_number().over(w))
    per = ranked.filter(F.col("__rn") <= k).groupBy(*bys).agg(
        F.max("__rn").alias("__n"),
        F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__hk"),
    )
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("__hk").cast("double") / F.lit(_HASH_SCALE)))
    return per.select(*bys, est.alias("kmv_est"))


def kmv_distinct_sql(table_expr: str, col: str, by: list[str], k: int = 256) -> str:
    """DuckDB replay of kmv_distinct (the partial is an optimization,
    not a semantic: the twin ranks the full distinct hash set)."""
    bys = ", ".join(by)
    h = duck_hash60(col)
    return f"""
WITH __hashed AS (
  SELECT DISTINCT {bys}, {h} AS h FROM {table_expr}
), __ranked AS (
  SELECT {bys}, h, row_number() OVER (PARTITION BY {bys} ORDER BY h) AS rn
  FROM __hashed
), __per AS (
  SELECT {bys}, max(rn) AS n, max(CASE WHEN rn = {k} THEN h END) AS hk
  FROM __ranked WHERE rn <= {k} GROUP BY {bys}
)
SELECT {bys},
       CASE WHEN n < {k} THEN n::DOUBLE
            ELSE {_d(k - 1)} / (hk::DOUBLE / {_d(_HASH_SCALE)})
       END AS kmv_est
FROM __per
"""


# ----------------------- KMV set operations -----------------------


def _bottom_hashes(df: DataFrame, col: str, k: int) -> DataFrame:
    """Global bottom-k distinct hash sketch of one relation's `col`
    values: (__h BIGINT), at most k rows.  Per-partition partials keep
    only k candidates each (the true bottom-k of a union is inside the
    union of per-part bottom-ks), so the one global rank sees at most
    k * n_partitions rows no matter how many input rows there are."""
    src = df.select(hash60(F.col(col)).alias("__h"))

    def _partial(batches):
        import pandas as pd

        acc: pd.DataFrame | None = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat((acc, pdf), ignore_index=True)
            acc = acc.drop_duplicates().nsmallest(k, "__h")
        if acc is not None and len(acc):
            yield acc

    cand = src.mapInPandas(_partial, "__h long").distinct()
    w = Window.orderBy("__h")
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("__h")
    )


def kmv_set_ops(a: DataFrame, b: DataFrame, col: str, k: int = 256) -> DataFrame:
    """KMV set-operation estimates between two corpora's distinct `col`
    values (Beyer et al. 2007, "On Synopses for Distinct Value
    Estimation"): ONE row (ku, n_both, union_est, jaccard_est,
    intersect_est).

    The union's bottom-k is exactly the bottom-k of the two sketches'
    union (the k smallest of A∪B all live in bottomk(A) ∪ bottomk(B)),
    so |A∪B| estimates like any KMV; the fraction of that bottom-k
    present in BOTH sketches is an unbiased Jaccard estimator, and
    |A∩B| ≈ jaccard * |A∪B|.  When the union holds fewer than k
    distinct hashes every set is complete and all three outputs are
    exact.

    Scale shape — this is the contamination-check primitive: comparing
    two 100 TB corpora moves <= 2k BIGINT hashes after the bounded
    per-partition partials; no distinct-join, no value strings on the
    wire.  Integer hash ranks end-to-end; the estimates are single
    IEEE-754 ops over integer-derived doubles, so DuckDB replays the
    VALUES bit-for-bit (kmv_set_ops_sql)."""
    ska = _bottom_hashes(a, col, k)
    skb = _bottom_hashes(b, col, k)
    u = ska.unionByName(skb).distinct()
    w = Window.orderBy("__h")
    uk = (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
    )
    marked = uk.join(
        ska.withColumn("__ina", F.lit(1)), "__h", "left"
    ).join(skb.withColumn("__inb", F.lit(1)), "__h", "left")
    agg = marked.agg(
        F.count("*").alias("ku"),
        F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__hk"),
        F.sum(
            F.when(
                F.col("__ina").isNotNull() & F.col("__inb").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_both"),
    )
    union_est = F.when(F.col("ku") < k, F.col("ku").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("__hk").cast("double") / F.lit(_HASH_SCALE))
    )
    jac = F.col("n_both").cast("double") / F.col("ku").cast("double")
    est = agg.select(
        "ku",
        "n_both",
        union_est.alias("union_est"),
        jac.alias("jaccard_est"),
    )
    return est.select(
        "ku",
        "n_both",
        "union_est",
        "jaccard_est",
        (F.col("jaccard_est") * F.col("union_est")).alias("intersect_est"),
    )


def kmv_set_ops_sql(a_expr: str, b_expr: str, col: str, k: int = 256) -> str:
    """DuckDB replay of kmv_set_ops (the per-partition partial is an
    optimization, not a semantic: the twin ranks full distinct sets)."""
    h = duck_hash60(col)
    return f"""
WITH __ha AS (
  SELECT DISTINCT {h} AS h FROM {a_expr}
), __hb AS (
  SELECT DISTINCT {h} AS h FROM {b_expr}
), __ska AS (
  SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM __ha)
  WHERE rn <= {k}
), __skb AS (
  SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM __hb)
  WHERE rn <= {k}
), __u AS (
  SELECT DISTINCT h FROM (SELECT h FROM __ska UNION ALL SELECT h FROM __skb)
), __uk AS (
  SELECT h, rn FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM __u)
  WHERE rn <= {k}
), __agg AS (
  SELECT count(*) AS ku,
         max(CASE WHEN rn = {k} THEN u.h END) AS hk,
         CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_both
  FROM __uk u
  LEFT JOIN __ska a ON a.h = u.h
  LEFT JOIN __skb b ON b.h = u.h
), __est AS (
  SELECT ku, n_both,
         CASE WHEN ku < {k} THEN ku::DOUBLE
              ELSE {_d(k - 1)} / (hk::DOUBLE / {_d(_HASH_SCALE)})
         END AS union_est,
         n_both::DOUBLE / ku::DOUBLE AS jaccard_est
  FROM __agg
)
SELECT ku, n_both, union_est, jaccard_est,
       jaccard_est * union_est AS intersect_est
FROM __est
"""


# --------------------- histogram quantile sketch ---------------------


def histogram_quantiles(
    df: DataFrame, col: str, by: list[str], width: float, qs: tuple[float, ...]
) -> DataFrame:
    """Mergeable approximate quantiles from a fixed-width histogram:
    ONE groupBy produces bounded (bucket, count) state (like HLL, the
    shuffle payload is independent of row count and merges by adding
    counts), then each requested quantile is linearly interpolated
    inside the bucket containing its target rank.  Error is bounded by
    ``width`` — the caller picks the resolution/state trade-off.

    Rank convention: target = q * n; the selected bucket is the first
    whose cumulative count reaches the target, and the estimate is
    ``bucket_lo + width * (target - cum_before) / bucket_count``.
    Integer counts end-to-end, two float ops at the end — exactly
    replayable in SQL (see :func:`histogram_quantiles_sql`).

    The selected bucket's own count is recovered WITHOUT a self-join:
    cumulative counts increase strictly with bucket, so
    min(cum | cum >= target) is the selected bucket's cum and
    max(cum | cum < target) (0 when absent) is its predecessor —
    their difference is the bucket count.  Everything stays two plain
    aggregations; no join, no second window.

    Output: ``by..., q_<q> for each q`` (doubles).
    """
    buckets = (
        df.select(*by, F.floor(F.col(col) / F.lit(width)).alias("bucket"))
        .groupBy(*by, "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(*by).orderBy("bucket")
    cum = buckets.withColumn("cum", F.sum("cnt").over(w))
    per = cum.groupBy(*by).agg(F.max("cum").alias("__n"))
    joined = cum.join(per, by)
    aggs = []
    for q in qs:
        tgt = F.lit(float(q)) * F.col("__n").cast("double")
        sel_cum = F.min(F.when(F.col("cum").cast("double") >= tgt, F.col("cum")))
        sel_bucket = F.min(F.when(F.col("cum").cast("double") >= tgt, F.col("bucket")))
        prev_cum = F.coalesce(
            F.max(F.when(F.col("cum").cast("double") < tgt, F.col("cum"))), F.lit(0)
        )
        aggs.append(sel_cum.alias(f"__sc_{_qkey(q)}"))
        aggs.append(sel_bucket.alias(f"__sb_{_qkey(q)}"))
        aggs.append(prev_cum.alias(f"__pc_{_qkey(q)}"))
    stats = joined.groupBy(*by, "__n").agg(*aggs)
    out_cols = list(by)
    for q in qs:
        k = _qkey(q)
        tgt = F.lit(float(q)) * F.col("__n").cast("double")
        cnt = (F.col(f"__sc_{k}") - F.col(f"__pc_{k}")).cast("double")
        est = (
            F.col(f"__sb_{k}").cast("double") * F.lit(float(width))
            + F.lit(float(width)) * (tgt - F.col(f"__pc_{k}").cast("double")) / cnt
        )
        out_cols.append(est.alias(f"q_{k}"))
    return stats.select(*out_cols)


def _qkey(q: float) -> str:
    return str(q).replace(".", "_")


def histogram_quantiles_sql(
    table_expr: str, col: str, by: list[str], width: float, qs: tuple[float, ...]
) -> str:
    """DuckDB replay of :func:`histogram_quantiles` (same rank
    convention, same integer cumulative counts, same two float ops)."""
    bys = ", ".join(by)
    sel = [bys]
    for q in qs:
        k = _qkey(q)
        tgt = f"({_d(q)} * n::DOUBLE)"
        sel.append(
            f"(sb_{k}::DOUBLE * {_d(width)} + {_d(width)} * ({tgt} - pc_{k}::DOUBLE)"
            f" / (sc_{k} - pc_{k})::DOUBLE) AS q_{k}"
        )
    agg_terms = []
    for q in qs:
        k = _qkey(q)
        tgt = f"({_d(q)} * n::DOUBLE)"
        agg_terms += [
            f"min(CASE WHEN cum::DOUBLE >= {tgt} THEN cum END) AS sc_{k}",
            f"min(CASE WHEN cum::DOUBLE >= {tgt} THEN bucket END) AS sb_{k}",
            f"coalesce(max(CASE WHEN cum::DOUBLE < {tgt} THEN cum END), 0) AS pc_{k}",
        ]
    return f"""
WITH __b AS (
  SELECT {bys}, CAST(floor({col} / {_d(width)}) AS BIGINT) AS bucket,
         count(*) AS cnt
  FROM {table_expr} GROUP BY {bys}, bucket
), __c AS (
  SELECT {bys}, bucket, cnt,
         sum(cnt) OVER (PARTITION BY {bys} ORDER BY bucket)::BIGINT AS cum
  FROM __b
), __n AS (
  SELECT {bys}, max(cum) AS n FROM __c GROUP BY {bys}
), __s AS (
  SELECT {bys}, n, {", ".join(agg_terms)}
  FROM __c JOIN __n USING ({bys}) GROUP BY {bys}, n
)
SELECT {", ".join(sel)} FROM __s
"""


# --------------------------- count-min sketch ---------------------------


def cms_counts(
    df: DataFrame, col: str, by: list[str], d: int = 4, w: int = 1024
) -> DataFrame:
    """Count-min sketch per group: ``d`` md5-derived hash rows map each
    value into ``w`` buckets; the sketch is the (row, bucket) -> count
    table — bounded d*w INTEGER state per group, mergeable by adding
    counts (map-side combinable, streamable), the classic bounded-memory
    frequency structure for unbounded vocabularies (Cormode &
    Muthukrishnan 2005).  Only non-empty buckets are materialized.

    Output: ``by..., cms_row, cms_bucket, cnt``.
    """
    if d < 1 or w < 2:
        raise ValueError(f"cms needs d >= 1, w >= 2; got d={d}, w={w}")
    rows = []
    v = F.col(col).cast("string")
    for j in range(d):
        rows.append(
            F.struct(
                F.lit(j).alias("cms_row"),
                F.pmod(hash60(F.concat(v, F.lit(f"#cms{j}"))), F.lit(w)).alias(
                    "cms_bucket"
                ),
            )
        )
    exploded = df.select(*by, F.explode(F.array(*rows)).alias("rb")).select(
        *by, "rb.cms_row", "rb.cms_bucket"
    )
    return exploded.groupBy(*by, "cms_row", "cms_bucket").agg(
        F.count("*").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame, items: DataFrame, col: str, by: list[str], d: int = 4, w: int = 1024
) -> DataFrame:
    """Point-query the sketch: for every (group, item) row in ``items``,
    est = min over the d hash rows of that bucket's counter (absent
    bucket = 0 — can only happen for items never inserted).  The CMS
    guarantee est >= true always holds; collisions only ever inflate.
    Integer arithmetic end-to-end, so estimates replay exactly in SQL.

    Output: ``items.columns..., cms_est``.
    """
    rows = []
    v = F.col(col).cast("string")
    for j in range(d):
        rows.append(
            F.struct(
                F.lit(j).alias("cms_row"),
                F.pmod(hash60(F.concat(v, F.lit(f"#cms{j}"))), F.lit(w)).alias(
                    "cms_bucket"
                ),
            )
        )
    probes = items.select(*items.columns, F.explode(F.array(*rows)).alias("rb")).select(
        *items.columns, "rb.cms_row", "rb.cms_bucket"
    )
    joined = probes.join(sketch, [*by, "cms_row", "cms_bucket"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy(*items.columns).agg(F.min("cnt").alias("cms_est"))


def cms_sql_hash(value_expr: str, j: int, w: int) -> str:
    """The DuckDB twin of one CMS bucket hash."""
    inner = "CAST(" + value_expr + " AS VARCHAR) || '#cms" + str(j) + "'"
    return f"({duck_hash60(inner)} % {w})"
