"""Deterministic sampling and dataset-split operators for training-data
pipelines.

Everything here is hash-deterministic (md5 of the row id): re-running the
job, changing partitioning, or adding unrelated rows never changes which
rows a group keeps — the property a 100 TB curation pipeline needs so
incremental runs and audits agree. md5 is bit-identical across engines,
which also makes every operator DuckDB-oracle-checkable.

Scale shape: one window (= one shuffle on the group keys) for
sample_per_group; hash_split is a pure projection (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _id_hash(id_col: str):
    """Portable per-row hash: md5 of the id's string form (bit-identical
    in Spark and DuckDB; xxhash64 is faster but engine-local)."""
    return F.md5(F.col(id_col).cast("string"))


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    id_col: str,
) -> DataFrame:
    """Deterministic stratified sample: the first `n` rows of every group,
    ordered by md5(id) — an unbiased-per-group, reproducible pick that is
    stable under repartitioning and append-only growth of OTHER groups.

    One window over the group keys = the same single shuffle a groupBy
    would pay; no driver-side state, no RNG. Returns the sampled rows
    plus their ``sample_rank`` (1-based within the group)."""
    w = Window.partitionBy(*group_cols).orderBy(_id_hash(id_col), F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int],
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: bucket = the id-hash's first 8
    hex chars mod sum(weights); each named split owns a contiguous bucket
    range sized by its weight. A pure projection — rows never move, so at
    10^12 rows the split costs a scan, not a shuffle, and any engine that
    can md5 can reproduce the assignment row-for-row.

    ``weights`` preserves insertion order, e.g. {"train": 98, "val": 1,
    "test": 1} -> buckets 0-97, 98, 99."""
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive: {weights!r}")
    total = sum(weights.values())
    # first 8 hex chars -> BIGINT (the portable-hash recipe used by the
    # dedup oracles); 32 bits is plenty of resolution for split ratios
    bucket = F.pmod(F.conv(F.substring(_id_hash(id_col), 1, 8), 16, 10).cast("bigint"), F.lit(total))
    expr = None
    lo = 0
    for name, wgt in weights.items():
        cond = bucket < F.lit(lo + wgt)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += wgt
    return df.withColumn(split_col, expr)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    by: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    each row draws a deterministic uniform u from md5(id, seed) and gets
    priority ln(u) / w; the k highest-priority rows per group are the
    sample. Inclusion bias follows the weights (the first pick lands on
    row i with probability w_i / sum(w)) while staying hash-deterministic:
    reruns, retries, and repartitioning reproduce the SAME sample — the
    reproducibility a curation pipeline needs when sampling by quality
    score. Changing ``seed`` redraws independently.

    Rows with NULL or non-positive weight are excluded (they cannot carry
    sampling mass). ONE shuffle: the priority is map-side Column math,
    the top-k is a per-group window. Output: the sampled rows plus their
    ``__priority`` is dropped — schema == input schema.
    """
    if k < 1:
        raise ValueError(f"weighted_sample k must be >= 1, got {k}")
    by = by or []
    # u in (0, 1]: (h + 1) / 2^60 with h uniform over [0, 2^60)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))), 1, 15
        ),
        16, 10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    pri = F.log(u) / F.col(weight_col).cast("double")
    src = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    keyed = src.withColumn("__priority", pri)
    w = Window.partitionBy(*by).orderBy(F.desc("__priority"), F.asc(id_col))
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__priority")
    )
