"""Similarity search over embedding columns (array<float>).

Two paths per the engine charter:
* ``cosine_topk`` — exact brute-force baseline: broadcast the (small) query
  set, JVM-side dot products via zip_with/aggregate, per-query top-k window.
* ``lsh_topk`` — the scale path: random-hyperplane (SimHash-for-vectors)
  LSH bucketing; candidates = vectors sharing a bucket in any of B tables;
  exact cosine re-rank on candidates only. Recall vs the exact baseline is
  measured in tests/test_similarity.py.

Plus ``embedding_near_dups``: near-duplicate pairs by cosine >= threshold,
LSH-bucketed so the pair space never goes quadratic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(c):
    return F.sqrt(_dot(c, c))


def _cosine(a, b):
    """Cosine similarity, NULL when either vector has zero norm (undefined;
    NULL sorts last under desc, and ANSI mode would otherwise hard-error
    on the divide)."""
    den = _norm(a) * _norm(b)
    return F.when(den > 0, _dot(a, b) / den)


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    cand_id: str = "vec_id",
    q_emb: str = "q_emb",
    emb: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: candidates stream once past broadcast queries."""
    joined = candidates.crossJoin(F.broadcast(queries)).withColumn(
        "cosine", _cosine(F.col(q_emb), F.col(emb))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(cand_id).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, cand_id, "cosine", "rank")
    )


def _embedding_matrix(col, dim: int | None = None) -> np.ndarray:
    """Arrow batch of array<float> -> (n, d) float64 matrix, with a CLEAR
    contract error for NULL or ragged rows (a bare np.asarray would raise
    an opaque TypeError/ValueError deep inside the executor instead of
    naming the broken input)."""
    vals = list(col)
    if not vals:
        return np.zeros((0, dim or 0), dtype=np.float64)
    lens = set()
    for v in vals:
        if v is None:
            raise ValueError(
                "embedding column contains NULL — similarity operators "
                "require a non-null fixed-length array<float> per row"
            )
        lens.add(len(v))
    if len(lens) != 1 or (dim is not None and lens != {dim}):
        raise ValueError(
            f"embedding column is ragged or mis-sized (lengths {sorted(lens)}, "
            f"expected {dim if dim is not None else 'a single length'})"
        )
    return np.asarray([np.asarray(v, dtype=np.float64) for v in vals])


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 7):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.normal(size=(n_tables, n_bits, dim)).astype(np.float64)


def with_lsh_buckets(
    df: DataFrame, emb: str = "embedding", dim: int = 64,
    n_bits: int = 12, n_tables: int = 4, seed: int = 7,
) -> DataFrame:
    """Add (table_id, bucket) rows: sign-pattern of `n_bits` random
    hyperplane projections per table. Projections are a vectorized pandas
    UDF (one BLAS matmul per Arrow batch — embeddings x planes)."""
    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    pw = np.exp2(np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(col):
        import pandas as pd

        mat = _embedding_matrix(col, dim)
        out = []
        if len(mat):
            # (n, dim) @ (dim, T*bits) -> sign bits -> per-table bucket ids
            proj = mat @ planes.reshape(-1, planes.shape[2]).T
            bits = (proj > 0).reshape(len(mat), n_tables, n_bits)
            ids = (bits * pw).sum(axis=2).astype(np.int64)
            out = list(ids)
        return pd.Series(out)

    tbl = df.withColumn("__buckets", buckets(F.col(emb)))
    return (
        tbl.select("*", F.posexplode("__buckets").alias("table_id", "bucket"))
        .drop("__buckets")
    )


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_bits: int = 10,
    n_tables: int = 6,
    query_id: str = "query_id",
    cand_id: str = "vec_id",
    q_emb: str = "q_emb",
    emb: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on (table_id, bucket), exact re-rank of
    the (small) candidate union. The full candidate table is hashed once;
    at 10^12 scale the bucket join replaces the full cross product.

    `query_id`/`cand_id` must be KEYS (one row per id): the pair dedupe
    runs on ids alone so the rejoin can't collapse duplicate-id rows —
    the same precondition cosine_topk's crossJoin implicitly assumes."""
    qb = with_lsh_buckets(queries, q_emb, dim, n_bits, n_tables)
    cb = with_lsh_buckets(candidates, emb, dim, n_bits, n_tables)
    # dedupe on the ID PAIR only — pushing the embedding arrays (~0.5-1 KB
    # per row) through the distinct's shuffle would move 100x more bytes
    # than the ids; the vectors are joined back after the dedupe (queries
    # re-broadcast, candidates one hash join on cand_id)
    pair_ids = (
        F.broadcast(qb.select(query_id, "table_id", "bucket"))
        .join(cb.select(cand_id, "table_id", "bucket"), ["table_id", "bucket"])
        .select(query_id, cand_id)
        .distinct()
    )
    # pair_ids is bounded by the probe fan-out (queries x buckets), so
    # broadcasting it keeps the big candidate table shuffle-free in the
    # embedding rejoin even when AQE or stats would have picked sort-merge
    cand_pairs = pair_ids.join(
        F.broadcast(queries.select(query_id, q_emb)), query_id
    )
    cand_pairs = F.broadcast(cand_pairs).join(candidates.select(cand_id, emb), cand_id)
    scored = cand_pairs.withColumn("cosine", _cosine(F.col(q_emb), F.col(emb)))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(cand_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, cand_id, "cosine", "rank")
    )


def _centroid_arrays(cent_rows) -> tuple[np.ndarray, np.ndarray]:
    """(ids object-array, unit-row matrix) from (centroid_id, c_emb) rows."""
    ids = np.asarray([r[0] for r in cent_rows], dtype=object)
    mat = np.asarray([np.asarray(r[1], dtype=np.float64) for r in cent_rows])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0  # zero-vector centroid: no NaN cells
    return ids, mat / norms


def ivf_train(
    candidates: DataFrame,
    n_cells: int = 16,
    n_iters: int = 3,
    cand_id: str = "vec_id",
    emb: str = "embedding",
    round_dp: int | None = None,
) -> list:
    """Spark-native k-means refinement of the IVF coarse quantizer:
    start from the deterministic lowest-id seeds and run `n_iters` Lloyd
    iterations — assign every row to its nearest centroid by cosine (the
    same driver-held-matrix batch-matmul as ivf_assign, zero shuffle on
    the candidate side), then re-center each cell as the normalized mean
    of its members (posexplode -> groupBy(cell, pos): ONE n_cells x dim
    shuffle per iteration, collected to the driver where the quantizer
    lives). Empty cells keep their previous centroid. ``round_dp`` rounds
    each re-centered unit component to that many decimals: the per-cell
    float sums arrive in nondeterministic partition order, so rounding
    makes the trained quantizer bit-stable across re-executions (and
    replayable by an external engine summing in a different order).
    Returns
    (centroid_id, c_emb) rows in the ivf_assign centroid shape, keeping
    the seed ids as labels so downstream id typing is unchanged."""
    seed = (
        candidates.select(F.col(cand_id).alias("centroid_id"), F.col(emb).alias("c_emb"))
        .orderBy("centroid_id")
        .limit(n_cells)
        .collect()
    )
    if not seed:
        return seed
    ids = [r.centroid_id for r in seed]
    _, unit = _centroid_arrays(seed)
    for _ in range(max(0, n_iters)):
        cent_unit = unit  # rebind for closure capture by value-at-iteration

        @F.pandas_udf("int")
        def cell_of(col):
            import pandas as pd

            if not len(col):
                return pd.Series([], dtype="int32")
            mat = _embedding_matrix(col)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            return pd.Series(np.argmax((mat / norms) @ cent_unit.T, axis=1))

        # spherical k-means update: assignment is cosine over UNIT rows, so
        # the re-center must average unit vectors too (a raw mean lets
        # high-magnitude members dominate the cell). Normalize each member
        # in the posexplode stage, then normalize the mean below.
        row_norm = F.sqrt(
            F.aggregate(
                F.col(emb), F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
            )
        )
        unit_emb = F.transform(
            F.col(emb),
            lambda x: x.cast("double")
            / F.when(row_norm > 0.0, row_norm).otherwise(F.lit(1.0)),
        )
        stats = (
            candidates.select(cell_of(F.col(emb)).alias("cell"), unit_emb.alias(emb))
            .select("cell", F.posexplode(F.col(emb)).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum(F.col("val").cast("double")).alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = unit.copy()
        acc = {}
        for r in stats:
            acc.setdefault(r.cell, np.zeros(unit.shape[1]))[r.pos] = r.s / r.n
        for cell, mean in acc.items():
            nrm = float(np.linalg.norm(mean))
            if nrm > 0:
                unit_mean = mean / nrm
                new[cell] = (
                    np.round(unit_mean, round_dp) if round_dp is not None else unit_mean
                )
        unit = new
    return [(ids[i], [float(v) for v in unit[i]]) for i in range(len(ids))]


def ivf_assign(
    candidates: DataFrame,
    n_cells: int = 16,
    cand_id: str = "vec_id",
    emb: str = "embedding",
    centroids: list | None = None,
) -> tuple[DataFrame, list]:
    """IVF coarse-quantizer step, standalone: assign every candidate row to
    its nearest seed centroid by cosine (argmax ties break to the lowest
    centroid id). Returns ``(assigned_df, cent_rows)`` where assigned_df is
    ``candidates.select(cand_id, emb)`` plus a ``centroid_id`` column and
    cent_rows are the collected ``(centroid_id, c_emb)`` seed rows — reuse
    them for probe-side work so a nondeterministic source can't yield a
    different centroid set on re-execution.

    Scale shape: centroids live on the DRIVER (a coarse quantizer is tiny
    by definition) and ride to executors inside the assignment UDF closure;
    each candidate row computes its argmax cell with one BLAS matmul per
    Arrow batch — ZERO shuffle and zero row amplification on the big side.
    """
    if centroids is not None:
        # caller-supplied quantizer (e.g. ivf_train output): same
        # (centroid_id, c_emb) row shape as the seed path
        cent_rows = list(centroids)
    else:
        # deterministic seed centroids (every candidate table has >= n_cells
        # rows in practice; tiny driver-side collect, ordered so np.argmax's
        # first-max tie-break equals (sim desc, centroid_id asc))
        cent = (
            candidates.select(
                F.col(cand_id).alias("centroid_id"), F.col(emb).alias("c_emb")
            )
            .orderBy("centroid_id")
            .limit(n_cells)
        )
        cent_rows = cent.collect()
    if not cent_rows:
        return candidates.select(cand_id, emb).limit(0).withColumn(
            "centroid_id", F.lit(None).cast(candidates.schema[cand_id].dataType)
        ), cent_rows
    # ids may be any type (string keys included): carry them as an object
    # array and type the UDF from the candidate schema
    id_type = candidates.schema[cand_id].dataType
    cent_ids, cent_unit = _centroid_arrays(cent_rows)

    @F.pandas_udf(id_type)
    def assign_cell(col):
        import pandas as pd

        if not len(col):
            return pd.Series([], dtype=object)
        mat = _embedding_matrix(col)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        sims = (mat / norms) @ cent_unit.T  # (batch, n_cells)
        return pd.Series(cent_ids[np.argmax(sims, axis=1)])

    assigned = candidates.select(
        cand_id, emb, assign_cell(F.col(emb)).alias("centroid_id")
    )
    return assigned, cent_rows


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    query_id: str = "query_id",
    cand_id: str = "vec_id",
    q_emb: str = "q_emb",
    emb: str = "embedding",
    train_iters: int = 0,
    train_round_dp: int | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: partition candidates into `n_cells`
    Voronoi cells, probe the `nprobe` nearest cells per query,
    exact-cosine re-rank inside. ``train_iters=0`` uses deterministic
    seed centroids (the n_cells lowest-id candidates — k-means-free IVF
    baseline); ``train_iters>0`` refines them with that many Lloyd
    iterations first (:func:`ivf_train` — measured recall at equal
    nprobe improves on clustered data, tests/test_similarity.py).

    Assignment is :func:`ivf_assign` (driver-held centroids, batch-matmul
    pandas UDF, zero shuffle on the candidate side — the previous
    crossJoin+window argmax materialized n x n_cells rows and full-shuffled
    them). The only shuffle left is the final per-query top-k. At 10^12
    vectors this is the classic coarse-quantizer layout."""
    if train_iters > 0 and not candidates.isStreaming:
        # training runs train_iters + 2 separate jobs over the candidate
        # table (seed collect, one stats collect per Lloyd iteration, the
        # final assignment scan); without a materialization each job
        # re-reads and re-shuffles the source (measured 8.5 executor-CPU-s
        # PER iteration just re-deriving the input at bench scale). One
        # block write amortizes all of them; only taken when training is
        # requested, so the plain nprobe path never pays the storage.
        candidates = candidates.localCheckpoint(eager=True)
    trained = (
        ivf_train(candidates, n_cells, train_iters, cand_id, emb, round_dp=train_round_dp)
        if train_iters > 0
        else None
    )
    assigned, cent_rows = ivf_assign(candidates, n_cells, cand_id, emb, centroids=trained)
    if not cent_rows:
        # empty candidate table: empty result with the usual schema
        return queries.select(F.col(query_id)).limit(0).select(
            query_id,
            F.lit(None).cast(candidates.schema[cand_id].dataType).alias(cand_id),
            F.lit(None).cast("double").alias("cosine"),
            F.lit(None).cast("int").alias("rank"),
        )
    # probes use the SAME collected centroid rows as the assignment UDF —
    # re-executing the seed select against a nondeterministic candidates
    # source (sample(), rand() filters) could yield a different centroid
    # set and orphan probe cells no candidate was assigned to
    cent_schema = T.StructType(
        [
            T.StructField("centroid_id", candidates.schema[cand_id].dataType),
            T.StructField("c_emb", candidates.schema[emb].dataType),
        ]
    )
    cent_local = queries.sparkSession.createDataFrame(cent_rows, schema=cent_schema)
    w_probe = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col("centroid_id").asc())
    probes = (
        queries.crossJoin(F.broadcast(cent_local))
        .withColumn("sim", _cosine(F.col(q_emb), F.col("c_emb")))
        .withColumn("__r", F.row_number().over(w_probe))
        .filter(F.col("__r") <= nprobe)
        .select(query_id, q_emb, "centroid_id")
    )
    cand_pairs = F.broadcast(probes).join(assigned, "centroid_id").select(
        query_id, q_emb, cand_id, emb
    )
    scored = cand_pairs.withColumn(
        "cosine", _cosine(F.col(q_emb), F.col(emb))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(cand_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, cand_id, "cosine", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_bits: int = 14,
    n_tables: int = 8,
    id_col: str = "vec_id",
    emb: str = "embedding",
    bucket_cap: int = 1000,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) via LSH-bucketed
    self-join + exact verification. High-threshold pairs collide in some
    table with probability (1 - acos(cos)/pi)^bits per table.

    `id_col` must be a KEY (one row per id): pair dedupe runs on the id
    pair alone, so duplicate-id input rows would re-multiply after the
    embedding rejoin instead of collapsing.

    ``bucket_cap`` bounds degenerate hot buckets exactly like the dedup
    operators' _cap_buckets: a mass-duplicated embedding (a failed
    encoder emitting one constant vector) lands every row in the same
    bucket of every table and would otherwise go quadratic in the
    self-join; the deterministic first-cap keeps any bucket's pair count
    <= cap^2 while an honest near-dup cluster still surfaces through its
    first `cap` members (exact dedup catches the identical mass)."""
    from .dedup import _cap_buckets

    base = df.select(id_col, emb)
    b = with_lsh_buckets(base, emb, dim, n_bits, n_tables).select(
        id_col, "table_id", "bucket"
    )
    b = _cap_buckets(b, ["table_id", "bucket"], bucket_cap, order_col=id_col)
    left = b.alias("a")
    right = b.alias("b")
    # ids-only through the bucket join + distinct (vectors would multiply
    # the shuffled bytes ~100x); embeddings rejoin after the dedupe
    pair_ids = (
        left.join(
            right,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    cand = pair_ids.join(
        base.select(F.col(id_col).alias("id_a"), F.col(emb).alias("emb_a")), "id_a"
    ).join(
        base.select(F.col(id_col).alias("id_b"), F.col(emb).alias("emb_b")), "id_b"
    )
    scored = cand.withColumn(
        "cosine", _cosine(F.col("emb_a"), F.col("emb_b"))
    )
    return (
        scored.filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# Product quantization (PQ): compress embeddings to m byte-codes, search
# with asymmetric distance computation (ADC). The memory story at 10^12
# vectors: a 64-dim float32 embedding is 256 bytes; its PQ code is m bytes
# (m=4 here), so the searchable relation shrinks ~64x and the scan feeds
# from codes only — the raw vectors never move after encoding.


def _sub_slice(col, s: int, d_sub: int):
    """Columns for subspace s: elements [s*d_sub, (s+1)*d_sub) as double."""
    return F.transform(
        F.slice(col, s * d_sub + 1, d_sub), lambda x: x.cast("double")
    )


def _seq_dot(a: list, b: list) -> float:
    """Sequential left-fold float64 dot — the exact op order of Spark's
    aggregate(zip_with(...)) and DuckDB's list_dot_product, so a value
    computed here on the driver is bit-identical to both engines."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _argmin_code(sub_col, codebook_s: list[list[float]]):
    """Column: index of the nearest codeword (L2) for one subspace.

    The comparison key is ||c||^2 - 2<e,c> (monotone in L2^2, independent
    of ||e||^2), with both dots as SEQUENTIAL folds so an external engine
    can replay the argmin bit-for-bit. Ties take the lowest code id
    (array_position returns the first minimum)."""
    keys = F.array(*[
        F.lit(_seq_dot(c, c)) - F.lit(2.0) * _dot_lit(sub_col, c)
        for c in codebook_s
    ])
    return (F.array_position(keys, F.array_min(keys)) - 1).cast("int")


def _dot_lit(col, lit_vec: list[float]):
    """Sequential-fold dot of an array column with a literal vector."""
    return F.aggregate(
        F.zip_with(col, F.array(*[F.lit(float(v)) for v in lit_vec]),
                   lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_train(
    candidates: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    n_iters: int = 1,
    cand_id: str = "vec_id",
    emb: str = "embedding",
    round_dp: int | None = 9,
) -> list[list[list[float]]]:
    """Train PQ codebooks: per subspace, k-means over the sub-vectors.
    Seeds are the lowest-id rows' slices (deterministic); each Lloyd
    iteration assigns every row JVM-side (pure Column argmin, zero
    Python) and re-centers as the per-(subspace, code, dim) mean — ONE
    m*k*d_sub-bounded shuffle per iteration, collected to the driver
    where the codebook lives (tiny by definition). Empty codes keep
    their previous codeword. ``round_dp`` rounds the re-centered means
    so nondeterministic partition-order float sums can't leak into the
    codebook (same discipline as ivf_train).

    Returns codebooks[m][k_codes][d_sub] as plain Python floats."""
    first = candidates.select(F.size(emb).alias("d")).first()
    if first is None:
        return []
    dim = int(first.d)
    if dim % m:
        raise ValueError(f"embedding dim {dim} not divisible by m={m}")
    d_sub = dim // m
    seed_rows = (
        candidates.select(cand_id, emb).orderBy(cand_id).limit(k_codes).collect()
    )
    books = [
        [[float(v) for v in r[emb][s * d_sub:(s + 1) * d_sub]] for r in seed_rows]
        for s in range(m)
    ]
    for _ in range(max(0, n_iters)):
        parts = []
        for s in range(m):
            sub = _sub_slice(F.col(emb), s, d_sub)
            parts.append(
                candidates.select(
                    F.lit(s).alias("sub"),
                    _argmin_code(sub, books[s]).alias("code"),
                    F.posexplode(sub).alias("dim", "v"),
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        mean = (
            F.round(F.avg("v"), round_dp) if round_dp is not None else F.avg("v")
        )  # F.round is HALF_UP like DuckDB's round (Python round is banker's)
        stats = df.groupBy("sub", "code", "dim").agg(mean.alias("c")).collect()
        new = [[list(c) for c in b] for b in books]
        for r in stats:
            new[r.sub][r.code][r.dim] = r.c
        books = new
    return books


def pq_encode(
    candidates: DataFrame,
    codebooks: list[list[list[float]]],
    cand_id: str = "vec_id",
    emb: str = "embedding",
) -> DataFrame:
    """(cand_id, code_0..code_{m-1}) — each row's nearest codeword per
    subspace, computed entirely JVM-side (no shuffle, no Python: the
    codebook rides in as literals). At 10^12 rows this is the one full
    scan PQ needs; everything downstream reads m bytes per vector."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    cols = [F.col(cand_id)]
    for s in range(m):
        sub = _sub_slice(F.col(emb), s, d_sub)
        cols.append(_argmin_code(sub, codebooks[s]).alias(f"code_{s}"))
    return candidates.select(*cols)


def pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    query_id: str = "query_id",
    cand_id: str = "vec_id",
    q_emb: str = "q_emb",
    emb: str = "embedding",
    dist_dp: int = 6,
) -> DataFrame:
    """ADC top-k: encode candidates once, build each query's lookup table
    (m x k_codes partial distances ||c||^2 - 2<q_sub,c>, driver-side —
    queries are small by contract and the LUT is tiny), then score every
    candidate as a SUM OF m ARRAY LOOKUPS — no dot products on the scan
    side at all, zero shuffle before the per-query top-k window. The
    reported adc_dist drops the constant ||q||^2 term (rank-neutral).

    LUT entries use the same sequential folds as training, so the whole
    pipeline — codebook, codes, distances, ranks — replays bit-for-bit
    in an external engine (q_pq_topk's DuckDB oracle does exactly that).
    """
    m = len(codebooks)
    codes = pq_encode(candidates, codebooks, cand_id=cand_id, emb=emb)
    q_rows = queries.select(query_id, q_emb).collect()
    lut_rows = []
    for r in q_rows:
        qv = [float(v) for v in r[q_emb]]
        d_sub = len(codebooks[0][0])
        luts = []
        for s in range(m):
            qs = qv[s * d_sub:(s + 1) * d_sub]
            luts.append([
                _seq_dot(c, c) - 2.0 * _seq_dot(qs, c) for c in codebooks[s]
            ])
        lut_rows.append((r[query_id], *luts))
    lut_schema = f"{query_id} long, " + ", ".join(
        f"lut_{s} array<double>" for s in range(m)
    )
    spark = queries.sparkSession
    luts_df = spark.createDataFrame(lut_rows, lut_schema)
    dist = F.element_at(F.col("lut_0"), F.col("code_0") + 1)
    for s in range(1, m):
        dist = dist + F.element_at(F.col(f"lut_{s}"), F.col(f"code_{s}") + 1)
    scored = codes.crossJoin(F.broadcast(luts_df)).withColumn(
        "adc_dist", F.round(dist, dist_dp)
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("adc_dist").asc(), F.col(cand_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, cand_id, "adc_dist", "rank")
    )


def semantic_dedup(
    candidates: DataFrame,
    n_cells: int = 16,
    tau: float = 0.9,
    cand_id: str = "vec_id",
    emb: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-quantize embeddings into ``n_cells`` Voronoi
    cells (:func:`ivf_assign` — driver-held centroids, zero shuffle on the
    big side), then inside each cell mark a vector as a semantic duplicate
    of the corpus if ANY lower-id vector in its cell has cosine > tau.

    The rule is "dominated by any earlier point", not the paper's greedy
    sweep: a dominated point counts as a dominator for later points.
    This makes the output a deterministic function of the row SET (no
    sequential dependency), hence SQL-replayable and partitioning-
    invariant; on clique-shaped duplicates (the common near-copy case)
    it is identical to greedy, on chains it prunes at most as greedy
    would have after one extra pass.

    Scale shape: the only shuffle is the within-cell self-join keyed on
    the cell id; pair count is sum(|cell|^2), which the coarse quantizer
    exists to bound — size n_cells so cells fit the executor (the paper
    uses ~50k cells at 10^9 scale). Cosines are JVM sequential folds
    (zip_with/aggregate), bit-identical to DuckDB's list_dot_product, so
    is_dup/dup_of/max_sim carry zero cross-engine flip risk.

    Returns one row per candidate: (cand_id, cell, is_dup, dup_of,
    max_sim) — dup_of = lowest dominating id (NULL when none), max_sim =
    best earlier-id cosine in the cell (NULL when the vector is its
    cell's lowest id).
    """
    if not 0.0 < tau < 1.0:
        raise ValueError(f"tau must be in (0, 1), got {tau}")
    assigned, _cents = ivf_assign(
        candidates, n_cells=n_cells, cand_id=cand_id, emb=emb,
        centroids=centroids,
    )
    a = assigned.select(
        F.col("centroid_id").alias("cell"),
        F.col(cand_id).alias("__i"), F.col(emb).alias("__va"),
    )
    b = assigned.select(
        F.col("centroid_id").alias("cell"),
        F.col(cand_id).alias("__j"), F.col(emb).alias("__vb"),
    )
    pairs = a.join(b, "cell").filter(F.col("__i") < F.col("__j"))
    sims = pairs.select(
        "cell", "__j",
        F.col("__i"), _cosine(F.col("__va"), F.col("__vb")).alias("__sim"),
    )
    dom = sims.groupBy("__j").agg(
        F.max("__sim").alias("max_sim"),
        F.min(F.when(F.col("__sim") > tau, F.col("__i"))).alias("dup_of"),
    )
    return (
        assigned.select(F.col(cand_id), F.col("centroid_id").alias("cell"))
        .join(dom.withColumnRenamed("__j", cand_id), cand_id, "left")
        .select(
            cand_id, "cell",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of", "max_sim",
        )
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector integer quantization — the 4x storage/IO
    compression every embedding-serving stack applies before ANN (int8
    codes + one float scale per vector; dequantized error bounded by
    scale/2 per component). PURE Column algebra: no UDF, no shuffle, the
    codes computed inside whole-stage codegen — the quantize stage of a
    10^12-vector pipeline is a free map over the scan.

    Per vector: ``scale = max(|x_i|) / qmax`` (qmax = 2^(bits-1) - 1),
    ``code_i = clip(floor(x_i / scale + 0.5), -qmax, qmax)``. Zero
    vectors quantize to all-zero codes with scale 0 (the internal
    divisor falls back to 1.0 so no NaN is ever produced). Inputs cast
    to double FIRST, so every step is shared-IEEE double arithmetic and
    the whole row — codes, scale, and the max dequantization error —
    replays bit-for-bit in a SQL engine (plans/queries_text.py).

    Output: input columns minus ``vec_col``, plus ``scale`` (double),
    ``codes`` (array<int>), ``n_dims``, and ``max_err`` (double, the
    actual per-vector worst-case |x - code*scale|).
    """
    if not 2 <= bits <= 16:
        raise ValueError(f"bits={bits} outside [2, 16]")
    qmax = float((1 << (bits - 1)) - 1)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    keep = [c for c in df.columns if c != vec_col]
    base = df.select(
        *keep,
        emb.alias("__e"),
        F.array_max(F.transform(emb, lambda x: F.abs(x))).alias("__maxabs"),
    )
    div = F.when(F.col("__maxabs") == 0.0, F.lit(1.0)).otherwise(
        F.col("__maxabs") / F.lit(qmax)
    )
    scale = (F.col("__maxabs") / F.lit(qmax)).alias("scale")
    qmin_i, qmax_i = -int(qmax), int(qmax)
    codes = F.transform(
        F.col("__e"),
        lambda x: F.least(
            F.greatest(F.floor(x / div + F.lit(0.5)), F.lit(qmin_i).cast("bigint")),
            F.lit(qmax_i).cast("bigint"),
        ).cast("int"),
    )
    with_codes = base.select(*keep, "__e", scale, codes.alias("codes"))
    err = F.array_max(
        F.zip_with(
            F.col("__e"),
            F.col("codes"),
            lambda e, c: F.abs(e - c.cast("double") * F.col("scale")),
        )
    )
    return with_codes.select(
        *keep, "scale", "codes",
        F.size("codes").alias("n_dims"),
        err.alias("max_err"),
    )
