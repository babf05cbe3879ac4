"""Training-data pipeline operators over documents/embeddings: dedup,
text analysis, similarity search — each as a Spark implementation + DuckDB
oracle pair (value-checked), per the engine's data-pipeline charter.

Scale notes are in each docstring; the common theme: everything is
expressed as JVM-side Column algebra (split/filter/explode/groupBy), no
Python in the hot path, and every self-join is bucketed by a candidate key
(shingle, band, cell) so the quadratic blow-up never materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import load, widen

_STOP_EN = ("the", "a", "of", "and", "to", "in")
_STOP_DE = ("der", "die", "das", "und", "zu", "ein")
_STOP_FR = ("le", "la", "et", "les", "de", "un")


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents plus a deterministic duplicated shard (ids offset by 10^6) —
    gives exact-dedup something real to find; the oracle builds the same."""
    (docs,) = load(spark, sf_dir, "documents")
    clone = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return docs.unionAll(clone)


_DUP_CORPUS_SQL = """
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars FROM documents
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content fingerprint, keep min doc_id.

    At 100 TB this is the one-shuffle dedup: md5 is computed map-side,
    the groupBy shuffles only (fingerprint, doc_id) pairs — never text."""
    corpus = _dup_corpus(spark, sf_dir)
    return (
        corpus.select(F.md5(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .orderBy("keep_id")
    )


Q_DEDUP_EXACT_SQL = f"""
WITH corpus AS ({_DUP_CORPUS_SQL})
SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies
FROM corpus
GROUP BY md5(text)
ORDER BY keep_id
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + per-source token stats."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens")
    )
    return (
        toks.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source")
    )


Q_TOKEN_COUNT_SQL = r"""
WITH toks AS (
  SELECT source, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
  FROM documents
)
SELECT source, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
       max(n_tokens)::BIGINT AS max_tokens
FROM toks GROUP BY source ORDER BY source
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length + stopword-ratio heuristics, bucketed.

    score = 100 * stopword_tokens / tokens, floored to buckets of 5."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    stop_arr = F.array(*[F.lit(w) for w in _STOP_EN])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    scored = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        n_stop.alias("n_stop_kinds"),
        (F.floor(F.col("n_chars") / 100) * 100).alias("len_bucket"),
    )
    return (
        scored.groupBy("len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.round(F.avg("n_stop_kinds"), 4).alias("avg_stop_kinds"),
        )
        .orderBy("len_bucket")
    )


Q_TEXT_QUALITY_SQL = rf"""
WITH scored AS (
  SELECT doc_id,
         len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens,
         len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')),
                            {list(_STOP_EN)!r})) AS n_stop_kinds,
         cast(floor(n_chars / 100) * 100 AS BIGINT) AS len_bucket
  FROM documents
)
SELECT len_bucket, count(*) AS n_docs,
       round(avg(n_tokens), 4) AS avg_tokens,
       round(avg(n_stop_kinds), 4) AS avg_stop_kinds
FROM scored GROUP BY len_bucket ORDER BY len_bucket
"""


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by stopword-family hits (n-gram heuristic family):
    argmax over per-language distinct-stopword counts, deterministic
    tiebreak en > de > fr."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))

    def hits(words):
        return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))

    scored = docs.select(
        "doc_id", "lang",
        hits(_STOP_EN).alias("s_en"), hits(_STOP_DE).alias("s_de"), hits(_STOP_FR).alias("s_fr"),
    )
    pred = F.when(
        (F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_fr")), F.lit("en")
    ).when(F.col("s_de") >= F.col("s_fr"), F.lit("de")).otherwise(F.lit("fr"))
    return (
        scored.withColumn("lang_pred", pred)
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "lang_pred")
    )


Q_LANGID_SQL = rf"""
WITH scored AS (
  SELECT doc_id, lang,
    len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')), {list(_STOP_EN)!r})) AS s_en,
    len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')), {list(_STOP_DE)!r})) AS s_de,
    len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')), {list(_STOP_FR)!r})) AS s_fr
  FROM documents
), pred AS (
  SELECT lang,
         CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
              WHEN s_de >= s_fr THEN 'de'
              ELSE 'fr' END AS lang_pred
  FROM scored
)
SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY 1, 2 ORDER BY lang, lang_pred
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection by word-3-gram Jaccard over a shingle-bucketed
    self-join: explode distinct shingles, equi-join on shingle (the
    candidate generator — only docs sharing a shingle ever meet), then
    exact Jaccard = |∩| / (|A| + |B| - |∩|) >= 0.2 (low threshold so the
    sf-scaled corpus yields a stable non-trivial pair set).

    This is the scalable exact-Jaccard plan: the join key is the shingle,
    so the shuffle is linear in total shingles, not quadratic in docs."""
    from ..operators.dedup import shingle_arrays

    (docs,) = load(spark, sf_dir, "documents")
    # the SAME shingle construction the dedup operators use (one source
    # of truth — see shingle_arrays for the split-materialization note);
    # <3 tokens -> empty array, matching the oracle's generate_series
    # No size>0 pre-filter and explode_OUTER, deliberately: a pushable
    # size-filter (explicit, or inferred by InferFiltersFromGenerate from
    # a plain explode) inlines the whole shingle construction into a
    # predicate at the scan — rebuilding every doc's array a second time
    # on the raw file's (often single) input partition. Zero-shingle docs
    # are harmless without it: they surface as n_sh=0 rows / one NULL
    # shingle row, contribute no join pairs, and the NULL row is dropped
    # by isNotNull — results are identical (see shingle_docs for the
    # measured 5.6s serial-stage pathology this avoids).
    sh = shingle_arrays(docs, k=3, distinct_in_array=True)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    exploded = sh.select(
        "doc_id", F.explode_outer("shingles").alias("shingle")
    ).filter(F.col("shingle").isNotNull())
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "n_common", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs under the FULL value oracle: the portable
    md5-based shingle hash makes every stage SQL-replayable — 64 universal-
    hash permutations, min-aggregates, 16x4 banding (band collision ==
    "all 4 minhashes equal", which is what the xxhash64 band key encodes),
    signature-agreement estimate, threshold filter."""
    from vectortiles_spark.operators.dedup import minhash_near_dups, portable_hasher

    (docs,) = load(spark, sf_dir, "documents")
    return minhash_near_dups(docs, threshold=0.5, hasher=portable_hasher)


def _minhash_oracle_sql() -> str:
    import inspect

    from vectortiles_spark.operators.dedup import (
        _H,
        _P,
        _ROWS,
        _hash_params,
        minhash_near_dups,
    )

    # read the cap straight off the query path's signature so the oracle
    # can never drift from the Spark-side truncation guard
    _BAND_CAP = inspect.signature(minhash_near_dups).parameters["band_cap"].default
    params = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_hash_params(_H)))
    return rf"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2),
           i -> regexp_split_to_array(lower(trim(text)), '\s+')[i] || ' ' ||
                regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                regexp_split_to_array(lower(trim(text)), '\s+')[i+2]
         )) AS shingles
  FROM documents
), h AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(shingle), 1, 8))::BIGINT & 2147483647 AS h31
  FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE len(shingles) > 0)
), params(i, a, b) AS (
  VALUES {params}
), mh AS (
  SELECT doc_id, i, min((h31 * a + b) % {_P}) AS m
  FROM h CROSS JOIN params GROUP BY doc_id, i
), bands AS (
  -- band bucket = the {_ROWS} minhash values of the band; Spark keys the
  -- bucket by xxhash64 of the same values, so equality matches (modulo
  -- astronomically-unlikely 64-bit collisions, same caveat as before)
  SELECT doc_id, i // {_ROWS} AS band, list(m ORDER BY i) AS key
  FROM mh GROUP BY doc_id, i // {_ROWS}
), capped AS (
  -- mirror of dedup._cap_buckets: only the first band_cap docs (by
  -- doc_id) of any band bucket enter the candidate join, so oracle
  -- parity survives degenerate hot buckets at ANY scale factor
  SELECT doc_id, band, key,
         row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rk
  FROM bands
), collide_pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM capped x JOIN capped y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
  WHERE x.rk <= {_BAND_CAP} AND y.rk <= {_BAND_CAP}
), agree AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         count(*) FILTER (WHERE x.m = y.m) AS agree
  FROM mh x JOIN mh y ON x.i = y.i AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, round(a.agree / {_H}.0, 6) AS est_jaccard
FROM collide_pairs p JOIN agree a USING (doc_a, doc_b)
WHERE round(a.agree / {_H}.0, 6) >= 0.5
ORDER BY doc_a, doc_b
"""


Q_MINHASH_SQL = _minhash_oracle_sql()


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: the minhash pair list collapsed into connected
    components (cluster_id = min doc_id in the component, every doc a
    row, singletons as their own cluster) plus the keep/drop decision a
    dedup pipeline acts on. The component fixpoint is algorithm-
    independent, so the DuckDB oracle can replay it with a recursive CTE
    while Spark runs O(log n)-round pointer-jumping label propagation."""
    from vectortiles_spark.operators.dedup import (
        dedup_clusters,
        minhash_near_dups,
        portable_hasher,
    )

    (docs,) = load(spark, sf_dir, "documents")
    pairs = minhash_near_dups(docs, threshold=0.5, hasher=portable_hasher)
    comp = dedup_clusters(pairs, nodes=docs.select("doc_id"))
    w = Window.partitionBy("cluster_id")
    return (
        comp.withColumn("cluster_size", F.count("*").over(w))
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id", "cluster_id", "cluster_size", "keep")
        .orderBy("doc_id")
    )


def _dedup_clusters_oracle_sql() -> str:
    # the pair list IS Q_MINHASH_SQL (kept in lockstep by construction);
    # min-reachable-label via a recursive CTE: seed every doc with its own
    # id, push labels across (bidirectional) edges, UNION-dedup bounds the
    # walk state at V x V so it terminates, then min() per node = the
    # component's smallest id — the same fixpoint the Spark operator finds
    return f"""
WITH RECURSIVE pairs AS ({Q_MINHASH_SQL}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
), walk(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id
), comp AS (
  SELECT id AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY id
)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       (doc_id = cluster_id) AS keep
FROM comp ORDER BY doc_id
"""


Q_DEDUP_CLUSTERS_SQL = _dedup_clusters_oracle_sql()


def q_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + 16-bit-prefix bucket sizes under the full
    value oracle: with the portable 63-bit token hash, DuckDB replays
    tokenization, per-bit sign sums, fingerprint reassembly, and the
    bucket prefix aggregation bit-for-bit."""
    from vectortiles_spark.operators.dedup import portable_hasher63, simhash_fingerprints

    (docs,) = load(spark, sf_dir, "documents")
    fp = simhash_fingerprints(docs, hasher=portable_hasher63)
    return (
        fp.groupBy(F.shiftrightunsigned(F.col("simhash"), 48).alias("bucket"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bucket")
    )


Q_SIMHASH_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
  FROM documents
), h AS (
  SELECT doc_id,
         (('0x' || substr(md5(t), 1, 8))::BIGINT & 2147483647) * 4294967296
           + ('0x' || substr(md5(t), 9, 8))::BIGINT AS h
  FROM toks WHERE t != ''
), bits AS (
  SELECT doc_id, i,
         sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN generate_series(0, 62) AS g(i)
  GROUP BY 1, 2
), fp AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS simhash
  FROM bits GROUP BY 1
)
SELECT simhash >> 48 AS bucket, count(*) AS n_docs
FROM fp GROUP BY 1 ORDER BY 1
"""


Q_NGRAM_JACCARD_SQL = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2),
           i -> regexp_split_to_array(lower(trim(text)), '\s+')[i] || ' ' ||
                regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                regexp_split_to_array(lower(trim(text)), '\s+')[i+2]
         )) AS shingles
  FROM documents
), sh2 AS (
  SELECT doc_id, shingles FROM sh WHERE len(shingles) > 0
), exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh2
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM exploded a JOIN exploded b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (
  SELECT doc_id, len(shingles) AS n_sh FROM sh2
)
SELECT doc_a, doc_b, n_common,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.2
ORDER BY doc_a, doc_b
"""


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via polynomial rolling hash over token
    hashes: fp = fold(acc*31 + h(token)) mod 2^31-1, with h = first 8 hex
    digits of md5 — every step expressible identically in Spark Column
    algebra and DuckDB list_reduce (md5 is bit-identical across engines)."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * 31 + tok_hash(t), F.lit(2147483647)),
    )
    return docs.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


Q_ROLLING_FP_SQL = r"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
                          t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
         (acc, h) -> (acc * 31 + h) % 2147483647
       ) AS fingerprint
FROM documents ORDER BY doc_id
"""


def q_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization (letter runs / digit runs / single
    punctuation) — the subword-style counter next to whitespace tokens."""
    (docs,) = load(spark, sf_dir, "documents")
    pattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    n_sub = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pattern), F.lit(0)))
    return (
        docs.select("lang", n_sub.alias("n_subtokens"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_subtokens").alias("total_subtokens"),
            F.max("n_subtokens").alias("max_subtokens"),
        )
        .orderBy("lang")
    )


Q_TOKEN_BPE_SQL = r"""
SELECT lang, count(*) AS n_docs,
       sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')))::BIGINT AS total_subtokens,
       max(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')))::BIGINT AS max_subtokens
FROM documents GROUP BY lang ORDER BY lang
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON props column -> typed aggregation."""
    (events,) = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


Q_JSON_PROPS_SQL = """
SELECT event_type, count(*) AS n,
       round(avg((props->>'k')::BIGINT), 4) AS avg_k,
       max((props->>'k')::BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline (SURVEY-charter similarity
    search): 8 query vectors broadcast against all embeddings, dot/norm via
    JVM-side higher-order functions (zip_with + aggregate — no Python),
    top-10 per query via window.

    At scale: the broadcast side is the queries (small); candidates stream;
    the only shuffle is the per-query top-k, which AQE keeps tiny."""
    (emb,) = load(spark, sf_dir, "embeddings")
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    # norms are PRECOMPUTED one-per-row on each side — folding them inside
    # the joined expression would re-run two d-length array folds per
    # (query, candidate) pair instead of (Q + C) total
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm(F.col("embedding")).alias("q_norm"),
    )
    # widen the candidate side before the Q-way fan-out: a single-row-group
    # parquet scans as ONE task, and the |C| x Q dot-product folds would run
    # serially inside it (measured 1.6s wall ~= 1.3s executor CPU at sf1.0);
    # the round-robin exchange of |C| skinny rows is noise next to the folds
    # and a no-op cost at real scale
    par = spark.sparkContext.defaultParallelism
    cand = emb.repartition(par).select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("c_norm")
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "embedding", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    joined = (
        cand.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(dot / (F.col("q_norm") * F.col("c_norm")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


Q_COSINE_TOPK_SQL = """
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT query_id, vec_id,
         round(
           list_dot_product(q_emb::DOUBLE[], embedding::DOUBLE[]) /
           (sqrt(list_dot_product(q_emb::DOUBLE[], q_emb::DOUBLE[])) *
            sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))),
           6) AS cosine
  FROM embeddings CROSS JOIN qs
  WHERE vec_id != query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
ORDER BY query_id, rank
"""


def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer assignment under the value oracle: every
    embedding -> nearest of the 16 seed centroids, via the PRODUCTION
    batch-matmul pandas UDF (ivf_assign — zero shuffle on the candidate
    side), plus the JVM-fold cosine to the assigned centroid.

    Portability: the SQL oracle replays the argmax with DuckDB
    list_dot_product over DOUBLE[]; summation-order noise is ~1e-15 while
    the measured min top-2 cosine gap on the test tables is >=1.1e-5
    (sf0.001/0.01/0.1), so the argmax — and hence the assignment — cannot
    flip between engines on this data."""
    from ..operators.similarity import _cosine, ivf_assign

    from pyspark.sql import types as T

    (emb,) = load(spark, sf_dir, "embeddings")
    cand = emb.select("vec_id", "embedding")
    assigned, cent_rows = ivf_assign(cand, n_cells=16)
    # schema derived from the candidate table (as ivf_topk does) — a
    # hardcoded array<float> would silently down-cast if the table ever
    # became array<double> and diverge from the DOUBLE[] oracle
    cent_schema = T.StructType(
        [
            T.StructField("centroid_id", cand.schema["vec_id"].dataType),
            T.StructField("c_emb", cand.schema["embedding"].dataType),
        ]
    )
    cent_local = spark.createDataFrame(cent_rows, schema=cent_schema)
    return (
        assigned.join(F.broadcast(cent_local), "centroid_id")
        .select(
            "vec_id",
            "centroid_id",
            F.round(_cosine(F.col("embedding"), F.col("c_emb")), 6).alias("cosine"),
        )
        .orderBy("vec_id")
    )


Q_IVF_ASSIGN_SQL = """
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb
  FROM embeddings ORDER BY vec_id LIMIT 16
), scored AS (
  SELECT e.vec_id, c.centroid_id,
         list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[]) /
         (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
          sqrt(list_dot_product(c.c_emb::DOUBLE[], c.c_emb::DOUBLE[]))) AS cos_raw
  FROM embeddings e CROSS JOIN cent c
)
SELECT vec_id, centroid_id, round(cos_raw, 6) AS cosine FROM (
  SELECT vec_id, centroid_id, cos_raw,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos_raw DESC, centroid_id ASC) AS rn
  FROM scored
) WHERE rn = 1
ORDER BY vec_id
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN under the FULL value oracle: 2 Lloyd training
    iterations (spherical k-means, centroids rounded to 9 dp so the
    nondeterministic-partition-order float sums can't leak into the
    quantizer), coarse assignment, nprobe=4 probe, exact cosine top-10.

    Portability: every dot/norm on both engines is a SEQUENTIAL float64
    fold over identical inputs (Spark aggregate/zip_with vs DuckDB
    list_dot_product), so probe sims and final cosines match bit-for-bit;
    the only engine-divergent ops are the trained-centroid means (rounded
    away at 9 dp) and the batch-matmul assignment sums (BLAS vs
    sequential, ~1e-15 noise vs measured >=1e-5 argmax margins). The
    float32 truncation the probe stage inherits from createDataFrame's
    array<float> schema is replayed with an explicit ::FLOAT::DOUBLE
    round-trip in the SQL."""
    from ..operators.similarity import ivf_topk

    (emb,) = load(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # widen before the per-candidate assignment/probe passes: the
    # embeddings parquet is a single row group (serial scan otherwise);
    # the trained-centroid means are rounded to 9 dp by design, so the
    # partition-order change cannot leak into the quantizer
    cand = widen(spark, emb).select("vec_id", "embedding")
    res = ivf_topk(qs, cand, k=10, n_cells=16, nprobe=4, train_iters=2, train_round_dp=9)
    return res.withColumn("cosine", F.round("cosine", 6)).orderBy("query_id", "rank")


Q_IVF_TOPK_SQL = """
WITH seeds AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS c_raw
  FROM embeddings ORDER BY vec_id LIMIT 16
), cent0 AS (
  SELECT centroid_id,
         list_transform(c_raw, x -> x / sqrt(list_dot_product(c_raw, c_raw))) AS c_emb
  FROM seeds
), a1 AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding::DOUBLE[], c.c_emb) DESC,
                      c.centroid_id ASC) AS rn
    FROM embeddings e CROSS JOIN cent0 c
  ) WHERE rn = 1
), u1 AS (
  SELECT cell, generate_subscripts(embedding, 1) AS dim,
         unnest(embedding)::DOUBLE
           / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS v
  FROM a1
), m1 AS (
  SELECT cell, list(c ORDER BY dim) AS m FROM (
    SELECT cell, dim, avg(v) AS c FROM u1 GROUP BY 1, 2
  ) GROUP BY cell
), cent1 AS (
  SELECT c0.centroid_id,
         CASE WHEN m.m IS NULL OR list_dot_product(m.m, m.m) <= 0 THEN c0.c_emb
              ELSE list_transform(m.m, x -> round(x / sqrt(list_dot_product(m.m, m.m)), 9))
         END AS c_emb
  FROM cent0 c0 LEFT JOIN m1 m ON m.cell = c0.centroid_id
), a2 AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding::DOUBLE[], c.c_emb) DESC,
                      c.centroid_id ASC) AS rn
    FROM embeddings e CROSS JOIN cent1 c
  ) WHERE rn = 1
), u2 AS (
  SELECT cell, generate_subscripts(embedding, 1) AS dim,
         unnest(embedding)::DOUBLE
           / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS v
  FROM a2
), m2 AS (
  SELECT cell, list(c ORDER BY dim) AS m FROM (
    SELECT cell, dim, avg(v) AS c FROM u2 GROUP BY 1, 2
  ) GROUP BY cell
), cent2 AS (
  SELECT c1.centroid_id,
         CASE WHEN m.m IS NULL OR list_dot_product(m.m, m.m) <= 0 THEN c1.c_emb
              ELSE list_transform(m.m, x -> round(x / sqrt(list_dot_product(m.m, m.m)), 9))
         END AS c_emb
  FROM cent1 c1 LEFT JOIN m2 m ON m.cell = c1.centroid_id
), cassign AS (
  -- final assignment re-normalizes the trained centroids (ivf_assign's
  -- _centroid_arrays), so the per-centroid norm division is mirrored here
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding::DOUBLE[], c.c_emb)
                      / sqrt(list_dot_product(c.c_emb, c.c_emb)) DESC,
                      c.centroid_id ASC) AS rn
    FROM embeddings e CROSS JOIN cent2 c
  ) WHERE rn = 1
), cent_f32 AS (
  -- the probe stage reads centroids back through an array<float> schema
  SELECT centroid_id, list_transform(c_emb, x -> (x::FLOAT)::DOUBLE) AS c_emb
  FROM cent2
), probes AS (
  SELECT query_id, q_emb, cell FROM (
    SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.embedding::DOUBLE[], c.c_emb)
                      / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                         * sqrt(list_dot_product(c.c_emb, c.c_emb))) DESC,
                      c.centroid_id ASC) AS rn
    FROM embeddings q CROSS JOIN cent_f32 c WHERE q.vec_id < 8
  ) WHERE rn <= 4
), scored AS (
  SELECT p.query_id, a.vec_id,
         list_dot_product(p.q_emb::DOUBLE[], a.embedding::DOUBLE[])
           / (sqrt(list_dot_product(p.q_emb::DOUBLE[], p.q_emb::DOUBLE[]))
              * sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))) AS cos_raw
  FROM probes p JOIN cassign a USING (cell)
)
SELECT query_id, vec_id, round(cos_raw, 6) AS cosine, rank FROM (
  SELECT query_id, vec_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
           ORDER BY cos_raw DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
ORDER BY query_id, rank
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector aggregate: per-label centroid norms — posexplode + groupBy
    (the embedding-stats shape: unnest once, aggregate columnar)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    pos = emb.select("label", F.posexplode("embedding").alias("dim", "v"))
    cent = pos.groupBy("label", "dim").agg(F.avg(F.col("v").cast("double")).alias("c"))
    return (
        cent.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("centroid_norm"))
        .orderBy("label")
    )


Q_LABEL_CENTROIDS_SQL = """
WITH pos AS (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings
), cent AS (
  SELECT label, dim, avg(v) AS c FROM pos GROUP BY 1, 2
)
SELECT label, round(sqrt(sum(c * c)), 6) AS centroid_norm
FROM cent GROUP BY label ORDER BY label
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling under the value oracle: the first
    5 docs of every (lang, source) stratum by md5(doc_id) — the
    reproducible, partitioning-invariant training-data subset pick
    (operators/sampling.py). The md5 order is bit-identical in DuckDB, so
    the oracle replays the exact kept set, not just its size."""
    from ..operators.sampling import sample_per_group

    (docs,) = load(spark, sf_dir, "documents")
    picked = sample_per_group(docs, ["lang", "source"], 5, "doc_id")
    return picked.select("lang", "source", "sample_rank", "doc_id").orderBy(
        "lang", "source", "sample_rank"
    )


Q_STRATIFIED_SAMPLE_SQL = """
SELECT lang, source, sample_rank, doc_id FROM (
  SELECT lang, source, doc_id,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(doc_id::VARCHAR), doc_id
         ) AS sample_rank
  FROM documents
) WHERE sample_rank <= 5
ORDER BY lang, source, sample_rank
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split under the value oracle: md5
    bucket mod 100 -> contiguous weight ranges (98/1/1), a pure
    projection (ZERO shuffle until this count). Counts + id-sum per
    (split, lang) pin the exact assignment, not just the ratios."""
    from ..operators.sampling import hash_split

    (docs,) = load(spark, sf_dir, "documents")
    split = hash_split(docs, "doc_id", {"train": 98, "val": 1, "test": 1})
    return (
        split.groupBy("split", "lang")
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("sum_ids"))
        .orderBy("split", "lang")
    )


Q_HASH_SPLIT_SQL = """
WITH b AS (
  SELECT lang, doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 98 THEN 'train'
            WHEN bucket < 99 THEN 'val'
            ELSE 'test' END AS split,
       lang, count(*) AS n, sum(doc_id)::BIGINT AS sum_ids
FROM b GROUP BY 1, 2 ORDER BY split, lang
"""


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top terms per document under the value oracle: whitespace
    tokenize -> per-doc term counts (tf) -> document frequency over the
    FULL corpus -> score = tf * ln(N/df) -> top 3 terms per sampled doc.
    Two shuffles (doc-term counts, term df) + one broadcast-size window —
    the canonical corpus-statistics shape. Rank on the ROUNDED score so
    tie order is engine-portable."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = toks.select(F.count_distinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.filter(F.pmod(F.col("doc_id"), F.lit(29)) == 0)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "score")
        .orderBy("doc_id", "rank")
    )


Q_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents
), toks_nz AS (
  SELECT doc_id, term FROM toks WHERE term <> ''
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks_nz GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks_nz GROUP BY 1
), nd AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM toks_nz
), scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(nd.n_docs / dfreq.df), 6) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
  WHERE tf.doc_id % 29 = 0
)
SELECT doc_id, rank, term, score FROM (
  SELECT doc_id, term, score,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term ASC
         ) AS rank
  FROM scored
) WHERE rank <= 3
ORDER BY doc_id, rank
"""


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN under the FULL value oracle: train PQ
    codebooks (m=4 subspaces x 8 codes, 1 Lloyd iteration, means rounded
    to 9 dp — the ivf_train bit-stability discipline), encode every
    candidate to 4 byte-codes JVM-side, then ADC top-10 for 8 queries as
    a sum of LUT lookups. The DuckDB SQL replays EVERY stage — seeds,
    the L2 argmin (spelled ||c||^2 - 2<e,c> with sequential-fold dots on
    both engines), the rounded re-centering, the re-encode against the
    trained books, the per-query LUTs, and the rank — bit-for-bit.
    PQ is the memory leg of the ANN story: 4 bytes/vector searched
    instead of 256 (operators/similarity.py:pq_train/pq_encode/pq_topk).
    """
    from ..operators.similarity import pq_topk, pq_train

    (emb,) = load(spark, sf_dir, "embeddings")
    emb = widen(spark, emb)  # single-row-group scan; round_dp guards training
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    books = pq_train(emb, m=4, k_codes=8, n_iters=1, round_dp=9)
    return pq_topk(qs, emb, books, k=10).orderBy("query_id", "rank")


def _pq_sql(m: int = 4, k_codes: int = 8, d_sub: int = 16,
            n_queries: int = 8, topk: int = 10) -> str:
    """Generate the DuckDB replay of q_pq_topk (m subspaces make the SQL
    repetitive; building it keeps the two sides structurally in lockstep).
    """
    ctes = []
    for s in range(m):
        lo, hi = s * d_sub + 1, (s + 1) * d_sub
        sl = f"embedding[{lo}:{hi}]::DOUBLE[]"
        key = f"list_dot_product(c.c, c.c) - 2 * list_dot_product(e.{sl}, c.c)"
        ctes.append(f"""seeds_{s} AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, {sl} AS c
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k_codes})
)""")
        ctes.append(f"""a_{s} AS (
  SELECT vec_id, code FROM (
    SELECT e.vec_id, c.code,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {key} ASC, c.code ASC) AS rn
    FROM embeddings e CROSS JOIN seeds_{s} c) WHERE rn = 1
)""")
        ctes.append(f"""u_{s} AS (
  SELECT a.code, generate_subscripts(e.{sl}, 1) AS dim,
         unnest(e.{sl}) AS v
  FROM a_{s} a JOIN embeddings e USING (vec_id)
)""")
        ctes.append(f"""m_{s} AS (
  SELECT code, list(c ORDER BY dim) AS mc FROM (
    SELECT code, dim, round(avg(v), 9) AS c FROM u_{s} GROUP BY 1, 2
  ) GROUP BY code
)""")
        ctes.append(f"""cent_{s} AS (
  SELECT s.code, COALESCE(m.mc, s.c) AS c
  FROM seeds_{s} s LEFT JOIN m_{s} m USING (code)
)""")
        ctes.append(f"""enc_{s} AS (
  SELECT vec_id, code AS c{s} FROM (
    SELECT e.vec_id, c.code,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {key} ASC, c.code ASC) AS rn
    FROM embeddings e CROSS JOIN cent_{s} c) WHERE rn = 1
)""")
        ctes.append(f"""lut_{s} AS (
  SELECT e.vec_id AS query_id, c.code,
         list_dot_product(c.c, c.c) - 2 * list_dot_product(e.{sl}, c.c) AS val
  FROM embeddings e CROSS JOIN cent_{s} c WHERE e.vec_id < {n_queries}
)""")
    enc_joins = " ".join(f"JOIN enc_{s} USING (vec_id)" for s in range(1, m))
    lut_joins = " ".join(
        f"JOIN lut_{s} l{s} ON l{s}.code = enc_{s}.c{s} AND l{s}.query_id = l0.query_id"
        for s in range(1, m)
    )
    dist = " + ".join(f"l{s}.val" for s in range(m))
    ctes.append(f"""scored AS (
  SELECT l0.query_id, enc_0.vec_id, round({dist}, 6) AS adc_dist
  FROM enc_0 {enc_joins}
  JOIN lut_0 l0 ON l0.code = enc_0.c0
  {lut_joins}
)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT query_id, vec_id, adc_dist, rank FROM (
  SELECT query_id, vec_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
           ORDER BY adc_dist ASC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {topk}
ORDER BY query_id, rank
""")


Q_PQ_TOPK_SQL = _pq_sql()


# -------- Gopher/C4-style quality filters + corpus chunk dedup --------

_GQ_MIN_MWL, _GQ_MAX_MWL = 3.0, 10.0
_GQ_MIN_DISTINCT = 0.2
_GQ_MAX_TOP_FRAC = 0.2


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style word-level quality filters, aggregated per source:
    mean word length, distinct-word ratio, top-word fraction, duplicate
    2-gram fraction, plus the pass-count of the combined filter.

    Everything except the top-word fraction is pure array Column algebra
    (zero extra shuffles over the per-source agg); the top-word count
    uses one explode + (doc, word) groupBy — shuffle payload is (doc_id,
    word-hash-sized rows), never the document text."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = docs.select("doc_id", "source", toks.alias("toks")).withColumn(
        "n_words", F.size("toks")
    )
    arrayed = base.select(
        "doc_id",
        "source",
        "n_words",
        (
            F.expr("aggregate(toks, 0L, (a, x) -> a + length(x))")
            / F.col("n_words")
        ).alias("mean_word_len"),
        (F.size(F.array_distinct("toks")) / F.col("n_words")).alias("distinct_ratio"),
        F.when(
            F.col("n_words") >= 2,
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> concat(toks[i], ' ', toks[i + 1]))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("grams2"),
    ).withColumn(
        "dup_2gram_frac",
        F.when(
            F.size("grams2") > 0,
            (F.size("grams2") - F.size(F.array_distinct("grams2")))
            / F.size("grams2"),
        ).otherwise(F.lit(0.0)),
    )
    # count by the WORD'S HASH, not the word: the shuffle then moves
    # (doc_id, int64) rows instead of raw strings — same max-count unless
    # xxhash64 collides within one doc (~n²/2^64, negligible); the oracle
    # counts raw words, which is equal under the same no-collision fact
    top = (
        base.select("doc_id", F.explode("toks").alias("__w"))
        .select("doc_id", F.xxhash64("__w").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_count"))
    )
    scored = arrayed.join(top, "doc_id").withColumn(
        "top_word_frac", F.col("top_word_count") / F.col("n_words")
    )
    passes = (
        F.col("mean_word_len").between(_GQ_MIN_MWL, _GQ_MAX_MWL)
        & (F.col("distinct_ratio") >= _GQ_MIN_DISTINCT)
        & (F.col("top_word_frac") <= _GQ_MAX_TOP_FRAC)
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(passes.cast("long")).alias("n_pass"),
            F.round(F.avg("mean_word_len"), 4).alias("avg_mwl"),
            F.round(F.avg("distinct_ratio"), 4).alias("avg_distinct"),
            F.round(F.avg("top_word_frac"), 4).alias("avg_top_frac"),
            F.round(F.avg("dup_2gram_frac"), 4).alias("avg_dup2"),
        )
        .orderBy("source")
    )


Q_GOPHER_QUALITY_SQL = rf"""
WITH base AS (
  SELECT doc_id, source,
         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
), arrayed AS (
  SELECT doc_id, source, len(toks) AS n_words,
         list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks)
           AS mean_word_len,
         len(list_distinct(toks)) * 1.0 / len(toks) AS distinct_ratio,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
         ELSE [] END AS grams2
  FROM base
), with2 AS (
  SELECT *, CASE WHEN len(grams2) > 0 THEN
      (len(grams2) - len(list_distinct(grams2))) * 1.0 / len(grams2)
    ELSE 0.0 END AS dup_2gram_frac
  FROM arrayed
), top AS (
  SELECT doc_id, max(c) AS top_word_count FROM (
    SELECT doc_id, w, count(*) AS c
    FROM base, unnest(toks) AS t(w)
    GROUP BY doc_id, w
  ) GROUP BY doc_id
), scored AS (
  SELECT with2.*, top.top_word_count * 1.0 / with2.n_words AS top_word_frac
  FROM with2 JOIN top USING (doc_id)
)
SELECT source, count(*) AS n_docs,
       sum(CASE WHEN mean_word_len BETWEEN {_GQ_MIN_MWL} AND {_GQ_MAX_MWL}
                 AND distinct_ratio >= {_GQ_MIN_DISTINCT}
                 AND top_word_frac <= {_GQ_MAX_TOP_FRAC}
            THEN 1 ELSE 0 END)::BIGINT AS n_pass,
       round(avg(mean_word_len), 4) AS avg_mwl,
       round(avg(distinct_ratio), 4) AS avg_distinct,
       round(avg(top_word_frac), 4) AS avg_top_frac,
       round(avg(dup_2gram_frac), 4) AS avg_dup2
FROM scored GROUP BY source ORDER BY source
"""


_CHUNK_W = 10


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-level chunk dedup over the duplicated corpus:
    split every document into fixed 10-word chunks, fingerprint each
    chunk, and attribute each distinct chunk to its FIRST occurrence
    (min (doc_id, chunk_idx)); report per-source occurrence vs owned
    counts and the duplicate fraction.

    Scale shape: explode + ONE window shuffle keyed on the chunk's md5
    (the text itself never shuffles beyond its own partition — only
    32-hex fingerprints + positions), then a per-source agg. Chunks at
    a fixed width bound both the fan-out (n_words/10 rows per doc) and
    the window group sizes."""
    corpus = _dup_corpus(spark, sf_dir)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    chunks = (
        corpus.select("doc_id", "source", toks.alias("toks"))
        .withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), F.ceil(F.size("toks") / _CHUNK_W) - 1)),
        )
        .select(
            "doc_id",
            "source",
            "chunk_idx",
            F.md5(
                F.array_join(
                    F.slice(F.col("toks"), F.col("chunk_idx") * _CHUNK_W + 1, _CHUNK_W),
                    " ",
                )
            ).alias("chunk_fp"),
        )
    )
    w = Window.partitionBy("chunk_fp").orderBy("doc_id", "chunk_idx")
    marked = chunks.withColumn(
        "is_first", (F.row_number().over(w) == 1).cast("long")
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("is_first").alias("n_owned"),
            F.round(1.0 - F.sum("is_first") / F.count("*"), 6).alias("dup_frac"),
        )
        .orderBy("source")
    )


Q_CHUNK_DEDUP_SQL = rf"""
WITH corpus AS ({_DUP_CORPUS_SQL}),
toked AS (
  SELECT doc_id, source,
         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM corpus
), chunks0 AS (
  SELECT doc_id, source, toks,
         unnest(range(CAST(ceil(len(toks) * 1.0 / {_CHUNK_W}) AS BIGINT)))
           AS chunk_idx
  FROM toked
), chunks AS (
  SELECT doc_id, source, chunk_idx,
         md5(array_to_string(
           toks[chunk_idx * {_CHUNK_W} + 1 : (chunk_idx + 1) * {_CHUNK_W}],
           ' ')) AS chunk_fp
  FROM chunks0
), marked AS (
  SELECT source,
         CASE WHEN row_number() OVER (
             PARTITION BY chunk_fp ORDER BY doc_id, chunk_idx) = 1
           THEN 1 ELSE 0 END AS is_first
  FROM chunks
)
SELECT source, count(*) AS n_chunks, sum(is_first)::BIGINT AS n_owned,
       round(1.0 - sum(is_first) * 1.0 / count(*), 6) AS dup_frac
FROM marked GROUP BY source ORDER BY source
"""


# ---------- planted-phash near-dup pairs (hamming block-pair LSH) ----------

_PH_FAMS = 50
_PH_MAXFLIPS = 6  # k in [0, 5]
_PH_MAXHAM = 6


def _phash_fps(docs: DataFrame) -> DataFrame:
    """Deterministic planted 60-bit fingerprints: each doc joins one of
    50 families (shared md5-derived base) and flips 0-5 md5-derived bit
    positions, so intra-family pairs land at hamming 0-10 and the <= 6
    filter genuinely discriminates. Every derivation is md5 -> integer
    algebra that DuckDB replays bit-for-bit (sketches.hash60 twin)."""
    from ..operators.sketches import hash60

    did = F.col("doc_id").cast("string")
    out = docs.select(
        "doc_id",
        F.pmod(hash60(did), _PH_FAMS).alias("fam"),
        F.pmod(hash60(F.concat(did, F.lit("k"))), _PH_MAXFLIPS).alias("k"),
        *[
            F.pmod(hash60(F.concat(did, F.lit(f"p{j}"))), 60).alias(f"p{j}")
            for j in range(_PH_MAXFLIPS - 1)
        ],
    ).withColumn("base", hash60(F.col("fam").cast("string")))
    flips = " ^ ".join(
        f"(CASE WHEN k > {j} THEN shiftleft(CAST(1 AS BIGINT), p{j}) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for j in range(_PH_MAXFLIPS - 1)
    )
    return out.select("doc_id", F.expr(f"base ^ {flips}").alias("fingerprint"))


def q_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-phash-style near-dup pairs via the 64-bit hamming block-pair
    LSH (operators/dedup.py:hamming_near_dups): pigeonhole guarantees
    every pair within hamming<=6 shares an exact 16-bit block-pair key,
    so the LSH equi-join + popcount verify returns EXACTLY the
    brute-force pair set the oracle computes all-pairs — recall is
    provable, not sampled. Scale: candidate generation is an equi-join
    on C(8,2)=28 bounded-cardinality keys; nothing quadratic."""
    from ..operators.dedup import hamming_near_dups

    (docs,) = load(spark, sf_dir, "documents")
    fps = _phash_fps(widen(spark, docs))
    pairs = hamming_near_dups(
        fps, max_hamming=_PH_MAXHAM, n_blocks=8, block_cap=10_000
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("id_a", "id_b")


def _phash_sql() -> str:
    from ..operators.sketches import duck_hash60

    h = duck_hash60
    k_expr = h("doc_id || 'k'") + f" % {_PH_MAXFLIPS}"
    flip_terms = ""
    for j in range(_PH_MAXFLIPS - 1):
        p_expr = h("doc_id || 'p" + str(j) + "'") + " % 60"
        flip_terms += (
            f", CASE WHEN {k_expr} > {j} "
            f"THEN (1::BIGINT << ({p_expr})) ELSE 0::BIGINT END AS f{j}"
        )
    xor_chain = "base"
    for j in range(_PH_MAXFLIPS - 1):
        xor_chain = f"xor({xor_chain}, f{j})"
    base_expr = h(h("doc_id") + f" % {_PH_FAMS}")
    return f"""
WITH parts AS (
  SELECT doc_id,
         {base_expr} AS base
         {flip_terms}
  FROM documents
), fp AS (
  SELECT doc_id, {xor_chain} AS fingerprint FROM parts
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= {_PH_MAXHAM}
ORDER BY id_a, id_b
"""


Q_PHASH_NEAR_DUPS_SQL = _phash_sql()


# --------------- composed corpus preparation pipeline ---------------


_CP_MIN_WORDS = 30
_CP_MWL_LO, _CP_MWL_HI = 3.0, 4.6
_CP_MIN_DRATIO = 0.35


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus prep funnel COMPOSED from the
    battery's stages: exact dedup (md5 fingerprint window, keep min
    doc_id) -> language gate (upstream lang tag == 'en', the
    trust-the-classifier shape) -> quality gate (Gopher-lite: word
    count, mean word length band, distinct-word ratio), reported as
    per-source survivor counts at every stage plus final token volume.

    Scale shape: ONE window shuffle (on the 32-hex fingerprint) + ONE
    aggregation shuffle. The gates are pure map-side array algebra
    computed as FLAGS, so no stage materializes an intermediate corpus —
    the funnel is conditional sums over a single pass, which is how a
    100 TB prep job avoids writing N-1 intermediate datasets."""
    corpus = _dup_corpus(spark, sf_dir)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    flagged = (
        corpus.withColumn("fingerprint", F.md5("text"))
        .withColumn("is_kept", (F.row_number().over(w) == 1).cast("int"))
        .withColumn("n_words", F.size(toks))
        .withColumn(
            "mwl",
            F.expr("aggregate(split(lower(trim(text)), '\\\\s+'), 0L, (a, x) -> a + length(x))")
            / F.col("n_words"),
        )
        .withColumn("dratio", F.size(F.array_distinct(toks)) / F.col("n_words"))
    )
    is_en = F.col("lang") == "en"
    is_q = (
        (F.col("n_words") >= _CP_MIN_WORDS)
        & F.col("mwl").between(_CP_MWL_LO, _CP_MWL_HI)
        & (F.col("dratio") >= _CP_MIN_DRATIO)
    )
    kept = F.col("is_kept") == 1
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_raw"),
            F.sum(kept.cast("long")).alias("n_dedup"),
            F.sum((kept & is_en).cast("long")).alias("n_lang"),
            F.sum((kept & is_en & is_q).cast("long")).alias("n_final"),
            F.sum(F.when(kept & is_en & is_q, F.col("n_words")).otherwise(0)).alias(
                "final_tokens"
            ),
        )
        .orderBy("source")
    )


def _corpus_pipeline_sql() -> str:
    return rf"""
WITH corpus AS ({_DUP_CORPUS_SQL}),
flagged AS (
  SELECT source, lang,
         CASE WHEN row_number() OVER (
             PARTITION BY md5(text) ORDER BY doc_id) = 1 THEN 1 ELSE 0 END
           AS is_kept,
         len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_words,
         list_sum(list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
                                 x -> length(x))) * 1.0
           / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS mwl,
         len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) * 1.0
           / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dratio
  FROM corpus
), gated AS (
  SELECT source, is_kept, n_words,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
         CASE WHEN n_words >= {_CP_MIN_WORDS}
               AND mwl BETWEEN {_CP_MWL_LO} AND {_CP_MWL_HI}
               AND dratio >= {_CP_MIN_DRATIO}
           THEN 1 ELSE 0 END AS is_q
  FROM flagged
)
SELECT source, count(*) AS n_raw,
       sum(is_kept)::BIGINT AS n_dedup,
       sum(is_kept * is_en)::BIGINT AS n_lang,
       sum(is_kept * is_en * is_q)::BIGINT AS n_final,
       sum(CASE WHEN is_kept * is_en * is_q = 1 THEN n_words ELSE 0 END)::BIGINT
         AS final_tokens
FROM gated GROUP BY source ORDER BY source
"""


Q_CORPUS_PIPELINE_SQL = _corpus_pipeline_sql()


# ------------------- exact frequent items per group -------------------

_FI_K = 3


def q_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k frequent words per source (the heavy-hitters query):
    count by (source, word-hash... no — the WORD itself must surface in
    the output, so the exchange carries (source, word) count partials),
    then one small window over the bounded per-source count relation.
    Deterministic tiebreak: higher count first, then lexicographic word.

    Scale note: map-side partial aggregation collapses each task to its
    distinct (source, word) set before the exchange; the window runs on
    count rows (bounded by vocabulary, not corpus size). For unbounded
    vocabularies a count-min sketch is the next step; exact is right
    whenever distinct words fit a shuffle, which holds for natural
    language."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    counts = (
        docs.select("source", F.explode(toks).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("word"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _FI_K)
        .select("source", "rank", "word", "n")
        .orderBy("source", "rank")
    )


Q_FREQUENT_ITEMS_SQL = rf"""
WITH words AS (
  SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
  FROM documents
), counts AS (
  SELECT source, word, count(*) AS n FROM words GROUP BY 1, 2
), ranked AS (
  SELECT source, word, n,
         row_number() OVER (PARTITION BY source ORDER BY n DESC, word ASC) AS rank
  FROM counts
)
SELECT source, rank, word, n FROM ranked
WHERE rank <= {_FI_K}
ORDER BY source, rank
"""


# --------------------------- weighted sampling ---------------------------

_WS_K = 5
_WS_SEED = 11


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A-ES weighted sampling (operators/sampling.py):
    5 docs per source, weighted by n_chars — the 'sample by quality
    score, reproducibly' curation op. The output is SELECTED ROWS only
    (ids + weights, no computed floats), so the oracle replays the
    identical md5-uniform + ln(u)/w priority and must pick the same
    rows; priorities are spaced far beyond 1 ulp, so engine libm
    differences cannot flip the order."""
    from ..operators.sampling import weighted_sample

    (docs,) = load(spark, sf_dir, "documents")
    got = weighted_sample(
        docs.select("doc_id", "source", "n_chars"),
        "n_chars", _WS_K, id_col="doc_id", by=["source"], seed=_WS_SEED,
    )
    return got.select("source", "doc_id", "n_chars").orderBy("source", "doc_id")


Q_WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#{_WS_SEED}'), 1, 15))::BIGINT
             ::DOUBLE + 1.0) / {float(1 << 60):.17e}) / n_chars::DOUBLE AS pri
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
), ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY pri DESC, doc_id ASC) AS rn
  FROM keyed
)
SELECT source, doc_id, n_chars FROM ranked WHERE rn <= {_WS_K}
ORDER BY source, doc_id
"""


# --------------------------- count-min sketch ---------------------------

_CMS_D = 4
_CMS_W = 32


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries vs exact counts: build a d=4 x
    w=32 CMS of words per source (bounded integer state, mergeable —
    operators/sketches.py:cms_counts), then estimate each source's exact
    top-3 words. Integer arithmetic end-to-end, so the ESTIMATES — and
    the over_by inflation column exhibiting the one-sided CMS guarantee
    est >= true — replay in DuckDB exactly."""
    from ..operators.sketches import cms_counts, cms_estimate

    (docs,) = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    words = docs.select("source", F.explode(toks).alias("word"))
    sketch = cms_counts(words, "word", ["source"], d=_CMS_D, w=_CMS_W)
    counts = words.groupBy("source", "word").agg(F.count("*").alias("n_exact"))
    wnd = Window.partitionBy("source").orderBy(F.desc("n_exact"), F.asc("word"))
    items = (
        counts.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= 3)
        .select("source", "rank", "word", "n_exact")
    )
    est = cms_estimate(sketch, items, "word", ["source"], d=_CMS_D, w=_CMS_W)
    return est.select(
        "source", "rank", "word", "n_exact", "cms_est",
        (F.col("cms_est") - F.col("n_exact")).alias("over_by"),
    ).orderBy("source", "rank")


def _cms_sql() -> str:
    from ..operators.sketches import cms_sql_hash

    sketch_rows = "\n  UNION ALL\n".join(
        f"  SELECT source, {j} AS cms_row, {cms_sql_hash('word', j, _CMS_W)} AS cms_bucket FROM words"
        for j in range(_CMS_D)
    )
    probe_rows = "\n  UNION ALL\n".join(
        f"  SELECT source, rank, word, n_exact, {j} AS cms_row, "
        f"{cms_sql_hash('word', j, _CMS_W)} AS cms_bucket FROM items"
        for j in range(_CMS_D)
    )
    return rf"""
WITH words AS (
  SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
  FROM documents
), hashed AS (
{sketch_rows}
), sketch AS (
  SELECT source, cms_row, cms_bucket, count(*) AS cnt
  FROM hashed GROUP BY 1, 2, 3
), counts AS (
  SELECT source, word, count(*) AS n_exact FROM words GROUP BY 1, 2
), items AS (
  SELECT source, rank, word, n_exact FROM (
    SELECT source, word, n_exact,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_exact DESC, word ASC) AS rank
    FROM counts
  ) WHERE rank <= 3
), probes AS (
{probe_rows}
), joined AS (
  SELECT p.source, p.rank, p.word, p.n_exact,
         coalesce(s.cnt, 0) AS cnt
  FROM probes p LEFT JOIN sketch s
    ON p.source = s.source AND p.cms_row = s.cms_row
   AND p.cms_bucket = s.cms_bucket
)
SELECT source, rank, word, n_exact, min(cnt) AS cms_est,
       min(cnt) - n_exact AS over_by
FROM joined GROUP BY source, rank, word, n_exact
ORDER BY source, rank
"""


Q_CMS_SQL = _cms_sql()


# ------------------- corpus overlap / contamination -------------------


_KSO_K = 256


def q_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-overlap (contamination) estimate between two document
    corpora via KMV set operations over word-3-gram shingles
    (operators/sketches.py:kmv_set_ops, Beyer et al. 2007): corpus A =
    doc_id % 3 != 0, corpus B = doc_id % 2 != 0 (a real, large overlap
    by construction). One row: the sketch's union / Jaccard /
    intersection estimates next to the exact values and the union
    relative error.

    Scale shape: this is the train-vs-benchmark contamination check at
    100 TB — each corpus collapses to <= k=256 hashes via bounded
    per-partition bottom-k partials before anything joins; the exact
    side (distinct-join) exists only as sf-scale evidence and would be
    dropped at production scale."""
    from ..operators.dedup import shingle_arrays
    from ..operators.sketches import kmv_set_ops

    (docs,) = load(spark, sf_dir, "documents")
    sh = shingle_arrays(docs, k=3, distinct_in_array=True)
    exploded = sh.select(
        "doc_id", F.explode_outer("shingles").alias("shingle")
    ).filter(F.col("shingle").isNotNull())
    ca = exploded.filter(F.col("doc_id") % 3 != 0).select("shingle")
    cb = exploded.filter(F.col("doc_id") % 2 != 0).select("shingle")
    est = kmv_set_ops(ca, cb, "shingle", k=_KSO_K)
    da = ca.distinct()
    db = cb.distinct()
    ex_u = da.unionByName(db).distinct().agg(
        F.count("*").alias("exact_union")
    )
    ex_i = da.join(db, "shingle").agg(F.count("*").alias("exact_intersect"))
    out = est.crossJoin(ex_u).crossJoin(ex_i)
    return out.select(
        "ku",
        "n_both",
        F.round("union_est", 4).alias("union_est"),
        F.round("jaccard_est", 6).alias("jaccard_est"),
        F.round("intersect_est", 4).alias("intersect_est"),
        "exact_union",
        "exact_intersect",
        F.round(
            F.col("exact_intersect").cast("double")
            / F.col("exact_union").cast("double"),
            6,
        ).alias("exact_jaccard"),
        F.round(
            F.abs(
                F.col("union_est") / F.col("exact_union").cast("double") - 1.0
            ),
            6,
        ).alias("rel_err_union"),
    )


def _corpus_overlap_sql() -> str:
    from ..operators.sketches import kmv_set_ops_sql

    frag = kmv_set_ops_sql("__ca", "__cb", "shingle", k=_KSO_K)
    return rf"""
WITH __sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2),
           i -> regexp_split_to_array(lower(trim(text)), '\s+')[i] || ' ' ||
                regexp_split_to_array(lower(trim(text)), '\s+')[i+1] || ' ' ||
                regexp_split_to_array(lower(trim(text)), '\s+')[i+2]
         )) AS shingles
  FROM documents
), __expl AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM __sh WHERE len(shingles) > 0
), __ca AS (
  SELECT shingle FROM __expl WHERE doc_id % 3 <> 0
), __cb AS (
  SELECT shingle FROM __expl WHERE doc_id % 2 <> 0
), __est AS (
{frag}
), __da AS (
  SELECT DISTINCT shingle FROM __ca
), __db AS (
  SELECT DISTINCT shingle FROM __cb
), __xu AS (
  SELECT count(*) AS exact_union
  FROM (SELECT shingle FROM __da UNION SELECT shingle FROM __db)
), __xi AS (
  SELECT count(*) AS exact_intersect FROM __da JOIN __db USING (shingle)
)
SELECT ku, n_both,
       round(union_est, 4) AS union_est,
       round(jaccard_est, 6) AS jaccard_est,
       round(intersect_est, 4) AS intersect_est,
       exact_union, exact_intersect,
       round(exact_intersect::DOUBLE / exact_union::DOUBLE, 6) AS exact_jaccard,
       round(abs(union_est / exact_union::DOUBLE - 1.0), 6) AS rel_err_union
FROM __est, __xu, __xi
"""


Q_CORPUS_OVERLAP_SQL = _corpus_overlap_sql()


# ----------------------------- PII scrubbing -----------------------------

# One pattern table shared by the Spark Columns and the DuckDB twin. All
# three are RE2-safe (no backreferences/lookaround), so Java regex and
# DuckDB's RE2 match identical spans; Spark's regexp_replace is global by
# default and the SQL twin passes the 'g' flag.
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # match IPs before phones would matter if the charsets overlapped;
    # they don't (the phone body [\d -] excludes dots), so order is free
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d[\d -]{7,}\d", "<PHONE>"),
}


def scrub_pii(col):
    """Redact emails, IPv4s, and phone-shaped digit runs from a string
    Column — the PII-masking stage of a training-corpus pipeline. Pure
    Column regexp algebra (JVM, whole-stage codegen); at 100 TB this is a
    map-only pass with zero shuffle."""
    out = col
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub under the value oracle: deterministic synthetic PII is
    injected into each document (an email for doc_id%3==0, a phone for
    %4==0, an IPv4 for %5==0 — plus every doc keeps its original text),
    then scrubbed with the shared PII_PATTERNS. Output per doc: the
    pattern hit counts on the injected text and the md5 of the scrubbed
    text, so the oracle checks both detection and the exact replacement
    byte-for-byte."""
    (docs,) = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(did % 3 == 0,
               F.concat(F.lit(" contact user"), did, F.lit("@example.com")))
        .otherwise(F.lit("")),
        F.when(did % 4 == 0,
               F.concat(F.lit(" call +1 555 000 "),
                        F.lpad(F.pmod(did, F.lit(10000)), 4, "0")))
        .otherwise(F.lit("")),
        F.when(did % 5 == 0,
               F.concat(F.lit(" from 10.0."), F.pmod(did, F.lit(256)),
                        F.lit("."), F.pmod(did, F.lit(100))))
        .otherwise(F.lit("")),
    )
    with_pii = docs.select("doc_id", injected.alias("t"))
    counts = [
        F.regexp_count(F.col("t"), F.lit(pat)).alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    return (
        with_pii.select("doc_id", *counts, F.md5(scrub_pii(F.col("t"))).alias("scrubbed_md5"))
        .orderBy("doc_id")
    )


def _pii_sql() -> str:
    inj = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' call +1 555 000 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
                 ELSE '' END AS t
  FROM documents
"""
    count_cols = ", ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS n_{name}"
        for name, (pat, _) in PII_PATTERNS.items()
    )
    scrub = "t"
    for pat, token in PII_PATTERNS.values():
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    return f"""
WITH inj AS ({inj})
SELECT doc_id, {count_cols}, md5({scrub}) AS scrubbed_md5
FROM inj ORDER BY doc_id
"""


Q_PII_SCRUB_SQL = _pii_sql()


# --------------------------- semantic dedup ---------------------------


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup under the value oracle
    (operators/similarity.py:semantic_dedup): the corpus is the
    embeddings table plus planted exact copies (vec_id + 100000 for every
    vec_id % 10 == 0), so the expected dup set is known — copies dominate
    at cosine 1.0 while the organic max pairwise cosine on this table is
    ~0.51, far from tau=0.9 (no flip risk). The oracle replays the seed
    assignment (same argmax-margin argument as q_ivf_assign) and the
    within-cell dominance rule with sequential-fold cosines that match the
    engine's zip_with folds bit-for-bit."""
    from ..operators.similarity import semantic_dedup

    (emb,) = load(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(copies)
    out = semantic_dedup(corpus, n_cells=16, tau=0.9)
    return out.select(
        "vec_id", "cell", "is_dup", "dup_of", F.round("max_sim", 6).alias("max_sim")
    ).orderBy("vec_id")


Q_SEMANTIC_DEDUP_SQL = """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0
), cent AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb
  FROM corpus ORDER BY vec_id LIMIT 16
), assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[]) /
                      (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                       sqrt(list_dot_product(c.c_emb::DOUBLE[], c.c_emb::DOUBLE[]))) DESC,
                      c.centroid_id ASC) AS rn
    FROM corpus e CROSS JOIN cent c
  ) WHERE rn = 1
), sims AS (
  SELECT b.vec_id AS j, a.vec_id AS i,
         list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
          sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS sim
  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
), dom AS (
  SELECT j, max(sim) AS max_sim,
         min(CASE WHEN sim > 0.9 THEN i END) AS dup_of
  FROM sims GROUP BY j
)
SELECT a.vec_id, a.cell,
       (dup_of IS NOT NULL) AS is_dup,
       dup_of, round(max_sim, 6) AS max_sim
FROM assigned a LEFT JOIN dom ON dom.j = a.vec_id
ORDER BY a.vec_id
"""


def q_quantize_emb(spark, sf_dir: str):
    """Int8 embedding quantization under the value oracle
    (operators/similarity.py:quantize_embeddings): per-vector symmetric
    scale, clipped round-half-up codes, and the worst-case
    dequantization error — every step shared-IEEE double arithmetic, so
    DuckDB replays scale, code sums, and max_err bit-for-bit via
    UNNEST."""
    from pyspark.sql import functions as F

    from vectortiles_spark.operators.similarity import quantize_embeddings

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = quantize_embeddings(emb.select("vec_id", "embedding"))
    return q.select(
        "vec_id", "scale", "n_dims",
        F.aggregate(
            F.col("codes"), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("sum_code"),
        "max_err",
    ).orderBy("vec_id")


Q_QUANTIZE_EMB_SQL = """
WITH x AS (
  SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS v
  FROM embeddings
), m AS (
  SELECT vec_id, max(abs(v)) AS maxabs FROM x GROUP BY 1
), c AS (
  SELECT x.vec_id, v,
         least(greatest(floor(
           v / (CASE WHEN maxabs = 0 THEN 1.0 ELSE maxabs / 127.0 END)
           + 0.5), -127.0), 127.0) AS code,
         maxabs / 127.0 AS scale
  FROM x JOIN m USING (vec_id)
)
SELECT vec_id, any_value(scale) AS scale, count(*)::INT AS n_dims,
       sum(code)::BIGINT AS sum_code,
       max(abs(v - code * scale)) AS max_err
FROM c GROUP BY vec_id ORDER BY vec_id
"""
