"""Physical-plan audits (SURVEY.md §4): the scale-critical plan properties
are pinned as tests — pushdown, pruning, broadcast, no cartesian blowup."""

import pytest
from pyspark.sql import functions as F

from vectortiles_spark.operators import spatial_join, tiling
from vectortiles_spark.plans import audit
from vectortiles_spark.plans.queries import lat_of, lon_of, q03_join_agg, q05_region_revenue

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_to_parquet(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    audit.assert_pushed_filter(df, "l_orderkey")


def test_column_pruning_tile_pipeline(spark):
    """The MVT encode pipeline must never read the heavy `bytes` column."""
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    pts = cust.select("c_custkey", lon_of(F.col("c_custkey")), lat_of(F.col("c_custkey")))
    feats = tiling.point_features(pts, z=6, layer="c", feature_id=F.col("c_custkey"))
    audit.assert_read_schema_only(tiling.encode_tiles(feats), {"c_custkey"})


def test_dim_joins_broadcast(spark):
    audit.assert_broadcast_join(q03_join_agg(spark, SF))
    audit.assert_broadcast_join(q05_region_revenue(spark, SF))


def test_pip_join_broadcasts_polygons_no_cartesian(spark):
    points = spark.createDataFrame([(1, 0.0, 0.0)], "pt_id long, lon double, lat double")
    polys = spark.createDataFrame(
        [("p", [[[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0]]])],
        "polygon_id string, rings array<array<array<double>>>",
    )
    joined = spatial_join.pip_join(points, polys, z=4)
    audit.assert_broadcast_join(joined)
    audit.assert_no_cartesian(joined)


def test_knn_join_no_cartesian(spark):
    q = spark.createDataFrame([(1, 0.0, 0.0)], "query_id long, lon double, lat double")
    c = spark.createDataFrame([(2, 0.5, 0.5)], "cand_id long, lon double, lat double")
    audit.assert_no_cartesian(spatial_join.knn_join(q, c, k=1, z=4))


def test_whole_stage_codegen_on_tile_math(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    pts = cust.select("c_custkey", lon_of(F.col("c_custkey")), lat_of(F.col("c_custkey")))
    feats = tiling.point_features(pts, z=6, layer="c")
    assert audit.has_whole_stage_codegen(feats)


def test_encode_shuffle_count(spark):
    """The flagship sink needs exactly ONE shuffle (the tile repartition)."""
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    pts = cust.select("c_custkey", lon_of(F.col("c_custkey")), lat_of(F.col("c_custkey")))
    feats = tiling.point_features(pts, z=6, layer="c")
    assert audit.count_shuffles(tiling.encode_tiles(feats)) == 1


def test_ivf_assignment_no_exchange_on_candidates(spark):
    """IVF cell assignment must not shuffle or row-amplify the candidate
    side: the only Exchange in the full ivf_topk plan is the final
    per-query top-k window (plus AQE bookkeeping), never an n x n_cells
    blowup before it."""
    import numpy as np

    from vectortiles_spark.operators.similarity import ivf_topk

    rng = np.random.Generator(np.random.PCG64(3))
    cand = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    qs = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(2)],
        "query_id long, q_emb array<double>",
    )
    res = ivf_topk(qs, cand, k=3, n_cells=4, nprobe=2)
    plan = audit.plan_of(res)
    audit.assert_no_cartesian(res)
    # assignment side: candidates flow scan -> pandas UDF -> join with the
    # broadcast probes; the first Exchange must be the top-k window's
    # hashpartitioning on query_id, not anything keyed by vec_id/centroid
    first_exchange = None
    for line in plan.splitlines():
        if "Exchange" in line and "Reused" not in line:
            first_exchange = line
            break
    assert first_exchange is not None and "query_id" in first_exchange, (
        "first Exchange is not the per-query top-k:\n" + plan[:1500]
    )


def test_tile_pyramid_single_shuffle(spark):
    """The pyramid rollup is ONE shuffle regardless of level count
    (level-exploded keys + map-side partial agg) — never a shuffle per
    zoom, and never a recomputed leaf lineage per union branch."""
    leaf = spark.createDataFrame(
        [(6, x, y, 1) for x in range(8) for y in range(8)],
        "tile_z int, tile_x int, tile_y int, n_features long",
    )
    pyr = tiling.tile_pyramid(leaf, leaf_z=6, min_z=2)
    audit.assert_no_cartesian(pyr)
    assert audit.count_shuffles(pyr) == 1


def test_hash_split_is_pure_projection(spark):
    """hash_split must add ZERO shuffles and read only the columns used —
    at 10^12 rows the split is a scan, not a data movement."""
    from vectortiles_spark.operators.sampling import hash_split

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    split = hash_split(docs, "doc_id", {"train": 8, "val": 1, "test": 1})
    assert audit.count_shuffles(split) == 0
    audit.assert_read_schema_only(split, {"doc_id", "lang"})
    assert audit.has_whole_stage_codegen(split)


def test_sample_per_group_single_shuffle(spark):
    """Stratified sampling costs exactly the one window shuffle on the
    group keys (same exchange a groupBy would pay)."""
    from vectortiles_spark.operators.sampling import sample_per_group

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    picked = sample_per_group(docs, ["lang", "source"], 5, "doc_id")
    assert audit.count_shuffles(picked) == 1


def test_tfidf_shuffle_budget(spark):
    """TF-IDF = doc-term counts + term df + count-distinct + final window:
    the corpus-statistics shape needs a handful of exchanges, but must
    never go cartesian and the tiny n_docs side must broadcast."""
    from vectortiles_spark.plans.queries_text import q_tfidf_topk

    df = q_tfidf_topk(spark, SF)
    audit.assert_no_cartesian(df)
    audit.assert_broadcast_join(df)
    assert audit.count_shuffles(df) <= 8


def test_ingest_paths_shuffle_free(spark, tmp_path):
    """Every tile INGEST source composes scan -> mapInArrow decode with
    ZERO shuffles: tileset directory, MBTiles rowid ranges, and the
    decode itself — at 10^12 tiles the ingest cost must be one pass."""
    from vectortiles_spark.sources.mbtiles import read_mbtiles, write_mbtiles
    from vectortiles_spark.sources.tileset import read_tileset, write_tileset

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    pts = cust.select("c_custkey", lon_of(F.col("c_custkey")), lat_of(F.col("c_custkey")))
    tiles = tiling.encode_tiles(tiling.point_features(pts, z=4, layer="c"))

    root = str(tmp_path / "ts")
    write_tileset(tiles, root)
    assert audit.count_shuffles(tiling.decode_tiles(read_tileset(spark, root, z=4))) == 0

    mb = str(tmp_path / "t.mbtiles")
    write_mbtiles(tiles, mb)
    # one repartition distributes the (tiny) range table; the big tile
    # scan + decode itself adds none
    assert audit.count_shuffles(tiling.decode_tiles(read_mbtiles(spark, mb))) <= 1


def test_minhash_signatures_single_exchange(spark):
    """VERDICT r4 #2: the signature path must pay exactly ONE hash
    Exchange between the shingle explode and the signature groupBy — the
    old .distinct() added a second full shuffle of the suite's largest
    relation that min() aggregates never needed. A RoundRobin exchange
    BELOW the explode is allowed (and, on a 1-partition test file,
    expected): that is the derived-compute widening guard shuffling the
    raw docs, not the exploded shingle relation."""
    import re

    from vectortiles_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sig = minhash_signatures(docs)
    plan = audit.plan_of(sig)
    assert len(re.findall(r"\bExchange hash", plan)) == 1, plan
    assert len(re.findall(r"\bExchange (range|Single)", plan)) == 0, plan
    # widening guard may add at most one RoundRobin of the raw docs
    assert len(re.findall(r"\bExchange RoundRobin", plan)) <= 1, plan


def test_salted_cap_exchanges(spark):
    """The two-phase cap's first exchange must include the salt (that is
    what bounds per-task input on a metro tile); the exact re-rank then
    exchanges on the bare tile key."""
    import re

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    pts = cust.select("c_custkey", lon_of(F.col("c_custkey")), lat_of(F.col("c_custkey")))
    feats = tiling.point_features(pts, z=4, layer="c")
    capped = tiling.cap_features_per_tile(feats, 100, salt_buckets=8)
    plan = audit.plan_of(capped)
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("__salt" in p for p in parts), parts
    assert any("__salt" not in p and "tile_x" in p for p in parts), parts


def test_hll_sketch_two_shuffles_only(spark):
    """HLL = register agg (bucket shuffle) + estimate agg (group shuffle):
    exactly two exchanges, no join, nothing proportional to row count."""
    from vectortiles_spark.operators.sketches import hll_estimate, hll_registers

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    est = hll_estimate(hll_registers(li, "l_orderkey", ["l_returnflag"], b=10),
                       ["l_returnflag"], b=10)
    assert audit.count_shuffles(est) == 2, audit.plan_of(est)
    audit.assert_no_cartesian(est)


def test_corpus_pipeline_two_shuffles_only(spark):
    """The composed prep funnel must stay one fingerprint window + one
    aggregation — gates as flags, no per-stage materialization."""
    from vectortiles_spark.plans.queries_text import q_corpus_pipeline

    df = q_corpus_pipeline(spark, SF)
    # window exchange + agg exchange + the final orderBy range exchange
    assert audit.count_shuffles(df) <= 3, audit.plan_of(df)
    audit.assert_no_cartesian(df)


def test_interval_join_is_sortmerge_or_broadcast(spark):
    from vectortiles_spark.operators.temporal import interval_join

    events = spark.read.parquet(f"{SF}/events.parquet")
    pts = events.select("event_id", F.col("ts").cast("timestamp").alias("ts"))
    wins = spark.range(10).select(
        F.col("id").alias("wid"),
        F.timestamp_seconds(1704067200 + F.col("id") * 3600).alias("s"),
        F.timestamp_seconds(1704067200 + F.col("id") * 3600 + 1800).alias("e"),
    )
    j = interval_join(pts, wins, ts_col="ts", start_col="s", end_col="e", bin_s=1800)
    audit.assert_no_cartesian(j)


def test_focal_map_single_shuffle(spark):
    """The halo exchange is ONE shuffle on the tile key: strip emission
    is a zero-shuffle mapInPandas, assembly one bounded-group (<= 9
    parts) aggregation — never a self-join per neighbor direction."""
    import pandas as pd

    from vectortiles_spark.operators.raster import focal_map

    rasters = spark.createDataFrame(pd.DataFrame([
        {"tile_z": 3, "tile_x": x, "tile_y": y, "w": 8, "h": 8,
         "px": bytes(64)}
        for x in range(2) for y in range(2)
    ]))
    out = focal_map(rasters, op="grad")
    audit.assert_no_cartesian(out)
    assert audit.count_shuffles(out) == 1


def test_byte_cap_salted_exchanges(spark):
    """cap_tile_bytes mirrors the count cap's two-phase shape: first
    exchange includes the salt (bounding a metro tile's byte mass per
    task), the exact prefix re-rank exchanges on the bare tile key."""
    import re

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    pts = cust.select("c_custkey", lon_of(F.col("c_custkey")), lat_of(F.col("c_custkey")))
    feats = tiling.point_features(pts, z=4, layer="c", feature_id=F.col("c_custkey"))
    capped = tiling.cap_tile_bytes(feats, 256, salt_buckets=8)
    plan = audit.plan_of(capped)
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("__salt" in p for p in parts), parts
    assert any("__salt" not in p and "tile_x" in p for p in parts), parts


def test_hexbin_single_exchange_no_python(spark):
    """Hexbin is pure Column algebra into ONE hash aggregate: exactly one
    Exchange (the groupBy on the hex key) and zero Python eval nodes —
    the shape that keeps a 10^9-point density map a free map + one
    output-bounded shuffle."""
    from vectortiles_spark.operators.cluster import hexbin_points

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    pts = cust.select(
        "c_custkey", lon_of(F.col("c_custkey")), lat_of(F.col("c_custkey"))
    )
    hb = hexbin_points(pts, z=4, size_px=256, id_col="c_custkey",
                       projection="equirect")
    assert audit.count_shuffles(hb) == 1
    p = audit.plan_of(hb)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert audit.has_whole_stage_codegen(hb)


def test_quantize_embeddings_zero_shuffle_no_python(spark):
    """Quantization must stay a free map over the scan: zero Exchanges,
    zero Python eval nodes."""
    from vectortiles_spark.operators.similarity import quantize_embeddings

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = quantize_embeddings(emb.select("vec_id", "embedding"))
    assert audit.count_shuffles(q) == 0
    p = audit.plan_of(q)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_label_ops_zero_shuffle(spark):
    """label_points / line_label_anchors are mapInArrow passes: zero
    Exchanges — they run wherever the feature rows already are."""
    from vectortiles_spark.operators.labels import (
        label_points,
        line_label_anchors,
    )

    feats = spark.createDataFrame(
        [(3, 1, 2, "z", 3, 1, [9, 2, 2, 26, 20, 0, 0, 20, 15])],
        "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
        "feature_id bigint, geom_cmds array<bigint>",
    )
    assert audit.count_shuffles(label_points(feats)) == 0
    lines = feats.withColumn("geom_type", F.lit(2)).withColumn(
        "geom_cmds",
        F.expr("array(9, 0, 0, 18, 20, 0, 0, 20)").cast("array<bigint>"),
    )
    assert audit.count_shuffles(line_label_anchors(lines)) == 0


def test_plan_shards_bounded_exchanges(spark):
    """The shard planner's distributed scan: the per-tile relation passes
    through the prefix-group aggregate exchange — never a global
    single-partition window (no Window node over an empty partition spec
    in the plan)."""
    from vectortiles_spark.operators.sharding import plan_shards

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    tiles = (
        cust.select(
            (F.col("c_custkey") % 32).cast("int").alias("tile_x"),
            (F.col("c_custkey") % 16).cast("int").alias("tile_y"),
        )
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n"))
        .withColumn("tile_z", F.lit(5))
    )
    plan = plan_shards(tiles, 4, weight_col="n")
    p = audit.plan_of(plan)
    assert "Window" not in p, "global window would serialize the planet scan"
    # exchanges: the input aggregate's own shuffle + the prefix-group
    # hash partitioning for applyInPandas — bounded, never data-volume-
    # dependent beyond the per-tile relation itself
    assert audit.count_shuffles(plan) <= 3


def test_capped_encode_two_shuffles(spark):
    """encode_tiles(max_per_tile=...) folds the cap's exact phase-2 window
    into the encode repartition: exactly TWO shuffles total (the salted
    phase-1 exchange + the tile repartition), not three — the r6 plan fix
    (the literal tile_z must not re-insert an ENSURE_REQUIREMENTS
    exchange between the repartition and the window)."""
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    pts = cust.select("c_custkey", lon_of(F.col("c_custkey")), lat_of(F.col("c_custkey")))
    feats = tiling.point_features(pts, z=6, layer="c")
    capped = tiling.encode_tiles(feats, max_per_tile=100, single_layer="c")
    assert audit.count_shuffles(capped) == 2


def test_vector_chain_fuses_to_one_mapinarrow(spark):
    """clip -> simplify -> geom_features composes into ONE MapInArrow node
    (operators/_fuse): one Python worker per task, no JVM round trip for
    the nested-geometry intermediates. encode_tiles adds the second node
    after its shuffle."""
    from vectortiles_spark.operators.clip import clip_features
    from vectortiles_spark.operators.simplify import simplify_geoms

    lines = spark.createDataFrame(
        [("l", 2, 1, [[[[-10.0, 10.0], [10.0, -10.0]]]])],
        "layer string, geom_type int, feature_id long, "
        "geom array<array<array<array<double>>>>",
    )
    feats = tiling.geom_features(simplify_geoms(clip_features(lines, z=3), tolerance=1.0))
    assert audit.plan_of(feats).count("MapInArrow") == 1
    full = tiling.encode_tiles(feats)
    assert audit.plan_of(full).count("MapInArrow") == 2
