"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "throughput": {...}}   # extra context fields are additive

The headline set covers the engine's pillars: the flagship MVT tile-encode
pipeline (tiles/sec — the BASELINE.md comparison point), relational core,
spatial join/kNN, dedup, and similarity search.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

N_IMAGES = int(os.environ.get("BENCH_IMAGES", "200000"))
IMAGES_CACHE = os.environ.get("BENCH_IMAGES_PATH", f"/tmp/bench_images_{N_IMAGES}")
N_LINES = int(os.environ.get("BENCH_LINES", "20000"))
LINES_CACHE = os.environ.get("BENCH_LINES_PATH", f"/tmp/bench_lines_{N_LINES}")


def _ensure_images(spark):
    """Materialize the deterministic synthetic image table once (generation
    cost — image encode + phash — is not part of the tiling measurement)."""
    if not os.path.exists(f"{IMAGES_CACHE}/_SUCCESS"):
        from vectortiles_spark.sources.synth import write_images_table

        write_images_table(spark, IMAGES_CACHE, N_IMAGES)
    return spark.read.parquet(IMAGES_CACHE)


def bench_mvt_encode(spark, sf_dir):
    """Flagship: point features -> groupBy(z,x,y) -> MVT bytes."""
    from vectortiles_spark.operators import tiling

    imgs = _ensure_images(spark)
    feats = tiling.point_features(
        imgs, z=10, layer="images",
        feature_id=F.xxhash64("image_id"),
        meta={"caption": F.col("caption"), "phash": F.col("phash")},
    )
    tiles = tiling.encode_tiles(feats, max_per_tile=50000, single_layer="images")
    agg = tiles.agg(
        F.count("*").alias("n_tiles"),
        F.sum("n_features").alias("n_features"),
        F.sum(F.length("mvt")).alias("bytes"),
    ).collect()[0]
    return {"n_tiles": agg.n_tiles, "n_features": agg.n_features, "mvt_bytes": agg.bytes}


def _ensure_lines(spark):
    if not os.path.exists(f"{LINES_CACHE}/_SUCCESS"):
        from vectortiles_spark.sources.synth import lines_df

        lines_df(spark, N_LINES).write.mode("overwrite").parquet(LINES_CACHE)
    return spark.read.parquet(LINES_CACHE)


def bench_vector_pipeline(spark):
    """The full vector tiler: world polylines -> clip to z=8 tiles (with
    seam buffer) -> Douglas-Peucker generalization -> command streams ->
    MVT blobs. Exercises every geometry stage the engine ships."""
    from vectortiles_spark.operators import tiling
    from vectortiles_spark.operators.clip import clip_features
    from vectortiles_spark.operators.simplify import simplify_geoms

    lines = _ensure_lines(spark)
    clipped = clip_features(lines, z=8, buffer_px=8)
    simp = simplify_geoms(clipped, tolerance=8.0)
    tiles = tiling.encode_tiles(tiling.geom_features(simp))
    agg = tiles.agg(
        F.count("*").alias("n_tiles"),
        F.sum("n_features").alias("n_features"),
        F.sum(F.length("mvt")).alias("bytes"),
    ).collect()[0]
    return {"n_tiles": agg.n_tiles, "n_features": agg.n_features, "mvt_bytes": agg.bytes}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from vectortiles_spark.session import get_spark

    spark = get_spark(app_name="bench")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    headline = [
        "q01_pricing_summary",
        "q03_join_agg",
        "q_knn_ring",
        "q_pip_rect",
        "q_dedup_exact",
        "q_minhash_near_dups",
        "q_cosine_topk",
        "q_tile_assign",
    ]
    timings: dict[str, float] = {}
    extras: dict[str, object] = {}

    # flagship MVT encode first (its own synthetic input; materialize the
    # input table BEFORE the clock so generation cost isn't measured, and
    # run one untimed pass so python-worker startup + first-touch page
    # faults don't pollute the steady-state number)
    _ensure_images(spark)
    bench_mvt_encode(spark, sf_dir)
    t0 = time.perf_counter()
    stats = bench_mvt_encode(spark, sf_dir)
    dt = time.perf_counter() - t0
    timings["mvt_encode"] = round(dt, 3)
    extras["mvt"] = {
        **{k: int(v) for k, v in stats.items()},
        "tiles_per_sec": round(stats["n_tiles"] / dt, 1),
        "features_per_sec": round(stats["n_features"] / dt, 1),
    }

    # composed vector pipeline (clip -> simplify -> encode), same
    # warmup-then-measure protocol as the flagship
    _ensure_lines(spark)
    bench_vector_pipeline(spark)
    t0 = time.perf_counter()
    vstats = bench_vector_pipeline(spark)
    dt = time.perf_counter() - t0
    timings["vector_pipeline"] = round(dt, 3)
    extras["vector"] = {
        **{k: int(v) for k, v in vstats.items()},
        "lines_in": N_LINES,
        "features_per_sec": round(vstats["n_features"] / dt, 1),
    }

    for name in headline:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        extras.setdefault("rows", {})[name] = n

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "throughput": extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
