"""Scaling-efficiency evidence (north_rule): run the identical flagship
tile-encode job at two parallelism levels (local[N] vs local[4N]) on the
same input and report throughput at both plus efficiency.

No multi-node cluster exists in this sandbox (BASELINE.md), so parallelism
levels stand in for cluster sizes; each level runs in a FRESH subprocess =
fresh JVM, so no executor/thread-pool state leaks between levels.

Usage: python bench_scaling.py [n_small] [n_images]   (default 8, 400000)
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from vectortiles_spark.session import get_spark
from pyspark.sql import functions as F
from vectortiles_spark.operators import tiling

cpus = {cpus}
spark = get_spark(app_name=f"scale{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=64)
imgs = spark.read.parquet({images!r})
feats = tiling.point_features(
    imgs, z=12, layer="images", feature_id=F.xxhash64("image_id"),
    meta={{"caption": F.col("caption"), "phash": F.col("phash")}},
)
best = None
for trial in range({trials}):
    t0 = time.perf_counter()
    r = feats  # rebuild plan each trial (no caching between trials)
    agg = tiling.encode_tiles(feats, partitions=64, single_layer="images").agg(
        F.count("*").alias("t"), F.sum("n_features").alias("f")).collect()[0]
    dt = time.perf_counter() - t0
    if best is None or dt < best[0]:
        best = (dt, agg.t, agg.f)
print(json.dumps({{"cpus": cpus, "sec": best[0], "tiles": best[1], "features": best[2]}}))
spark.stop()
"""


def run_level(cpus: int, images: str, trials: int = 2) -> dict:
    code = _CHILD.format(repo=str(REPO), cpus=cpus, images=images, trials=trials)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 20000000
    light = n_images > 2000000  # big scale runs skip image payload synthesis
    images = f"/tmp/bench_images_{n_images}" + ("_light" if light else "")
    if not os.path.exists(f"{images}/_SUCCESS"):
        from vectortiles_spark.session import get_spark
        from vectortiles_spark.sources.synth import write_images_table

        spark = get_spark(app_name="gen")
        write_images_table(spark, images, n_images, light=light)
        spark.stop()

    small = run_level(n_small, images)
    big = run_level(n_small * 4, images)
    speedup = small["sec"] / big["sec"]
    efficiency = speedup / 4.0
    result = {
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "n_images": n_images,
        "levels": {
            f"local[{n_small}]": {
                "sec": round(small["sec"], 2),
                "tiles_per_sec": round(small["tiles"] / small["sec"], 1),
                "features_per_sec": round(small["features"] / small["sec"], 1),
            },
            f"local[{n_small * 4}]": {
                "sec": round(big["sec"], 2),
                "tiles_per_sec": round(big["tiles"] / big["sec"], 1),
                "features_per_sec": round(big["features"] / big["sec"], 1),
            },
        },
        "speedup": round(speedup, 2),
    }
    print(json.dumps(result))

    os.makedirs(REPO / "BENCH", exist_ok=True)
    (REPO / "BENCH" / "scaling_last_run.json").write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
