"""Extra benchmarks (guide §1.4): isolate individual declared queries with
the noop sink so the computation is timed, not the sink, and dump
`.explain("formatted")` on request. NOT part of the driver contract —
bench.py stays the frozen measurement harness; numbers from here are
cited as evidence in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py [--sf-dir DIR] [--passes N] [--explain OUTDIR] \
        [--count] q_name [q_name ...]

Times each query with one untimed warmup pass then best-of-N noop-sink
passes (clearCache between passes — operators that .cache() internally
still pay full compute each pass). --count uses .count() instead of the
noop sink to mirror bench.py's action shape. --explain writes
<OUTDIR>/<name>.txt with the formatted plan (no execution).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir to write formatted plans to")
    ap.add_argument("--suffix", default="", help="filename suffix for --explain (e.g. _after)")
    ap.add_argument("--count", action="store_true", help="use .count() like bench.py instead of the noop sink")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from vectortiles_spark.session import get_spark

    spark = get_spark(app_name="bench_extra")
    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    out: dict[str, object] = {}
    for name in args.queries:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"bench_extra {name}")

        def run_once():
            df = fn(spark, args.sf_dir)
            if args.count:
                return df.count()
            df.write.format("noop").mode("overwrite").save()
            return None

        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            Path(args.explain, f"{name}{args.suffix}.txt").write_text(plan)
        if args.passes <= 0:
            continue  # --passes 0: plan capture only
        walls = []
        if not args.no_warmup:
            run_once()
            spark.catalog.clearCache()
        for _ in range(args.passes):
            t0 = time.perf_counter()
            run_once()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"best_sec": min(walls), "walls_sec": walls}
        print(f"{name}: best {min(walls)}s of {walls}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
