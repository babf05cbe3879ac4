"""Microbench: layer-selective partial decode vs full decode.

Mirrors the reference's lazy-decode data-access rows (bench/Bench.hs:63-67,
bench/results.txt: one layer of roads.mvt 6.4 ms vs 9.8 ms full): here the
selective path length-skips non-matching layer messages after a name peek,
so one-layer cost should track that layer's share of the blob plus a tiny
per-layer peek, not the full parse.

Usage: python scripts/bench_partial_decode.py [n_iter]
Prints one JSON line with per-mode ms/tile on the roads fixture.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vectortiles_spark.mvt import codec

FIXTURE = "/root/reference/test/roads.mvt"


def best_ms(fn, n):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    data = open(FIXTURE, "rb").read()
    full = codec.decode_tile(data)
    sizes = {name: len(codec.encode_layer(l)) for name, l in full.items()}
    total = sum(sizes.values())
    out = {
        "fixture": "roads.mvt",
        "n_layers": len(full),
        "blob_bytes": len(data),
        "full_ms": round(best_ms(lambda: codec.decode_tile(data), n), 3),
    }
    for name in ("road", "water", "poi_label"):
        ms = best_ms(lambda: codec.decode_tile(data, layers=[name]), n)
        out[f"one_layer_{name}_ms"] = round(ms, 3)
        out[f"one_layer_{name}_byte_share"] = round(sizes[name] / total, 3)
    out["skip_all_ms"] = round(
        best_ms(lambda: codec.decode_tile(data, layers=["nope"]), n), 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
