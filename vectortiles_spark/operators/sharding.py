"""Balanced tile shard planning: contiguous quadkey ranges sized by load.

A planet tileset is served from K shards (cache nodes, DB partitions,
object-store prefixes). The classic plan assigns each shard one
CONTIGUOUS range of the space-filling-curve order — quadkey order is the
Bing/Azure convention — sized so every shard carries ~total/K of the
weight (tile bytes, request counts, feature counts). Contiguity keeps
neighboring tiles on the same shard (locality for viewport fetches) and
makes the shard map itself tiny: K-1 split keys.

``plan_shards`` computes the assignment with a DISTRIBUTED exclusive
prefix sum — the textbook two-phase scan, because a single global window
over the tile relation would funnel a planet's tile list through one
task. The scan is partitioned by a DATA-INDEPENDENT key: the first
``prefix_depth`` quadkey digits. Lexicographic prefixes are monotone in
quadkey order, so prefix groups are contiguous ranges of the global
order with FIXED boundaries — no sampling, no persisted layout to keep
alive, and the two phases agree by construction:

1. one tiny aggregate collects per-prefix totals to the driver
   (<= 4^prefix_depth numbers — bytes, not data) and prefix-sums them
   into per-group offsets;
2. one ``applyInPandas`` per prefix group sorts its slice by quadkey and
   adds the group's offset to the local running sum. Group size is
   bounded by the prefix subtree (4^(z - prefix_depth) tiles), the same
   kind of structural skew bound the focal/zonal operators use.

Shard id is then pure integer arithmetic — ``shard = prefix_excl * K
div total`` (exact bigint, no floats anywhere) — so the whole plan
replays bit-for-bit in a SQL engine's window cumsum, and re-running on
any partitioning of the same rows yields the identical plan.

Guarantees (tested): shards partition the quadkey order into <= K
contiguous intervals; a shard's weight never exceeds ceil(total/K) +
(max tile weight - 1) (a tile is never split); deterministic in the
row SET.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tiles import quadkey


def plan_shards(
    tiles: DataFrame,
    n_shards: int,
    weight_col: str | None = None,
    z_col: str = "tile_z",
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    prefix_depth: int = 3,
) -> DataFrame:
    """One row per input tile: ``(tile_z, tile_x, tile_y, qk, weight,
    prefix_excl, shard_id)``. ``weight_col`` defaults to 1 per tile
    (count-balanced). Weights must be non-negative (checked, loud raise
    — negative weights make 'balanced prefix ranges' meaningless).
    Duplicate (z, x, y) tiles raise: the plan's determinism contract is
    per unique tile (aggregate duplicates upstream).

    Mixed zooms are legal: quadkey STRING order is hierarchical (a
    parent sorts immediately before its subtree), so a mixed-zoom plan
    keeps each subtree contiguous.

    The planner scans ``tiles`` three times (distinct zooms, per-prefix
    totals, the assignment pass) — if the relation is derived from an
    expensive upstream, ``.persist()`` it first; the plan itself is
    deterministic either way.
    """
    import pandas as pd

    if n_shards < 1:
        raise ValueError(f"n_shards={n_shards} must be >= 1")
    if not 1 <= prefix_depth <= 10:
        raise ValueError(f"prefix_depth={prefix_depth} outside [1, 10]")
    out_schema = (
        "tile_z int, tile_x int, tile_y int, qk string, weight bigint, "
        "prefix_excl bigint, shard_id int"
    )
    zs = sorted(r[0] for r in tiles.select(z_col).distinct().collect())
    if not zs:
        return tiles.sparkSession.createDataFrame([], out_schema)
    if zs[0] < 1:
        # z=0 has no quadkey digits, so prefix grouping is undefined for it
        # — raise a planner-level error instead of quadkey()'s generic one
        raise ValueError(
            f"plan_shards: tile_z={zs[0]} — the planner needs tile_z >= 1 "
            "(the z=0 root tile has an empty quadkey; shard it trivially or "
            "start from its children)"
        )
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    # per-zoom quadkey expression (quadkey() needs a literal z), stitched
    # with one CASE — distinct zooms are tiny and bounded (<= ~23 levels)
    qk = F.when(
        F.col(z_col) == int(zs[0]), quadkey(int(zs[0]), F.col(x_col), F.col(y_col))
    )
    for z in zs[1:]:
        qk = qk.when(
            F.col(z_col) == int(z), quadkey(int(z), F.col(x_col), F.col(y_col))
        )
    base = tiles.select(
        F.col(z_col).cast("int").alias("tile_z"),
        F.col(x_col).cast("int").alias("tile_x"),
        F.col(y_col).cast("int").alias("tile_y"),
        qk.alias("qk"),
        w.alias("weight"),
    ).withColumn("__pfx", F.substring("qk", 1, prefix_depth))

    stats = base.groupBy("__pfx").agg(
        F.sum("weight").alias("__w"),
        F.min("weight").alias("__minw"),
        F.count(F.lit(1)).alias("__n"),
        F.count("weight").alias("__nw"),
    ).collect()
    if any(s["__minw"] is not None and s["__minw"] < 0 for s in stats):
        raise ValueError("plan_shards: negative weight — weights must be >= 0")
    if any(s["__n"] != s["__nw"] for s in stats):
        raise ValueError(
            "plan_shards: NULL weight — every tile needs a non-null, "
            "non-negative weight"
        )
    totals = {s["__pfx"]: int(s["__w"]) for s in stats}
    total = sum(totals.values())
    if total > (1 << 62) // int(n_shards):
        # the assignment multiplies int64 cume * n_shards — near 2^63/K it
        # would silently wrap (and the clip(0, K-1) below would mask it);
        # raise loudly (weights this large mean mis-scaled inputs anyway)
        raise ValueError(
            f"plan_shards: total weight {total} * n_shards={n_shards} would "
            "overflow int64 — rescale the weights (relative balance is all "
            "the planner uses)"
        )
    offsets = {}
    run = 0
    for pfx in sorted(totals):
        offsets[pfx] = run
        run += totals[pfx]
    K = int(n_shards)

    def assign(key, pdf):
        pdf = pdf.sort_values("qk", kind="mergesort")
        if pdf["qk"].duplicated().any():
            d = pdf[pdf["qk"].duplicated()].iloc[0]
            raise ValueError(
                f"plan_shards: duplicate tile ({d.tile_z},{d.tile_x},"
                f"{d.tile_y}) — aggregate duplicates upstream"
            )
        wv = pdf["weight"].to_numpy()
        cume = wv.cumsum() - wv + offsets[key[0]]  # exclusive prefix
        shard = cume * K // total if total > 0 else cume * 0
        return pd.DataFrame(
            {
                "tile_z": pdf["tile_z"],
                "tile_x": pdf["tile_x"],
                "tile_y": pdf["tile_y"],
                "qk": pdf["qk"],
                "weight": pdf["weight"],
                "prefix_excl": cume.astype("int64"),
                "shard_id": shard.clip(0, K - 1).astype("int32"),
            }
        )

    return base.groupBy("__pfx").applyInPandas(assign, schema=out_schema)
