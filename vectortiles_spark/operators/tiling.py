"""Tile assembly: feature rows -> one MVT byte blob per (z, x, y).

The flagship sink (SURVEY.md §2.D8, north_star): a
``groupBy(tile_z, tile_x, tile_y).applyInPandas(encode)`` stage whose
emitted tiles roundtrip-decode to exactly the features that went in,
using the reference's MVT semantics (zigzag delta commands, layer/feature/
value protobuf layout — Internal.hs:114-125 + SURVEY.md §1.3).

Scale design:
* Geometry is encoded to uint32 command streams UPSTREAM of the shuffle —
  for point features with pure Column math (JVM-side, whole-stage codegen),
  for lines/polygons with the NumPy kernel inside vectorized UDFs. The
  per-tile Python stage only does dictionary builds + wire framing.
* Hot tiles (dense metros) are bounded with a deterministic per-tile
  feature cap (rank window) BEFORE the shuffle — the same strategy
  planet-scale tilers use — so no task can receive an unbounded group.
* The shuffle key is (tile_z, tile_x, tile_y); AQE coalesces the long tail
  of tiny ocean tiles.

Feature-row schema (the engine's canonical feature exchange format):
    tile_z INT, tile_x INT, tile_y INT, layer STRING, geom_type INT,
    feature_id LONG, meta ARRAY<STRUCT<key:STRING, tag:INT, s:STRING,
    d:DOUBLE, i:LONG, b:BOOLEAN>>, geom_cmds ARRAY<BIGINT>
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tiles import tile_px, tile_py, tile_x, tile_y, zigzag
from ..mvt import codec

TILE_SCHEMA = "tile_z int, tile_x int, tile_y int, mvt binary, n_features long, n_layers int"

META_FIELD = "array<struct<key:string,tag:int,s:string,d:double,i:bigint,b:boolean>>"
FEATURE_SCHEMA = (
    "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
    f"feature_id bigint, meta {META_FIELD}, geom_cmds array<bigint>"
)


def meta_string(key: str, col) -> object:
    return F.struct(
        F.lit(key).alias("key"), F.lit(codec.VAL_STRING).alias("tag"),
        col.cast("string").alias("s"), F.lit(None).cast("double").alias("d"),
        F.lit(None).cast("bigint").alias("i"), F.lit(None).cast("boolean").alias("b"),
    )


def meta_double(key: str, col) -> object:
    return F.struct(
        F.lit(key).alias("key"), F.lit(codec.VAL_DOUBLE).alias("tag"),
        F.lit(None).cast("string").alias("s"), col.cast("double").alias("d"),
        F.lit(None).cast("bigint").alias("i"), F.lit(None).cast("boolean").alias("b"),
    )


def meta_int(key: str, col) -> object:
    return F.struct(
        F.lit(key).alias("key"), F.lit(codec.VAL_INT).alias("tag"),
        F.lit(None).cast("string").alias("s"), F.lit(None).cast("double").alias("d"),
        col.cast("bigint").alias("i"), F.lit(None).cast("boolean").alias("b"),
    )


def meta_bool(key: str, col) -> object:
    return F.struct(
        F.lit(key).alias("key"), F.lit(codec.VAL_BOOL).alias("tag"),
        F.lit(None).cast("string").alias("s"), F.lit(None).cast("double").alias("d"),
        F.lit(None).cast("bigint").alias("i"), col.cast("boolean").alias("b"),
    )


def point_features(
    df: DataFrame,
    z: int,
    layer: str = "images",
    lon: str = "lon",
    lat: str = "lat",
    feature_id=None,
    meta: list | None = None,
    extent: int = codec.DEFAULT_EXTENT,
) -> DataFrame:
    """Rows with lon/lat -> canonical point-feature rows, all JVM-side.

    The MVT command stream for a single point is [MoveTo(1), zig(px),
    zig(py)] (ref Internal.hs:158-159 with cursor (0,0)) — emitted here as
    a pure Column expression so the geometry encode happens inside
    whole-stage codegen, not Python.
    """
    lon_c, lat_c = F.col(lon), F.col(lat)
    fid = feature_id if feature_id is not None else F.monotonically_increasing_id()
    header = F.lit((1 << 3) | 1).cast("bigint")  # MoveTo, count 1 -> 9
    return df.select(
        F.lit(z).cast("int").alias("tile_z"),
        tile_x(lon_c, z).alias("tile_x"),
        tile_y(lat_c, z).alias("tile_y"),
        F.lit(layer).alias("layer"),
        F.lit(1).alias("geom_type"),
        fid.cast("bigint").alias("feature_id"),
        (F.array(*meta) if meta else F.array().cast(META_FIELD)).alias("meta"),
        F.array(
            header,
            zigzag(tile_px(lon_c, z, extent)).cast("bigint"),
            zigzag(tile_py(lat_c, z, extent)).cast("bigint"),
        ).alias("geom_cmds"),
    )


def cap_features_per_tile(features: DataFrame, max_per_tile: int, order_by: str = "feature_id") -> DataFrame:
    """Deterministic hot-tile bound: keep the first `max_per_tile` features
    per (tile, layer) by `order_by`. This runs BEFORE the encode shuffle so
    no single task ever receives an unbounded metro tile (SURVEY.md §2.D10)."""
    w = Window.partitionBy("tile_z", "tile_x", "tile_y", "layer").orderBy(F.col(order_by))
    return (
        features.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_tile)
        .drop("__rn")
    )


def _meta_to_dict(meta) -> dict:
    out = {}
    if meta is None:
        return out
    for m in meta:
        tag = m["tag"]
        if tag == codec.VAL_STRING:
            out[m["key"]] = (tag, m["s"])
        elif tag == codec.VAL_DOUBLE:
            out[m["key"]] = (tag, float(m["d"]))
        elif tag in (codec.VAL_INT, codec.VAL_UINT, codec.VAL_SINT):
            out[m["key"]] = (tag, int(m["i"]))
        elif tag == codec.VAL_BOOL:
            out[m["key"]] = (tag, bool(m["b"]))
    return out


def _encode_tile_group_arrow(tbl):
    """One Arrow batch = one tile's features -> one (z, x, y, mvt) row.

    Arrow in/out (``applyInArrow``) rather than pandas: nullable BIGINT
    struct fields survive exactly (pandas coerces them to float64, which
    corrupts 64-bit ints like phash beyond 2^53), and the conversion is
    cheaper — no pandas block consolidation per group.
    """
    import pyarrow as pa

    from ..mvt import wire

    z = tbl["tile_z"][0].as_py()
    x = tbl["tile_x"][0].as_py()
    y = tbl["tile_y"][0].as_py()
    layers_col = tbl["layer"].to_pylist()
    fids = tbl["feature_id"].to_pylist()
    metas = tbl["meta"].to_pylist()
    gts = tbl["geom_type"].to_pylist()
    cmds_col = tbl["geom_cmds"].to_pylist()

    by_layer: dict[str, list] = {}
    n_feats = 0
    for name, fid, meta, gt, cmds in zip(layers_col, fids, metas, gts, cmds_col):
        if not cmds:
            continue  # empty geometry would be undecodable (Internal.hs:296)
        by_layer.setdefault(name, []).append(
            (int(fid), _meta_to_dict(meta), int(gt), np.asarray(cmds, dtype=np.uint32))
        )
        n_feats += 1

    body = bytearray()
    for name in sorted(by_layer):  # deterministic layer order
        body += wire.len_delimited(3, codec.encode_layer_from_streams(name, by_layer[name]))

    return pa.table(
        {
            "tile_z": pa.array([z], pa.int32()),
            "tile_x": pa.array([x], pa.int32()),
            "tile_y": pa.array([y], pa.int32()),
            "mvt": pa.array([bytes(body)], pa.binary()),
            "n_features": pa.array([n_feats], pa.int64()),
            "n_layers": pa.array([len(by_layer)], pa.int32()),
        }
    )


def encode_tiles(features: DataFrame, max_per_tile: int | None = None) -> DataFrame:
    """The flagship sink: canonical feature rows -> one MVT row per tile."""
    if max_per_tile is not None:
        features = cap_features_per_tile(features, max_per_tile)
    return features.groupBy("tile_z", "tile_x", "tile_y").applyInArrow(
        _encode_tile_group_arrow, schema=TILE_SCHEMA
    )


def tile_stats(features: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Per-tile feature counts via SALTED two-phase aggregation.

    Demonstrates the skew treatment for hot-tile aggregates (SURVEY.md
    §2.D10): partial aggregate on (tile, salt) spreads a metro tile across
    `salt_buckets` reducers, then a cheap second aggregate merges the
    partials. (For simple counts Spark's map-side partial agg already does
    this; the explicit form is the template for non-algebraic aggregates.)
    """
    salted = features.withColumn(
        "__salt", F.pmod(F.hash(F.col("feature_id")), F.lit(salt_buckets))
    )
    partial = salted.groupBy("tile_z", "tile_x", "tile_y", "__salt").agg(
        F.count("*").alias("partial_n"),
        F.approx_count_distinct("layer").alias("partial_layers"),
    )
    return partial.groupBy("tile_z", "tile_x", "tile_y").agg(
        F.sum("partial_n").alias("n_features"),
        F.max("partial_layers").alias("n_layers_approx"),
    )
