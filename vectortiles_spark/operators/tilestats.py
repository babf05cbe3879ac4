"""Tilestats: per-layer / per-attribute statistics of a tile set.

The mbtiles ecosystem ships a ``tilestats`` metadata object next to a
tile set (mapbox/mbtiles-spec tilestats extension): per layer, the
feature count and geometry-type breakdown; per attribute, the value
type, distinct-value count, and numeric/string ranges. This module
computes exactly that grain as PURE Column algebra over the canonical
feature relation (tiling.FEATURE_SCHEMA — the same rows decode_tiles
emits and the feature builders feed the sink), so in a production
pipeline the stats come from the relation you are ABOUT to encode at
zero extra decode cost; ``tilestats`` wraps the blob-level case
(existing tile set, one decode pass) for completeness.

Scale shape: explode(meta) preserves partitioning, then everything
funnels into hash aggregates whose output cardinality is (layers x
attributes) — bounded by schema, not data, so map-side partial
aggregation collapses each task's contribution to a handful of rows
before the exchange. Two aggregates (attribute grain + layer grain)
joined by broadcast: the layer grain is trivially small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..mvt import codec


def attribute_stats(features: DataFrame) -> DataFrame:
    """Per (layer, attribute): occurrence count, exact distinct-value
    count, the mapbox-tilestats type class ('string' | 'number' |
    'boolean', or 'mixed' when a key carries several), and min/max over
    the numeric and string projections. Input: FEATURE_SCHEMA-shaped
    rows (a ``meta`` array of typed structs)."""
    m = F.col("m")
    cls = (
        F.when(m["tag"] == codec.VAL_STRING, F.lit("string"))
        .when(m["tag"] == codec.VAL_BOOL, F.lit("boolean"))
        .otherwise(F.lit("number"))
    )
    num = F.coalesce(m["d"], m["i"].cast("double"))
    ex = features.select("layer", F.explode("meta").alias("m")).select(
        "layer",
        m["key"].alias("attribute"),
        cls.alias("cls"),
        num.alias("num"),
        m["s"].alias("s"),
        F.struct(m["tag"], m["s"], m["d"], m["i"], m["b"]).alias("val"),
    )
    return ex.groupBy("layer", "attribute").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("val").alias("n_distinct"),
        F.when(F.countDistinct("cls") > 1, F.lit("mixed"))
        .otherwise(F.max("cls"))
        .alias("att_type"),
        F.min("num").alias("min_num"),
        F.max("num").alias("max_num"),
        F.min("s").alias("min_str"),
        F.max("s").alias("max_str"),
    )


def layer_stats(features: DataFrame) -> DataFrame:
    """Per layer: feature count, geometry-type breakdown, tile count."""
    gt = F.col("geom_type")
    return features.groupBy("layer").agg(
        F.count("*").alias("n_features"),
        F.sum((gt == 1).cast("long")).alias("n_points"),
        F.sum((gt == 2).cast("long")).alias("n_lines"),
        F.sum((gt == 3).cast("long")).alias("n_polys"),
        F.countDistinct(F.struct("tile_z", "tile_x", "tile_y")).alias("n_tiles"),
    )


def tilestats(tiles: DataFrame, layers=None) -> DataFrame:
    """Blob-level convenience: decode an existing tile set and return the
    attribute grain joined with its layer rollup (layer, attribute,
    att_type, n_rows, n_distinct, min/max num+str, n_features, n_points,
    n_lines, n_polys, n_tiles). Decodes twice unless the caller persists
    the decoded relation — production pipelines should call
    attribute_stats/layer_stats on the feature relation they already
    have, where this costs one bounded aggregate and no decode."""
    from .tiling import decode_tiles

    feats = decode_tiles(tiles, layers=layers)
    return attribute_stats(feats).join(
        F.broadcast(layer_stats(feats)), "layer"
    )
