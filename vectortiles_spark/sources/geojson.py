"""GeoJSON (RFC 7946) line-delimited source/sink for the vector pipeline.

Vector data arrives as GeoJSON far more often than as MVT; this maps
Feature lines to the engine's canonical world-space geometry frame
(``layer, geom_type, feature_id, properties, geom`` with geom =
parts x rings x points x [lon, lat] doubles — ready for ``clip_features``)
and back. A Multi* geometry is just more parts, exactly the reference's
model (VectorTile.hs:118-119).

Scale shape: everything is JVM-side Column algebra — the file scan reads
``coordinates`` as a raw JSON subtree string (Spark's JSON reader
serializes any field a string schema points at), and ``from_json`` parses
it with the per-type arity once the geometry type is known. No Python
touches a row on either direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_READ_SCHEMA = (
    "type string, id string, properties map<string,string>, "
    "geometry struct<type:string, coordinates:string>"
)

_D1 = "array<double>"
_D2 = "array<array<double>>"
_D3 = "array<array<array<double>>>"
_D4 = "array<array<array<array<double>>>>"


def read_geojson(spark: SparkSession, path: str, layer: str = "features") -> DataFrame:
    """Line-delimited GeoJSON Features -> canonical feature frame.

    Geometry types map Point/MultiPoint -> 1, LineString/MultiLineString
    -> 2, Polygon/MultiPolygon -> 3 (the codec's three concrete types;
    GeometryCollection is not part of the MVT model and such rows are
    dropped, as are features whose coordinates are missing or malformed —
    one corrupt line must not abort a planet-scale ingest). The optional
    third position element (altitude, RFC 7946 §3.1.1) is stripped.
    Missing ids become 0, the protobuf default (VectorTile.hs:123);
    string ids (legal GeoJSON, no MVT equivalent) hash to a stable
    64-bit id via xxhash64."""
    raw = spark.read.schema(_READ_SCHEMA).json(path)
    gt = F.col("geometry.type")
    c = F.col("geometry.coordinates")
    p2 = lambda pos: F.slice(pos, 1, 2)  # strip altitude
    point = F.array(F.array(F.array(p2(F.from_json(c, _D1)))))
    multipoint = F.transform(
        F.from_json(c, _D2), lambda p: F.array(F.array(p2(p)))
    )
    line = F.array(F.array(F.transform(F.from_json(c, _D2), p2)))
    multiline = F.transform(
        F.from_json(c, _D3), lambda l: F.array(F.transform(l, p2))
    )
    polygon = F.array(
        F.transform(F.from_json(c, _D3), lambda ring: F.transform(ring, p2))
    )
    multipolygon = F.transform(
        F.from_json(c, _D4),
        lambda poly: F.transform(poly, lambda ring: F.transform(ring, p2)),
    )
    geom = (
        F.when(gt == "Point", point)
        .when(gt == "MultiPoint", multipoint)
        .when(gt == "LineString", line)
        .when(gt == "MultiLineString", multiline)
        .when(gt == "Polygon", polygon)
        .when(gt == "MultiPolygon", multipolygon)
    )
    geom_type = (
        F.when(gt.isin("Point", "MultiPoint"), 1)
        .when(gt.isin("LineString", "MultiLineString"), 2)
        .when(gt.isin("Polygon", "MultiPolygon"), 3)
    )
    # malformed features drop, they don't crash: a null/short position
    # buried at the innermost level would otherwise abort the whole task
    # in arrow_geom's arity check downstream
    pts_flat = F.flatten(F.flatten(geom))
    valid = (
        geom.isNotNull()
        & pts_flat.isNotNull()
        & ~F.exists(pts_flat, lambda p: p.isNull() | (F.size(p) != 2))
    )
    fid = F.coalesce(
        F.col("id").try_cast("bigint"),
        F.when(F.col("id").isNotNull(), F.xxhash64(F.col("id"))),
        F.lit(0),
    )
    return (
        raw.filter(geom_type.isNotNull() & valid)
        .select(
            F.lit(layer).alias("layer"),
            geom_type.cast("int").alias("geom_type"),
            fid.cast("bigint").alias("feature_id"),
            F.coalesce(F.col("properties"), F.create_map().cast("map<string,string>")).alias("properties"),
            geom.alias("geom"),
        )
    )


def geojson_lines(
    df: DataFrame,
    geom_type_col: str = "geom_type",
    geom_col: str = "geom",
    feature_id_col: str = "feature_id",
    properties_col: str | None = "properties",
) -> DataFrame:
    """Canonical feature frame -> one GeoJSON Feature text line per row
    (column ``line``). Single-part geometry emits the scalar type,
    multi-part the Multi* type — the inverse of read_geojson's mapping."""
    gt = F.col(geom_type_col)
    g = F.col(geom_col)
    single = F.size(g) == 1
    pts = F.flatten(F.transform(g, lambda part: part[0]))  # all points (pts/lines use ring 0)
    rings0 = F.transform(g, lambda part: part[0])
    gname = (
        F.when((gt == 1) & single, "Point")
        .when(gt == 1, "MultiPoint")
        .when((gt == 2) & single, "LineString")
        .when(gt == 2, "MultiLineString")
        .when((gt == 3) & single, "Polygon")
        .otherwise("MultiPolygon")
    )
    coords = (
        F.when((gt == 1) & single, F.to_json(g[0][0][0]))
        .when(gt == 1, F.to_json(pts))
        .when((gt == 2) & single, F.to_json(g[0][0]))
        .when(gt == 2, F.to_json(rings0))
        .when((gt == 3) & single, F.to_json(g[0]))
        .otherwise(F.to_json(g))
    )
    props = (
        F.coalesce(F.to_json(F.col(properties_col)), F.lit("{}"))
        if properties_col
        else F.lit("{}")
    )
    return df.select(
        F.concat(
            F.lit('{"type":"Feature","id":'),
            F.col(feature_id_col).cast("string"),
            F.lit(',"properties":'),
            props,
            F.lit(',"geometry":{"type":"'),
            gname,
            F.lit('","coordinates":'),
            coords,
            F.lit("}}"),
        ).alias("line")
    )


def write_geojson(df: DataFrame, path: str, mode: str = "overwrite", **kwargs) -> None:
    """Write the feature frame as line-delimited GeoJSON text files."""
    geojson_lines(df, **kwargs).write.mode(mode).text(path)
