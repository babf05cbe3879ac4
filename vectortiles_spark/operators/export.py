"""The export direction: MVT tiles -> world-space features -> GeoJSON.

The reference's decode half (`tile`, lib/Geography/VectorTile.hs:70-71)
ends at tile-local features; an engine's users also need them back in
WORLD coordinates (analysis joins, GeoJSON delivery, re-tiling at other
zooms). This module closes the loop: ``decode_tiles`` output (tile-local
command streams) -> canonical world-space frame (the same shape
``read_geojson`` produces and ``clip_features`` consumes) -> optional
GeoJSON sink. Forward projections live in clip.py; the inverses here are
their exact mirrors (equirect is pure +*/ and roundtrips the pixel
lattice bit-exactly; webmercator inverts via atan(sinh)).

Like decode_tiles, this is the verification/egress path, not the encode
hot path — per-feature Python with the reference-validated stream parser
is appropriate; the pass itself is shuffle-free mapInArrow.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from ..mvt.geometry import GEOM_LINESTRING, GEOM_POINT, GEOM_POLYGON

WORLD_SCHEMA = (
    "layer string, geom_type int, feature_id bigint, "
    "properties map<string,string>, geom array<array<array<array<double>>>>"
)


def unproject_equirect(px: np.ndarray, py: np.ndarray, z: int, extent: int):
    span = float((1 << z) * extent)
    lon = np.asarray(px, np.float64) * 360.0 / span - 180.0
    lat = 85.0 - np.asarray(py, np.float64) * 170.0 / span
    return lon, lat


def unproject_webmercator(px: np.ndarray, py: np.ndarray, z: int, extent: int):
    span = float((1 << z) * extent)
    lon = np.asarray(px, np.float64) * 360.0 / span - 180.0
    lat = np.degrees(np.arctan(np.sinh(math.pi * (1.0 - 2.0 * np.asarray(py, np.float64) / span))))
    return lon, lat


_UNPROJECTIONS = {"equirect": unproject_equirect, "webmercator": unproject_webmercator}


def tiles_to_world_features(
    tiles: DataFrame, projection: str = "webmercator"
) -> DataFrame:
    """MVT blob rows (tile_z, tile_x, tile_y, mvt) -> canonical
    world-space feature frame. Blobs are decoded DIRECTLY (one wire
    decode per tile — not decode_tiles' command-stream form, which would
    re-encode and re-parse every geometry) and each layer's own wire
    ``extent`` drives the unprojection, so tiles encoded at non-default
    extents export to the right places without the caller knowing.
    Metadata values come back stringified in ``properties`` (GeoJSON
    properties are schemaless; the typed form stays available via
    decode_tiles). Points decode to one part per point, mirroring
    read_geojson's MultiPoint mapping."""
    if projection not in _UNPROJECTIONS:
        raise ValueError(f"projection must be one of {sorted(_UNPROJECTIONS)}")
    unproj = _UNPROJECTIONS[projection]
    from ..mvt import codec

    def run(batches):
        for b in batches:
            rows = {"layer": [], "geom_type": [], "feature_id": [], "properties": [], "geom": []}
            for z, x, y, raw in zip(
                b["tile_z"].to_pylist(), b["tile_x"].to_pylist(),
                b["tile_y"].to_pylist(), b["mvt"].to_pylist(),
            ):
                for name, layer in codec.decode_tile(raw).items():
                    extent = layer.extent
                    ox, oy = x * extent, y * extent
                    for f in layer.features:
                        gt = f.geom_type
                        g = f.geom
                        if gt == GEOM_POINT:
                            parts = [[p.reshape(1, 2)] for p in np.asarray(g).reshape(-1, 2)]
                        elif gt == GEOM_LINESTRING:
                            parts = [[ln] for ln in g]
                        elif gt == GEOM_POLYGON:
                            parts = [list(poly) for poly in g]
                        else:  # pragma: no cover - decode already raises
                            raise ValueError("Geometry type of UNKNOWN given.")
                        world_parts = []
                        for part in parts:
                            wp = []
                            for ring in part:
                                r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
                                lon, lat = unproj(r[:, 0] + ox, r[:, 1] + oy, z, extent)
                                wp.append(np.column_stack([lon, lat]).tolist())
                            world_parts.append(wp)
                        props = {}
                        for key, (tag, v) in sorted(f.metadata.items()):
                            props[key] = str(v).lower() if isinstance(v, bool) else str(v)
                        fid = f.feature_id
                        rows["layer"].append(name)
                        rows["geom_type"].append(gt)
                        rows["feature_id"].append(fid - (1 << 64) if fid >= (1 << 63) else fid)
                        rows["properties"].append(props)
                        rows["geom"].append(world_parts)
            yield pa.record_batch(
                {
                    "layer": pa.array(rows["layer"], pa.string()),
                    "geom_type": pa.array(rows["geom_type"], pa.int32()),
                    "feature_id": pa.array(rows["feature_id"], pa.int64()),
                    "properties": pa.array(rows["properties"], pa.map_(pa.string(), pa.string())),
                    "geom": pa.array(
                        rows["geom"], pa.list_(pa.list_(pa.list_(pa.list_(pa.float64()))))
                    ),
                }
            )

    return tiles.select("tile_z", "tile_x", "tile_y", "mvt").mapInArrow(run, WORLD_SCHEMA)


def tiles_to_geojson(
    tiles: DataFrame, path: str, projection: str = "webmercator", mode: str = "overwrite"
) -> None:
    """MVT tiles -> line-delimited GeoJSON files (decode + unproject +
    the Column-algebra GeoJSON sink)."""
    from ..sources.geojson import write_geojson

    write_geojson(tiles_to_world_features(tiles, projection), path, mode=mode)
