"""Blob-to-blob tile transforms: per-feature filter and attribute enrich.

tippecanoe ships both as post-build tools — ``-j/--feature-filter``
drops features by attribute predicate, ``tile-join -c`` joins a CSV of
attributes onto features by key — because re-running the whole build to
change metadata is absurd at planet scale. Same logic here: both
operators rewrite each finished blob IN PLACE:

* ``filter_tile_features``: ZERO shuffle — one mapInArrow pass, each
  task decodes its tiles, keeps the features the predicate accepts,
  re-encodes. Tiles left with no features drop out of the relation.
* ``enrich_tile_features``: the attribute table broadcasts (it is a
  dimension: one row per join-key value), then the same zero-shuffle
  rewrite — no blob ever moves between executors for either operator.

Re-encode goes through codec.encode_tile, so output blobs carry the
engine's canonical framing (sorted layers, pts->lines->polys feature
order, first-appearance dictionaries) and decode_tile-rejected inputs
fail here identically (semantic contract: vectortiles Internal.hs
encode determinism, VectorTiles.hs tile/untile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..mvt import codec
from .tiling import TILE_SCHEMA


def _rewrite_rows(batch, rewrite_layer, new_extent=None):
    """Shared mapInArrow body: decode each tile, run ``rewrite_layer``
    (name, Layer) -> list[Feature] on every layer, re-encode non-empty
    results (with ``new_extent`` stamped when given). Returns the
    output-column lists."""
    out = {k: [] for k in ("tile_z", "tile_x", "tile_y", "mvt", "n_features", "n_layers")}
    for z, x, y, data in zip(
        batch.column("tile_z").to_pylist(),
        batch.column("tile_x").to_pylist(),
        batch.column("tile_y").to_pylist(),
        batch.column("mvt").to_pylist(),
    ):
        layers = []
        for name, lay in codec.decode_tile(bytes(data)).items():
            kept = rewrite_layer(name, lay)
            if kept:
                layers.append(
                    codec.Layer(name, lay.version, new_extent or lay.extent, kept)
                )
        if not layers:
            continue  # a tile with no surviving features leaves the set
        nf = sum(len(l.features) for l in layers)
        for k, v in zip(
            out, (z, x, y, codec.encode_tile(layers), nf, len(layers))
        ):
            out[k].append(v)
    return out


def _emit(out):
    import pyarrow as pa

    if not out["tile_z"]:
        return None
    return pa.record_batch(
        [
            pa.array(out["tile_z"], pa.int32()),
            pa.array(out["tile_x"], pa.int32()),
            pa.array(out["tile_y"], pa.int32()),
            pa.array(out["mvt"], pa.binary()),
            pa.array(out["n_features"], pa.int64()),
            pa.array(out["n_layers"], pa.int32()),
        ],
        names=["tile_z", "tile_x", "tile_y", "mvt", "n_features", "n_layers"],
    )


def filter_tile_features(
    tiles: DataFrame, predicate, layers=None
) -> DataFrame:
    """Keep only the features ``predicate(layer_name, feature)`` accepts.

    ``predicate`` runs executor-side on decoded codec.Feature objects
    (feature.metadata maps key -> (tag, value)); ``layers`` optionally
    restricts rewriting to the named layers (others pass through
    untouched). Zero shuffle: every task rewrites its own tiles."""
    want = None if layers is None else set(layers)

    def rewrite(name, lay):
        if want is not None and name not in want:
            return lay.features
        return [f for f in lay.features if predicate(name, f)]

    def run(batches):
        for batch in batches:
            rb = _emit(_rewrite_rows(batch, rewrite))
            if rb is not None:
                yield rb

    return tiles.select("tile_z", "tile_x", "tile_y", "mvt").mapInArrow(
        run, schema=TILE_SCHEMA
    )


def enrich_tile_features(
    tiles: DataFrame,
    attrs: DataFrame,
    on: str,
    layers=None,
    overwrite: bool = False,
    max_attr_rows: int = 1_000_000,
) -> DataFrame:
    """Join new metadata onto features: for each feature whose metadata
    carries ``on``, look its value up in ``attrs`` (a dimension table
    with an ``on`` column) and append the remaining columns as typed
    metadata. Existing keys are kept unless ``overwrite``.

    The attribute table collects to the driver and broadcasts — it is a
    per-key-value dimension (tile-join's CSV), small by definition; the
    blob rewrite itself is the same zero-shuffle mapInArrow pass as
    filter_tile_features. Unmatched features pass through unchanged.
    Supported attribute column types: string, integral, floating, bool.

    ``max_attr_rows`` guards the collect: a fact table mistakenly passed
    as ``attrs`` raises loudly (same policy as snap_join's cell guard and
    tile_cover's max_tiles) instead of OOMing the driver. Raise it only
    for genuinely larger dimensions that still fit driver memory.
    """
    want = None if layers is None else set(layers)
    cols = [c for c in attrs.columns if c != on]
    if not cols:
        raise ValueError("attrs carries no columns besides the join key")
    n_attrs = attrs.limit(max_attr_rows + 1).count()
    if n_attrs > max_attr_rows:
        raise ValueError(
            f"enrich_tile_features: attrs has more than {max_attr_rows} rows "
            "— it is collected to the driver and broadcast, so it must be a "
            "dimension table; pre-aggregate it or raise max_attr_rows if the "
            "driver really has the memory"
        )

    def _tagged(v):
        if isinstance(v, bool):
            return (codec.VAL_BOOL, v)
        if isinstance(v, int):
            return (codec.VAL_INT, v)
        if isinstance(v, float):
            return (codec.VAL_DOUBLE, v)
        return (codec.VAL_STRING, str(v))

    lut = {}
    for r in attrs.select(on, *cols).collect():
        key = r[0]
        if key in lut:
            raise ValueError(f"attrs has duplicate join key {key!r}")
        lut[key] = {c: _tagged(v) for c, v in zip(cols, r[1:]) if v is not None}
    sc = tiles.sparkSession.sparkContext
    blut = sc.broadcast(lut)

    def rewrite(name, lay):
        if want is not None and name not in want:
            return lay.features
        table = blut.value
        out = []
        for f in lay.features:
            hit = f.metadata.get(on)
            add = table.get(hit[1]) if hit is not None else None
            if add:
                meta = dict(f.metadata)
                for k, tv in add.items():
                    if overwrite or k not in meta:
                        meta[k] = tv
                f = codec.Feature(f.feature_id, meta, f.geom_type, f.geom)
            out.append(f)
        return out

    def run(batches):
        for batch in batches:
            rb = _emit(_rewrite_rows(batch, rewrite))
            if rb is not None:
                yield rb

    return tiles.select("tile_z", "tile_x", "tile_y", "mvt").mapInArrow(
        run, schema=TILE_SCHEMA
    )


def rescale_tiles(tiles: DataFrame, new_extent: int) -> DataFrame:
    """Requantize every tile to a new layer extent (tile-join's
    ``--extent`` rewrite): each coordinate maps ``x -> x * new // old``
    in exact int64 arithmetic (floor division, negatives included — seam
    buffers stay consistent), and the layer header's extent field is
    restamped. Zero shuffle, same blob-in-place pass as the other
    transforms.

    Downscaling can collapse geometry below the MVT minimums; the drop
    policy mirrors simplify_geoms: consecutive duplicate vertices dedupe,
    line parts below 2 points drop, rings re-close and drop when fewer
    than 3 distinct vertices remain or their scaled area hits 0 (a
    zero-area ring has no winding sign for decode's exterior/hole
    grouping), and a polygon part goes when its exterior goes. Points
    keep duplicates (a multipoint's multiplicity is data). Features whose
    geometry empties drop; tiles left featureless leave the relation.
    """
    import numpy as np

    from ..mvt.geometry import (
        GEOM_LINESTRING, GEOM_POINT, GEOM_POLYGON, surveyor,
    )

    if new_extent < 1:
        raise ValueError(f"new_extent must be >= 1, got {new_extent}")

    def _dedupe(pts: np.ndarray) -> np.ndarray:
        if len(pts) < 2:
            return pts
        keep = np.ones(len(pts), bool)
        keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
        return pts[keep]

    def _scale(a: np.ndarray, old: int) -> np.ndarray:
        if old == new_extent:
            return np.asarray(a, np.int64)
        return (np.asarray(a, np.int64) * new_extent) // old

    def rewrite(name, lay):
        old = lay.extent
        out = []
        for f in lay.features:
            if f.geom_type == GEOM_POINT:
                g = _scale(f.geom, old)
                if len(g) == 0:
                    continue
            elif f.geom_type == GEOM_LINESTRING:
                g = []
                for part in f.geom:
                    p = _dedupe(_scale(part, old))
                    if len(p) >= 2:
                        g.append(p)
                if not g:
                    continue
            elif f.geom_type == GEOM_POLYGON:
                g = []
                for part in f.geom:
                    rings = []
                    dead_exterior = False
                    for ri, ring in enumerate(part):
                        r = _dedupe(_scale(ring, old))
                        # re-close after dedupe collapsed the closure pair
                        if len(r) and (r[0] != r[-1]).any():
                            r = np.concatenate([r, r[:1]])
                        # a ring is dead when it degenerates (too few
                        # vertices / zero area) OR when floor scaling
                        # FLIPPED its winding sign: decode groups rings
                        # into polygons by sign, so a flipped hole would
                        # start a bogus new exterior (and a flipped
                        # exterior would be absorbed as a hole) — a
                        # sign-flipped sliver is below resolution anyway
                        bad = (
                            len(r) < 4
                            or surveyor(r) == 0.0
                            or np.sign(surveyor(r))
                            != np.sign(surveyor(np.asarray(ring, np.int64)))
                        )
                        if bad and ri == 0:
                            dead_exterior = True
                            break
                        if not bad:
                            rings.append(r)
                    if not dead_exterior and rings:
                        g.append(rings)
                if not g:
                    continue
            else:  # pragma: no cover - decode_tile already rejects UNKNOWN
                continue
            out.append(codec.Feature(f.feature_id, f.metadata, f.geom_type, g))
        return out

    def run(batches):
        for batch in batches:
            rb = _emit(_rewrite_rows(batch, rewrite, new_extent=new_extent))
            if rb is not None:
                yield rb

    return tiles.select("tile_z", "tile_x", "tile_y", "mvt").mapInArrow(
        run, schema=TILE_SCHEMA
    )
