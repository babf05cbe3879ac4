"""Overzoom: derive z+k child tiles from parent tile BLOBS.

A tile server rarely stores every zoom — it stores a max-zoom tile set
and derives deeper levels on demand by scaling the parent's geometry
into each child's frame (tippecanoe/tileserver-gl behavior). The same
operation backs pyramid *repair* (regenerate one damaged zoom from the
level above) and serving overview tiles from a partially-built pyramid.
Unlike ``build_pyramid`` (tiling.py), which needs the ORIGINAL feature
relation, overzoom needs only the finished blobs.

Precision contract: a child derived from a parent carries the PARENT's
coordinate resolution scaled by 2^levels (child coordinates are even
multiples at levels=1) — the standard overzoom trade: it can never
recover sub-parent-pixel detail a direct build at z+k would have. The
q_overzoom oracle replays exactly this doubling arithmetic in SQL.

Scale shape: children of a parent are computed FROM that parent alone,
so the distributed operator is a single mapInArrow with ZERO shuffle —
each task turns its parent rows into 4^levels-way child rows in place.
Contrast: rebuilding z+k from source features pays a full feature
shuffle into the encode; overzoom pays a decode + clip + encode per
parent, all executor-local.

Geometry semantics reuse the tiler's clip kernels (operators/clip.py):
Liang-Barsky polyline clip, exact multi-piece polygon clip with hole
regrouping, the same integer localization/rounding and the same
edge-ownership rule (a child's high edge belongs to the next child,
except on the parent's own east/south edge). Reference semantic
contract for the decode/encode halves: vectortiles Internal.hs
(rings closed, pts->lines->polys layer order) — see mvt/codec.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..mvt import codec
from ..mvt.geometry import GEOM_LINESTRING, GEOM_POINT, GEOM_POLYGON
from .clip import _localize_line, _localize_ring, clip_polygon_exact, clip_polyline
from .tiling import TILE_SCHEMA


def _child_range(lo: float, hi: float, extent: int, s: int, buffer_px: int):
    """Clamped inclusive child-index interval covered by [lo, hi]."""
    a = int(np.floor((lo - buffer_px) / extent))
    b = int(np.floor((hi + buffer_px) / extent))
    return max(0, min(s - 1, a)), max(0, min(s - 1, b))


def overzoom_blob(
    data: bytes, levels: int = 1, buffer_px: int = 0
) -> list[tuple[int, int, bytes, int, int]]:
    """One parent blob -> [(dx, dy, child_blob, n_features, n_layers)] for
    every non-empty child in the 2^levels x 2^levels grid. Rejects the
    same malformed inputs decode_tile rejects."""
    if levels < 1:
        raise ValueError(f"overzoom levels must be >= 1, got {levels}")
    s = 1 << levels
    kids: dict[tuple[int, int], dict[str, codec.Layer]] = {}
    for name, layer in codec.decode_tile(data).items():
        ext = layer.extent
        for f in layer.features:
            for (cx, cy), geom in _split_feature(f, ext, s, buffer_px):
                lay = kids.setdefault((cx, cy), {}).setdefault(
                    name, codec.Layer(name, layer.version, ext, [])
                )
                lay.features.append(
                    codec.Feature(f.feature_id, f.metadata, f.geom_type, geom)
                )
    out = []
    for (cx, cy), layers in sorted(kids.items()):
        blob = codec.encode_tile(list(layers.values()))
        nfeat = sum(len(l.features) for l in layers.values())
        out.append((cx, cy, blob, nfeat, len(layers)))
    return out


def _split_feature(f, ext: int, s: int, b: int):
    """Yield ((cx, cy), child-local geometry) for every child the scaled
    feature intersects. Child boxes are [c*ext - b, (c+1)*ext + b]; with
    b == 0 the high edge is OPEN except on the parent's own east/south
    edge (child s-1) — the tiler's exact-tiling ownership rule, so a
    point on an interior child boundary emits exactly once."""
    if f.geom_type == GEOM_POINT:
        pts = np.asarray(f.geom, np.int64) * s
        if not len(pts):
            return
        xlo, xhi = _child_range(pts[:, 0].min(), pts[:, 0].max(), ext, s, b)
        ylo, yhi = _child_range(pts[:, 1].min(), pts[:, 1].max(), ext, s, b)
        for cy in range(ylo, yhi + 1):
            for cx in range(xlo, xhi + 1):
                x0, y0 = cx * ext - b, cy * ext - b
                x1, y1 = (cx + 1) * ext + b, (cy + 1) * ext + b
                mx = (pts[:, 0] >= x0) & (
                    (pts[:, 0] < x1) if b == 0 and cx < s - 1 else (pts[:, 0] <= x1)
                )
                my = (pts[:, 1] >= y0) & (
                    (pts[:, 1] < y1) if b == 0 and cy < s - 1 else (pts[:, 1] <= y1)
                )
                m = mx & my
                if m.any():
                    yield (cx, cy), pts[m] - (cx * ext, cy * ext)
        return

    if f.geom_type == GEOM_LINESTRING:
        parts = [np.asarray(p, np.float64) * s for p in f.geom if len(p) >= 2]
        if not parts:
            return
        allp = np.concatenate(parts)
        xlo, xhi = _child_range(allp[:, 0].min(), allp[:, 0].max(), ext, s, b)
        ylo, yhi = _child_range(allp[:, 1].min(), allp[:, 1].max(), ext, s, b)
        for cy in range(ylo, yhi + 1):
            for cx in range(xlo, xhi + 1):
                x0, y0 = cx * ext - b, cy * ext - b
                x1, y1 = (cx + 1) * ext + b, (cy + 1) * ext + b
                out = []
                for p in parts:
                    for piece in clip_polyline(p, x0, y0, x1, y1):
                        loc = _localize_line(piece, float(cx * ext), float(cy * ext))
                        if loc is not None:
                            out.append(np.asarray(loc, np.int64))
                if out:
                    yield (cx, cy), out
        return

    if f.geom_type == GEOM_POLYGON:
        # decode stores rings CLOSED; the exact clipper tolerates that,
        # but strip the duplicate once here instead of per child box
        polys = [
            [
                (np.asarray(r, np.float64) * s)[:-1]
                if len(r) > 1 and np.array_equal(r[0], r[-1])
                else np.asarray(r, np.float64) * s
                for r in poly
                if len(r)
            ]
            for poly in f.geom
            if len(poly) and len(poly[0])
        ]
        polys = [p for p in polys if len(p[0]) >= 3]
        if not polys:
            return
        allp = np.concatenate([r for poly in polys for r in poly])
        xlo, xhi = _child_range(allp[:, 0].min(), allp[:, 0].max(), ext, s, b)
        ylo, yhi = _child_range(allp[:, 1].min(), allp[:, 1].max(), ext, s, b)
        for cy in range(ylo, yhi + 1):
            for cx in range(xlo, xhi + 1):
                x0, y0 = cx * ext - b, cy * ext - b
                x1, y1 = (cx + 1) * ext + b, (cy + 1) * ext + b
                ox, oy = float(cx * ext), float(cy * ext)
                out = []
                for rings in polys:
                    for piece in clip_polygon_exact(rings, x0, y0, x1, y1):
                        loc_rings = []
                        for k, r in enumerate(piece):
                            loc = _localize_ring(r, ox, oy)
                            if k == 0 and loc is None:
                                loc_rings = None  # exterior collapsed
                                break
                            if loc is not None:
                                loc_rings.append(np.asarray(loc, np.int64))
                        if loc_rings:
                            out.append(loc_rings)
                if out:
                    yield (cx, cy), out
        return

    raise ValueError("Geometry type of UNKNOWN given.")


def overzoom_tiles(
    tiles: DataFrame, levels: int = 1, buffer_px: int = 0
) -> DataFrame:
    """Distributed overzoom: (tile_z, tile_x, tile_y, mvt) rows in, the
    2^levels-deeper child tile rows out. ZERO shuffle — see module
    docstring; feed the output straight into a tile sink or another
    overzoom_tiles hop."""
    if levels < 1:
        raise ValueError(f"overzoom levels must be >= 1, got {levels}")
    s = 1 << levels

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            zs = batch.column("tile_z").to_pylist()
            xs = batch.column("tile_x").to_pylist()
            ys = batch.column("tile_y").to_pylist()
            ms = batch.column("mvt").to_pylist()
            cols: list[list] = [[], [], [], [], [], []]
            for z, x, y, m in zip(zs, xs, ys, ms):
                for dx, dy, blob, nf, nl in overzoom_blob(m, levels, buffer_px):
                    for c, v in zip(
                        cols, (z + levels, x * s + dx, y * s + dy, blob, nf, nl)
                    ):
                        c.append(v)
            if cols[0]:
                yield pa.record_batch(
                    [
                        pa.array(cols[0], pa.int32()),
                        pa.array(cols[1], pa.int32()),
                        pa.array(cols[2], pa.int32()),
                        pa.array(cols[3], pa.binary()),
                        pa.array(cols[4], pa.int64()),
                        pa.array(cols[5], pa.int32()),
                    ],
                    names=[
                        "tile_z", "tile_x", "tile_y", "mvt", "n_features", "n_layers",
                    ],
                )

    return tiles.mapInArrow(run, schema=TILE_SCHEMA)
