"""Zoom-dependent geometry generalization: Douglas-Peucker simplification.

The reference codec encodes whatever vertices it is given (there is no
generalization pass in fosskers/vectortiles); a tiling ENGINE needs one —
re-encoding a z=14 road at z=6 without thinning wastes tile bytes and
decoder time on sub-pixel vertices. This operator simplifies the engine's
nested-array geometry (parts x rings x points x [x, y], tile-local
integers) with classic Douglas-Peucker before command-stream encoding:

* tolerance is in tile-local units (extent px) — pick ~extent/512 for
  "invisible at this zoom" thinning, larger for aggressive generalization;
* every surviving vertex is an ORIGINAL vertex (no resampling), endpoints
  always survive, removed vertices lie within tolerance of the chord that
  replaced them (the DP guarantee), and simplification is idempotent;
* closed polygon rings stay closed; rings that collapse below 4 points
  (closure included — the MVT minimum, LineTo count >= 2) are dropped,
  and a part whose exterior ring collapses is dropped whole (consistent
  with the decoder's degenerate-ring rejection, Internal.hs:202-206);
* points pass through untouched.

Scale shape: a per-row NumPy kernel inside ``mapInArrow`` — embarrassingly
parallel, no shuffle, runs wherever the feature rows already are (slot it
between the geometry source and ``geom_features``). The stack loop splits
at most once per SURVIVING vertex; each split's distance scan is one
vectorized pass, so a ring that simplifies to k points costs O(k) NumPy
calls over shrinking slices, not O(n^2) Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from ..mvt.geometry import GEOM_LINESTRING, GEOM_POINT, GEOM_POLYGON
from .arrow_geom import feature_parts


def dp_keep_mask(pts: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask of Douglas-Peucker at `tol` over an (n, 2) array.
    Endpoints are always kept. Distance is point-to-chord-SEGMENT (the
    projection parameter is clamped to [0, 1], as in JTS/GEOS), not to the
    infinite line — with the line metric an out-and-back spur thousands of
    px past the chord endpoints measures only its lateral offset and
    silently vanishes. A degenerate chord (first == last, e.g. a closed
    ring) reduces to point distance to the anchor, which makes the first
    split land on the farthest vertex — the standard ring anchor."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    P = pts.astype(np.float64)
    t2 = float(tol) * float(tol)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = P[i + 1 : j]
        d = P[j] - P[i]
        l2 = float(d @ d)
        if l2 == 0.0:
            dist2 = ((seg - P[i]) ** 2).sum(axis=1)
        else:
            t = np.clip(((seg - P[i]) @ d) / l2, 0.0, 1.0)
            proj = P[i] + t[:, None] * d
            dist2 = ((seg - proj) ** 2).sum(axis=1)
        kmax = int(np.argmax(dist2))
        if dist2[kmax] > t2:
            k = i + 1 + kmax
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def _to_int_pts(ring) -> np.ndarray:
    """Round (never truncate) to the integer grid and collapse consecutive
    duplicates that sub-pixel rounding creates — a zero-length LineTo or a
    doubled ring vertex is forbidden downstream."""
    pts = np.rint(np.asarray(ring, dtype=np.float64)).astype(np.int64).reshape(-1, 2)
    if len(pts) > 1:
        keep = np.concatenate(([True], np.any(pts[1:] != pts[:-1], axis=1)))
        pts = pts[keep]
    return pts


def simplify_ring(ring: list, tol: float, closed: bool) -> list | None:
    """Simplify one point list. Returns None when the result is too
    degenerate to encode: ring < 4 closed points or ZERO AREA (the
    decoder groups polygons by ring-area sign, so an area-0 ring — e.g. a
    collinear out-and-back spur the segment-distance metric rightly keeps
    — would corrupt exterior/hole classification), line < 2 points after
    duplicate collapse."""
    pts = _to_int_pts(ring)
    if len(pts) <= 2:
        return pts.tolist() if (not closed and len(pts) == 2) else None
    kept = pts[dp_keep_mask(pts, tol)]
    if closed:
        # input rings are closed (first == last); DP keeps both endpoints,
        # so closure survives by construction
        if len(kept) < 4:
            return None
        x, y = kept[:-1, 0], kept[:-1, 1]
        if np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)) == 0:
            return None
    elif len(kept) < 2:
        return None
    return kept.tolist()


def simplify_parts(geom_type: int, parts: list | None, tol: float) -> list:
    """Apply DP to every ring of a nested-array geometry; enforce the
    drop rules described in the module docstring."""
    parts = parts or []
    if geom_type == GEOM_POINT:
        # pass through, normalized to int lists (inputs may arrive as
        # float ndarray views from the Arrow unnest; round, don't
        # truncate, in case a double-typed geom carries fractions —
        # consecutive-duplicate collapse is a no-op for distinct points)
        return [[_to_int_pts(r).tolist() for r in part] for part in parts]
    out_parts = []
    if geom_type == GEOM_LINESTRING:
        for part in parts:
            if len(part) == 0 or len(part[0]) == 0:
                continue
            line = simplify_ring(part[0], tol, closed=False)
            if line is not None:
                out_parts.append([line])
        return out_parts
    if geom_type == GEOM_POLYGON:
        for part in parts:
            rings = [simplify_ring(r, tol, closed=True) for r in part]
            if not rings or rings[0] is None:
                continue  # exterior collapsed: the whole part goes
            out_parts.append([r for r in rings if r is not None])
        return out_parts
    raise ValueError("Geometry type of UNKNOWN given.")


def simplify_geoms(
    df: DataFrame,
    tolerance: float,
    geom_type_col: str = "geom_type",
    geom_col: str = "geom",
    tolerance_by_zoom: dict | None = None,
    zoom_col: str = "tile_z",
) -> DataFrame:
    """DataFrame pass: simplify the nested-array geometry column in place
    (schema unchanged). Parts/rings that collapse below the MVT minimums
    are dropped; a row whose geometry empties entirely is kept with an
    empty parts array — geom_features then emits an empty command stream
    and the sink drops the feature, mirroring its degenerate-input path.

    ``tolerance_by_zoom`` maps tile_z -> tolerance for the multi-zoom
    pyramid output of ``clip_features(z=[...])`` (tolerance is in tile
    px, so even a constant already generalizes more aggressively at lower
    zooms in world terms — the per-zoom map is for when a tileset spec
    demands explicit budgets); zooms not in the map fall back to
    ``tolerance``."""
    if tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    if tolerance_by_zoom:
        bad = [z for z, t in tolerance_by_zoom.items() if t < 0]
        if bad:
            raise ValueError(f"negative tolerance for zooms {bad}")
        if zoom_col not in df.columns:
            raise ValueError(f"tolerance_by_zoom needs a {zoom_col!r} column")

    def run(batches):
        for b in batches:
            gts = b[geom_type_col].to_pylist()
            if tolerance_by_zoom:
                tols = [
                    tolerance_by_zoom.get(z, tolerance)
                    for z in b[zoom_col].to_pylist()
                ]
            else:
                tols = None
            # shared Arrow-native unnest (arrow_geom.feature_parts): each
            # ring reaches the DP kernel as a zero-copy NumPy view —
            # to_pylist + per-ring list->array conversion dominated the
            # pass otherwise
            new = [
                simplify_parts(gt, parts, tolerance if tols is None else tols[fi])
                for fi, (gt, parts) in enumerate(
                    zip(gts, feature_parts(b[geom_col], np.float64))
                )
            ]
            cols = {}
            for name in b.schema.names:
                cols[name] = (
                    pa.array(new, type=b.schema.field(geom_col).type)
                    if name == geom_col
                    else b[name]
                )
            yield pa.record_batch(cols)

    return df.mapInArrow(run, df.schema)
