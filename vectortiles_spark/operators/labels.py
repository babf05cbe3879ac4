"""Representative-geometry operators: polygon label points and convex hulls.

Every tile renderer needs a POINT to anchor a polygon's label (districts,
lakes, building footprints) — production tile pipelines (OpenMapTiles,
tippecanoe workflows) precompute a label-point layer offline rather than
asking the client to derive one per frame. ``label_points`` is that
operator over this engine's canonical feature rows: the signed-area-
weighted centroid of each polygon feature, emitted as a point feature
ready for ``encode_tiles``. The reference codec itself carries no such
derivation (it encodes whatever geometry it is given — lib/Geography/
VectorTile/Internal.hs:208-213); this is engine-side value on top of the
reference's polygon semantics (ring signs per Geometry.hs:76-81).

``convex_hull`` is the classic per-group summary geometry (coverage
footprint of a device's pings, bounding hull of a metro's POIs): Andrew's
monotone chain per group inside ``applyInPandas``. The hull of n points
is at most n points, so shuffle volume is bounded by the input's
(group, distinct-point) cardinality and per-group state is one sorted
array.

Exactness contracts (both operators replay bit-for-bit in any SQL engine):

* label_points: per feature, over every ring edge (closing edge included)
  ``cross_i = x_i*y_{i+1} - x_{i+1}*y_i``; ``area2 = sum(cross_i)``
  (== 2 * surveyor per ring, mvt/geometry.py:174 — exterior rings
  positive, holes negative under the decoder's top-left-origin
  convention, so holes subtract from both area and centroid moment);
  ``cx = sx / (3.0 * area2)`` with ``sx = sum((x_i + x_{i+1}) * cross_i)``.
  Every numerator is exact int64; the ONLY floating-point steps are the
  final division and ``floor(cx + 0.5)`` pixel rounding.
* convex_hull: integer cross-product turn tests only — no floats at all.
  Collinear boundary points are dropped (strict turns survive, the
  standard monotone-chain convention), so a point is a hull VERTEX iff
  it is not inside-or-on any nondegenerate triangle of its peers — the
  property the DuckDB oracle checks directly (plans/queries.py).
  Exception: a FULLY collinear group has no nondegenerate triangles, so
  that characterization is vacuous there; monotone chain then keeps only
  the two lexicographic extreme points (the degenerate 2-point hull),
  while any interior collinear point is dropped as lying on the segment
  between two peers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from ..mvt.geometry import GEOM_POINT, GEOM_POLYGON, geom_from_stream

# int64-exactness guard for the centroid accumulators: with |coord| <= M
# and V total vertices per feature, |sx| <= V * 4 * M^3. M = 2^14 covers
# every real MVT extent (4096 default, 8192, plus clip buffers) and V =
# 2^18 vertices per feature keeps the bound at 2^62 < int64.
_MAX_COORD = 1 << 14
_MAX_VERTS = 1 << 18


def _feature_centroid(polys) -> tuple[int, int, int] | None:
    """(sx, sy, area2) int64-exact accumulators over all parts/rings of
    one polygon feature; None when area2 == 0 (no defined centroid)."""
    sx = sy = sa = 0
    nverts = 0
    for poly in polys:
        for ring in poly:
            r = np.asarray(ring, dtype=np.int64).reshape(-1, 2)
            if np.abs(r).max(initial=0) >= _MAX_COORD:
                raise ValueError(
                    "label_points: |coordinate| >= 2^14 — tile-local "
                    "geometry expected (extent + clip buffer)"
                )
            nverts += len(r) - 1
            if nverts > _MAX_VERTS:
                raise ValueError(
                    "label_points: feature exceeds 2^18 vertices — "
                    "simplify before labeling"
                )
            a, b = r[:-1], r[1:]  # ring is closed: consecutive pairs
            cross = a[:, 0] * b[:, 1] - b[:, 0] * a[:, 1]
            sa += int(cross.sum())
            sx += int(((a[:, 0] + b[:, 0]) * cross).sum())
            sy += int(((a[:, 1] + b[:, 1]) * cross).sum())
    if sa == 0:
        return None
    return sx, sy, sa


def label_points(
    feats: DataFrame,
    layer_suffix: str = "_labels",
    geom_col: str = "geom_cmds",
) -> DataFrame:
    """Polygon feature rows -> one label POINT feature per polygon.

    Input: canonical feature rows (FEATURE_SCHEMA, polygons only — a
    non-polygon row raises, matching zonal_stats's loud contract).
    Output: the same columns with ``geom_type = 1``, ``geom_cmds`` the
    single-point stream ``[MoveTo(1), zig(px), zig(py)]`` (identical to
    point_features's layout, tiling.py:89-113), the layer renamed with
    ``layer_suffix``, plus ``px``/``py`` (the rounded label pixel) and
    ``area2`` (the exact doubled signed area) for downstream ranking —
    renderers typically keep only the largest-area label per name.

    Features with ``area2 == 0`` (all rings degenerate) are DROPPED —
    they have no defined centroid; count them upstream if the drop rate
    matters.

    Scale shape: shuffle-free ``mapInArrow`` — the kernel runs wherever
    the feature rows already are, per-row state is one ring's vertex
    array, and the output is exactly one row per surviving input row.
    Slot it after clip/simplify and before ``encode_tiles``.
    """

    fields = [f for f in feats.schema.fields]
    names = [f.name for f in fields]
    for req in ("layer", "geom_type", geom_col):
        if req not in names:
            raise ValueError(f"label_points: input lacks column {req!r}")
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    ) + ", px int, py int, area2 bigint"
    suffix = layer_suffix

    def run(batches):
        for b in batches:
            gts = b["geom_type"].to_pylist()
            streams = b[geom_col].to_pylist()
            layers = b["layer"].to_pylist()
            keep: list[int] = []
            pxs: list[int] = []
            pys: list[int] = []
            areas: list[int] = []
            cmds: list[list[int]] = []
            labs: list[str] = []
            for i, (gt, stream) in enumerate(zip(gts, streams)):
                if gt != GEOM_POLYGON:
                    raise ValueError(
                        f"label_points: non-polygon feature (geom_type={gt})"
                        " — filter to polygons first"
                    )
                polys = geom_from_stream(
                    GEOM_POLYGON, np.asarray(stream, dtype=np.uint32)
                )
                acc = _feature_centroid(polys)
                if acc is None:
                    continue
                sx, sy, sa = acc
                # the ONLY float steps — replayable: v::DOUBLE / (3.0 * a::DOUBLE)
                px = int(np.floor(sx / (3.0 * sa) + 0.5))
                py = int(np.floor(sy / (3.0 * sa) + 0.5))
                keep.append(i)
                pxs.append(px)
                pys.append(py)
                areas.append(sa)
                zx = (px << 1) ^ (px >> 63) if px >= 0 else ((-px) << 1) - 1
                zy = (py << 1) ^ (py >> 63) if py >= 0 else ((-py) << 1) - 1
                cmds.append([(1 << 3) | 1, zx, zy])
                labs.append(layers[i] + suffix)
            idx = pa.array(keep, type=pa.int64())
            cols = {}
            for f in b.schema.names:
                if f == geom_col:
                    cols[f] = pa.array(cmds, type=b.schema.field(geom_col).type)
                elif f == "geom_type":
                    cols[f] = pa.array(
                        [GEOM_POINT] * len(keep), type=b.schema.field(f).type
                    )
                elif f == "layer":
                    cols[f] = pa.array(labs, type=b.schema.field(f).type)
                else:
                    cols[f] = b[f].take(idx)
            cols["px"] = pa.array(pxs, type=pa.int32())
            cols["py"] = pa.array(pys, type=pa.int32())
            cols["area2"] = pa.array(areas, type=pa.int64())
            yield pa.record_batch(cols)

    return feats.mapInArrow(run, out_schema)


def _monotone_chain(pts: np.ndarray) -> np.ndarray:
    """Hull VERTICES of distinct int64 (n, 2) points, CCW from the
    lexicographic minimum; collinear boundary points dropped (strict
    turns only — `<= 0` popping). Pure integer cross products."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    if len(pts) <= 2:
        return pts

    def half(p):
        h: list[np.ndarray] = []
        for q in p:
            while len(h) >= 2:
                o, a = h[-2], h[-1]
                if int(a[0] - o[0]) * int(q[1] - o[1]) - int(a[1] - o[1]) * int(
                    q[0] - o[0]
                ) <= 0:
                    h.pop()
                else:
                    break
            h.append(q)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.int64)


def convex_hull(
    pts: DataFrame,
    group_cols: list[str],
    x_col: str = "px",
    y_col: str = "py",
) -> DataFrame:
    """Per-group 2-D convex hull: (group..., hull_idx, px, py) rows, one
    per hull vertex, ``hull_idx`` walking the hull CCW from the
    lexicographically smallest vertex (deterministic in the point SET —
    row order, duplicates, and partitioning never change the output).

    Scale shape: one shuffle on the group key; per-group state is the
    group's distinct points (sorted once). For planet-scale groups,
    pre-thin with ``cluster_points`` — a hull only moves if an EXTREME
    point moves, and grid-bin representatives preserve extremes to bin
    resolution.
    """
    import pandas as pd

    clash = set(group_cols) & {x_col, y_col, "hull_idx", "px", "py"}
    if clash:
        raise ValueError(
            f"convex_hull: group columns {sorted(clash)} collide with the "
            "coordinate/output names — rename them upstream"
        )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pts.select(*group_cols).schema.fields
    ) + ", hull_idx int, px bigint, py bigint"

    def hull(key, pdf):
        P = np.unique(
            pdf[[x_col, y_col]].to_numpy(dtype=np.int64), axis=0
        )
        H = _monotone_chain(P)
        out = pd.DataFrame(
            {"hull_idx": np.arange(len(H)), "px": H[:, 0], "py": H[:, 1]}
        )
        for c, v in zip(group_cols, key):
            out.insert(0, c, v)
        return out[group_cols + ["hull_idx", "px", "py"]]

    return pts.groupBy(*group_cols).applyInPandas(hull, schema=out_schema)


def line_label_anchors(
    feats: DataFrame,
    layer_suffix: str = "_labels",
    geom_col: str = "geom_cmds",
) -> DataFrame:
    """Linestring feature rows -> one label ANCHOR point per feature: the
    first ORIGINAL vertex at-or-past half the arc length of the feature's
    longest part (ties on part length: first part wins). Renderers anchor
    road/river labels mid-line; emitting an original vertex (never an
    interpolated point) keeps the output integer and the geometry exact.

    Exactness contract: per segment ``sqrt(dx*dx + dy*dy)`` (IEEE sqrt is
    correctly rounded everywhere), summed SEQUENTIALLY (np.cumsum —
    left-assoc fold, the same order a SQL running-sum window uses), half
    = ``total / 2.0``, and the vertex pick is one IEEE ``>=`` per prefix
    — so the whole selection replays bit-for-bit in a SQL engine.

    Zero-length features (every part's vertices coincident) are DROPPED.
    Non-linestring rows raise (same loud contract as label_points).
    Output mirrors label_points: geom_type=1, the single-point command
    stream, layer renamed with ``layer_suffix``, plus ``px``/``py``,
    ``part_idx`` (which part carries the label) and ``len_px`` (the
    longest part's arc length) for ranking. Scale shape: shuffle-free
    ``mapInArrow``, one output row per surviving input row.
    """
    from ..mvt.geometry import GEOM_LINESTRING

    fields = list(feats.schema.fields)
    names = [f.name for f in fields]
    for req in ("layer", "geom_type", geom_col):
        if req not in names:
            raise ValueError(f"line_label_anchors: input lacks column {req!r}")
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    ) + ", px int, py int, part_idx int, len_px double"
    suffix = layer_suffix

    def run(batches):
        for b in batches:
            gts = b["geom_type"].to_pylist()
            streams = b[geom_col].to_pylist()
            layers = b["layer"].to_pylist()
            keep: list[int] = []
            pxs: list[int] = []
            pys: list[int] = []
            pidx: list[int] = []
            lens: list[float] = []
            cmds: list[list[int]] = []
            labs: list[str] = []
            for i, (gt, stream) in enumerate(zip(gts, streams)):
                if gt != GEOM_LINESTRING:
                    raise ValueError(
                        "line_label_anchors: non-linestring feature "
                        f"(geom_type={gt}) — filter to linestrings first"
                    )
                parts = geom_from_stream(
                    GEOM_LINESTRING, np.asarray(stream, dtype=np.uint32)
                )
                best = None  # (total, part_idx, cum, pts)
                for pi, pts in enumerate(parts):
                    P = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
                    d = np.diff(P, axis=0)
                    cum = np.cumsum(np.sqrt(d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]))
                    tot = float(cum[-1]) if len(cum) else 0.0
                    if best is None or tot > best[0]:
                        best = (tot, pi, cum, pts)
                if best is None or best[0] == 0.0:
                    continue  # zero-length: no defined anchor
                tot, pi, cum, pts = best
                half = tot / 2.0
                j = int(np.searchsorted(cum, half, side="left")) + 1
                px, py = (int(v) for v in np.asarray(pts)[j])
                keep.append(i)
                pxs.append(px)
                pys.append(py)
                pidx.append(pi)
                lens.append(tot)
                zx = (px << 1) ^ (px >> 63) if px >= 0 else ((-px) << 1) - 1
                zy = (py << 1) ^ (py >> 63) if py >= 0 else ((-py) << 1) - 1
                cmds.append([(1 << 3) | 1, zx, zy])
                labs.append(layers[i] + suffix)
            idx = pa.array(keep, type=pa.int64())
            cols = {}
            for f in b.schema.names:
                if f == geom_col:
                    cols[f] = pa.array(cmds, type=b.schema.field(geom_col).type)
                elif f == "geom_type":
                    cols[f] = pa.array(
                        [GEOM_POINT] * len(keep), type=b.schema.field(f).type
                    )
                elif f == "layer":
                    cols[f] = pa.array(labs, type=b.schema.field(f).type)
                else:
                    cols[f] = b[f].take(idx)
            cols["px"] = pa.array(pxs, type=pa.int32())
            cols["py"] = pa.array(pys, type=pa.int32())
            cols["part_idx"] = pa.array(pidx, type=pa.int32())
            cols["len_px"] = pa.array(lens, type=pa.float64())
            yield pa.record_batch(cols)

    return feats.mapInArrow(run, out_schema)


def buffer_cos_sin(n_vertices: int) -> list[tuple[float, float]]:
    """The (cos, sin) table for ``point_buffers`` ring vertices — computed
    ONCE here in Python and embedded as double literals in both the
    Column plan and the SQL oracle (no engine trigonometry, the hexbin /
    hillshade discipline)."""
    import math

    return [
        (math.cos(2.0 * math.pi * k / n_vertices),
         math.sin(2.0 * math.pi * k / n_vertices))
        for k in range(n_vertices)
    ]


def point_buffers(
    pts: DataFrame,
    radius_px: int,
    n_vertices: int = 16,
    layer: str = "buffers",
    px_col: str = "px",
    py_col: str = "py",
    feature_id_col: str = "feature_id",
):
    """Point rows -> regular-``n_vertices``-gon polygon BUFFER features
    (tile-local pixels) — the "within R of the POI" layer every coverage/
    catchment map renders. Vertex k sits at ``(px + floor(R*cos_k + 0.5),
    py + floor(R*sin_k + 0.5))`` with the (cos_k, sin_k) doubles from
    ``buffer_cos_sin`` — embedded literals, so the ONLY float ops are one
    multiply + floor per coordinate and the ring replays bit-for-bit in
    SQL. Increasing k traces the exterior winding (surveyor > 0 under
    the top-left origin), so the rings group correctly at decode.

    Pure Column construction into ``geom_features``'s nested-array door
    (zero shuffle; the encode shuffle happens at the sink like every
    other feature source). Rows must carry tile keys + integer pixel
    coords; radius >= 2 px and n_vertices <= ~2*pi*radius keep adjacent
    vertices distinct after rounding (validated loosely: radius >= 2,
    3 <= n_vertices <= 64).
    """
    from pyspark.sql import functions as F

    from .tiling import geom_features

    if radius_px < 2:
        raise ValueError(f"radius_px={radius_px} must be >= 2")
    if not 3 <= n_vertices <= 64:
        raise ValueError(f"n_vertices={n_vertices} outside [3, 64]")
    R = float(radius_px)
    px, py = F.col(px_col).cast("bigint"), F.col(py_col).cast("bigint")
    verts = [
        F.array(
            px + F.floor(F.lit(R) * F.lit(c) + F.lit(0.5)),
            py + F.floor(F.lit(R) * F.lit(s) + F.lit(0.5)),
        )
        for c, s in buffer_cos_sin(n_vertices)
    ]
    ring = F.array(*verts, verts[0])  # closed ring
    base = pts.select(
        F.col("tile_z"), F.col("tile_x"), F.col("tile_y"),
        F.lit(layer).alias("layer"),
        F.lit(GEOM_POLYGON).alias("geom_type"),
        F.col(feature_id_col).cast("bigint").alias("feature_id"),
        F.array(F.array(ring)).alias("geom"),
    )
    return geom_features(base)
