"""Point clustering: grid-bin points per tile into representative
cluster features with aggregated attributes.

A tile of 400k POIs is unreadable and unencodable; every production
tile pipeline thins dense point layers by CLUSTERING rather than
dropping (tippecanoe ``--cluster-densest-as-needed`` / ``--cluster-
distance``, supercluster): nearby points collapse into one
representative feature carrying ``point_count`` plus aggregated
attributes, and the map shows "1,274 places" instead of a blob. This
module is that operator, Spark-first:

* ``cluster_points``: ONE hash aggregate keyed on (tile, bin) — pure
  Column arithmetic (projection + shift binning, JVM whole-stage
  codegen) in, map-side-combinable aggregates out. Shuffle volume is
  bounded by OUTPUT cardinality (tiles x (extent/radius_px)^2), never
  by input rows: a 10^9-point metro tile moves (extent/radius)^2
  partial rows through the exchange, exactly like
  ``rasterize_points`` (raster.py) and unlike any per-feature shuffle.
  Hot tiles therefore cannot skew this exchange — the skew-handling
  story is the binning itself.
* A singleton bin IS the original point: its centroid (sum div n with
  n=1) is the point's own pixel and its rep_id is the point's id, so
  unclustered points pass through exactly (supercluster's behavior)
  with no second pass and no join-back.
* ``cluster_features``: cluster rows -> canonical feature rows for
  ``encode_tiles`` (tiling.py), the packed single-point stream with
  ``point_count`` metadata — so a clustered layer drops into the
  flagship sink unchanged.
* ``cluster_pyramid``: the per-zoom union (supercluster builds its
  cluster index per zoom; each level here is an independent one-
  exchange aggregate from the base relation, embarrassingly parallel
  across zooms — not the sequential hierarchical variant, which would
  chain z max..0 dependencies for a slightly different dot placement).

Centroids use INTEGER division (sum(px) div n) so the Spark plan and
the DuckDB oracle (plans/queries.py Q_CLUSTER_SQL) agree bit-for-bit
with zero float-summation-order exposure.

Reference semantic contract: the emitted features encode through the
same MVT point semantics as point_features (vectortiles
Internal.hs:158-159 single-point command stream, cursor (0,0)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tiles import projected_tile_pixel, zigzag
from ..mvt import codec

_AGG_FNS = ("sum", "min", "max", "avg", "count")


def _projected(df, z, lon, lat, projection, extent):
    """(tile_x, tile_y, px, py) Columns for one point row — the shared
    projection home (functions.tiles.projected_tile_pixel), so this
    operator, rasterize_points, and the DuckDB oracle arithmetic cannot
    drift."""
    return projected_tile_pixel(F.col(lon), F.col(lat), z, extent, projection)


def cluster_points(
    df: DataFrame,
    z: int,
    radius_px: int = 256,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str | None = None,
    agg: dict[str, str] | None = None,
    projection: str = "webmercator",
    extent: int = codec.DEFAULT_EXTENT,
) -> DataFrame:
    """World-space points -> one cluster row per non-empty (tile, bin).

    Output: ``(tile_z, tile_x, tile_y, bin_x, bin_y, px, py,
    point_count, is_cluster[, rep_id][, <col>_<fn> ...])`` where
    (px, py) is the integer centroid (sum div count — exact, oracle-
    replayable), ``rep_id`` = min(``id_col``) (the deterministic
    representative), ``is_cluster`` = 1 when the bin holds >1 point,
    and ``agg`` maps column -> fn in {sum, min, max, avg, count}
    (sum/avg round to 2 places, matching rasterize_points' weight
    policy). Singletons pass through exactly: centroid == the point,
    rep_id == its id, aggregates == its values.
    """
    if radius_px < 1 or radius_px & (radius_px - 1):
        raise ValueError(f"radius_px={radius_px} must be a power of two")
    if extent % radius_px:
        raise ValueError(f"radius_px={radius_px} must divide extent={extent}")
    if projection not in ("webmercator", "equirect"):
        raise ValueError(f"unknown projection {projection!r}")
    bad = {fn for fn in (agg or {}).values() if fn not in _AGG_FNS}
    if bad:
        raise ValueError(f"unsupported agg fns {sorted(bad)}; use {_AGG_FNS}")
    reserved = {
        "tile_z", "tile_x", "tile_y", "bin_x", "bin_y",
        "_px", "_py", "_id", "px", "py", "point_count", "is_cluster", "rep_id",
    }
    clash = set(agg or {}) & reserved
    if clash:
        raise ValueError(
            f"agg columns {sorted(clash)} collide with cluster output/"
            "internal names — rename them upstream"
        )
    shift = radius_px.bit_length() - 1
    tx, ty, px, py = _projected(df, z, lon, lat, projection, extent)
    binned = df.select(
        F.lit(z).cast("int").alias("tile_z"),
        tx.alias("tile_x"),
        ty.alias("tile_y"),
        F.shiftright(px, shift).alias("bin_x"),
        F.shiftright(py, shift).alias("bin_y"),
        px.cast("bigint").alias("_px"),
        py.cast("bigint").alias("_py"),
        *([F.col(id_col).cast("bigint").alias("_id")] if id_col else []),
        *[F.col(c) for c in (agg or {})],
    )
    aggs = [
        F.count(F.lit(1)).alias("point_count"),
        F.expr("sum(_px) div count(*)").cast("int").alias("px"),
        F.expr("sum(_py) div count(*)").cast("int").alias("py"),
    ]
    if id_col:
        aggs.append(F.min("_id").alias("rep_id"))
    for c, fn in (agg or {}).items():
        out = f"{c}_{fn}"
        if fn == "count":
            aggs.append(F.count(c).alias(out))
        elif fn in ("sum", "avg"):
            aggs.append(F.round(getattr(F, fn)(c), 2).alias(out))
        else:
            aggs.append(getattr(F, fn)(c).alias(out))
    g = binned.groupBy("tile_z", "tile_x", "tile_y", "bin_x", "bin_y").agg(*aggs)
    return g.withColumn(
        "is_cluster", (F.col("point_count") > 1).cast("int")
    )


def cluster_features(
    clusters: DataFrame,
    layer: str = "clusters",
    extent: int = codec.DEFAULT_EXTENT,
) -> DataFrame:
    """Cluster rows -> canonical feature rows for ``encode_tiles``: the
    packed single-point stream (geom_pt bigint for the default extent,
    mirroring point_features' fast lane) with ``point_count`` typed
    metadata. feature_id is rep_id when present (stable under
    repartitioning), else the bin key packed into one bigint."""
    zx, zy = zigzag(F.col("px")), zigzag(F.col("py"))
    if "rep_id" in clusters.columns:
        fid = F.col("rep_id")
    else:
        fid = (
            F.shiftleft(F.col("bin_x").cast("bigint"), 32)
            .bitwiseOR(F.col("bin_y").cast("bigint"))
            + 1
        )
    if extent == codec.DEFAULT_EXTENT:
        geom = F.shiftleft(zx, 13).bitwiseOR(zy).cast("bigint").alias("geom_pt")
    else:
        header = F.lit((1 << 3) | 1).cast("bigint")
        geom = F.array(header, zx.cast("bigint"), zy.cast("bigint")).alias(
            "geom_cmds"
        )
    return clusters.select(
        "tile_z",
        "tile_x",
        "tile_y",
        F.lit(layer).alias("layer"),
        F.lit(1).alias("geom_type"),
        fid.cast("bigint").alias("feature_id"),
        geom,
        F.col("point_count").cast("bigint").alias("point_count"),
        F.col("is_cluster").cast("boolean").alias("clustered"),
    )


def cluster_pyramid(
    df: DataFrame, min_z: int, max_z: int, **kwargs
) -> DataFrame:
    """cluster_points at every zoom in [min_z, max_z], unioned — the
    supercluster-shaped multi-zoom index as independent per-zoom
    aggregates (each zoom is one exchange; zooms share the scan when
    the source is cached or the plan is reused under AQE)."""
    if not (0 <= min_z <= max_z):
        raise ValueError(f"need 0 <= min_z <= max_z, got {min_z}..{max_z}")
    out = None
    for z in range(min_z, max_z + 1):
        lvl = cluster_points(df, z, **kwargs)
        out = lvl if out is None else out.unionByName(lvl)
    return out


# sqrt(3)/3, 2/3, sqrt(3), sqrt(3)/2 as PYTHON double literals: both the
# Column plan and the DuckDB oracle embed these exact bit patterns, so no
# engine ever evaluates a sqrt and the hex arithmetic is pure shared-IEEE
# (+, *, /, floor, abs, comparisons) — deterministic and identical across
# engines by IEEE-754, the same discipline as the mercator twin formulas
# (functions/tiles.py).
_SQRT3_3 = 0.5773502691896258
_TWO_3 = 0.6666666666666666
_SQRT3 = 1.7320508075688772
_SQRT3_2 = 0.8660254037844386




def hex_axial_cols(gx, gy, size_px: int):
    """(hq, hr) axial hex Columns for global-pixel Columns (gx, gy) —
    the single home of the pointy-top axial transform + cube rounding so
    the batch operator, the streaming twin, and the SQL oracle cannot
    drift. Operation order pinned to the DuckDB twin (Q_HEXBIN_SQL)."""
    s = float(size_px)
    # fractional axial coords (pointy-top): qf=(sqrt3/3*gx - gy/3)/s,
    # rf=(2/3*gy)/s
    qf = (F.lit(_SQRT3_3) * gx - gy / F.lit(3.0)) / F.lit(s)
    rf = (F.lit(_TWO_3) * gy) / F.lit(s)
    yf = -qf - rf
    # cube rounding: Spark floor(double) yields BIGINT; promoting back to
    # double for the error terms is exact, so values match DuckDB's
    # double-typed floor bit-for-bit
    rq = F.floor(qf + F.lit(0.5))
    ry = F.floor(yf + F.lit(0.5))
    rr = F.floor(rf + F.lit(0.5))
    dq = F.abs(rq - qf)
    dy = F.abs(ry - yf)
    dr = F.abs(rr - rf)
    fix_q = (dq > dy) & (dq > dr)
    fix_r = ~fix_q & ~(dy > dr)
    hq = F.when(fix_q, -ry - rr).otherwise(rq).cast("bigint")
    hr = F.when(fix_r, -rq - ry).otherwise(rr).cast("bigint")
    return hq, hr


def hex_center_cols(hq, hr, size_px: int):
    """(cx_px, cy_px) global-pixel hex centers — the back-projection twin
    of hex_axial_cols, same literal discipline."""
    s = float(size_px)
    cx = (F.lit(_SQRT3) * hq + F.lit(_SQRT3_2) * hr) * F.lit(s)
    cy = F.lit(1.5) * hr * F.lit(s)
    return cx, cy


def hexbin_points(
    df: DataFrame,
    z: int,
    size_px: int = 128,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str | None = None,
    agg: dict[str, str] | None = None,
    projection: str = "webmercator",
    extent: int = codec.DEFAULT_EXTENT,
) -> DataFrame:
    """World-space points -> one row per non-empty HEXAGON in the zoom-z
    GLOBAL pixel plane (pointy-top axial grid, ``size_px`` = center-to-
    vertex radius). The hexagonal twin of ``cluster_points``: hex bins
    are the standard density-map cell (equidistant neighbors, no square-
    grid diagonal bias) and — because binning happens in GLOBAL pixels
    ``gx = tile_x * extent + px`` — hexes span tile borders seamlessly
    instead of snapping per tile.

    Output: ``(zoom, hq, hr, point_count, cx_px, cy_px[, rep_id]
    [, <col>_<fn>...])`` where (hq, hr) are the axial hex coordinates
    (fractional axial -> cube rounding with the largest-error correction)
    and (cx_px, cy_px) the hex CENTER in global pixels. Every float step
    is shared-IEEE arithmetic on embedded double literals (module header)
    in a pinned operation order, so the whole assignment — including the
    cube-round tie behavior — replays bit-for-bit in the DuckDB oracle.

    Scale shape: pure Column algebra (zero Python, whole-stage codegen)
    into ONE hash aggregate; map-side partial aggregation bounds shuffle
    volume by OUTPUT cardinality (non-empty hexes), so a 10^9-point metro
    hotspot moves one partial row per (partition, hex) — hot hexes cannot
    skew the exchange, same argument as cluster_points.
    """
    if size_px < 1:
        raise ValueError(f"size_px={size_px} must be >= 1")
    if projection not in ("webmercator", "equirect"):
        raise ValueError(f"unknown projection {projection!r}")
    bad = {fn for fn in (agg or {}).values() if fn not in _AGG_FNS}
    if bad:
        raise ValueError(f"unsupported agg fns {sorted(bad)}; use {_AGG_FNS}")
    # only names the implementation actually creates (gx/gy exist solely as
    # unnamed Column expressions, so they cannot clash)
    reserved = {"zoom", "hq", "hr", "point_count", "cx_px", "cy_px", "rep_id",
                "_id"}
    clash = set(agg or {}) & reserved
    if clash:
        raise ValueError(
            f"agg columns {sorted(clash)} collide with hexbin output/"
            "internal names — rename them upstream"
        )
    tx, ty, px, py = _projected(df, z, lon, lat, projection, extent)
    gx = (tx.cast("bigint") * extent + px).cast("double")
    gy = (ty.cast("bigint") * extent + py).cast("double")
    hq, hr = hex_axial_cols(gx, gy, size_px)
    binned = df.select(
        F.lit(z).cast("int").alias("zoom"),
        hq.alias("hq"),
        hr.alias("hr"),
        *([F.col(id_col).cast("bigint").alias("_id")] if id_col else []),
        *[F.col(c) for c in (agg or {})],
    )
    aggs = [F.count(F.lit(1)).alias("point_count")]
    if id_col:
        aggs.append(F.min("_id").alias("rep_id"))
    for c, fn in (agg or {}).items():
        out = f"{c}_{fn}"
        if fn == "count":
            aggs.append(F.count(c).alias(out))
        elif fn in ("sum", "avg"):
            aggs.append(F.round(getattr(F, fn)(c), 2).alias(out))
        else:
            aggs.append(getattr(F, fn)(c).alias(out))
    g = binned.groupBy("zoom", "hq", "hr").agg(*aggs)
    cx, cy = hex_center_cols(F.col("hq"), F.col("hr"), size_px)
    return g.select(
        "zoom", "hq", "hr", "point_count",
        cx.alias("cx_px"), cy.alias("cy_px"),
        *[c for c in g.columns if c not in ("zoom", "hq", "hr", "point_count")],
    )
