"""WebMercator XYZ tile math as pure Column expressions (JVM-side, no UDF).

Implements SURVEY.md §2.D3. The coordinate convention matches the reference
contract: tile-local integer grid with (0,0) top-left (Geometry.hs:30-31,
README.md:227) and extent 4096 by default (…/Tile/Layer.hs:31).

Everything here stays inside whole-stage codegen — these are the functions
Catalyst can push down, prune with, and partition on. NumPy twins (suffix
``_np``) are provided for use inside pandas UDFs and the DuckDB oracle
generator; both paths compute bit-identical results on float64.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_EXTENT = 4096
MAX_LAT = 85.05112878  # WebMercator clamp


def _norm_x(lon: Column) -> Column:
    """Fraction of the world width east of the antimeridian, in [0, 1)."""
    return (lon + F.lit(180.0)) / F.lit(360.0)


def _norm_y(lat: Column) -> Column:
    """WebMercator y fraction, 0 at the north clamp (top-left origin)."""
    rad = F.radians(lat)
    return (F.lit(1.0) - F.asinh(F.tan(rad)) / F.lit(math.pi)) / F.lit(2.0)


def tile_x(lon: Column, z: int | Column) -> Column:
    n = F.pow(F.lit(2.0), z).cast("double")
    return F.least(F.floor(_norm_x(lon) * n), n.cast("long") - 1).cast("int")


def tile_y(lat: Column, z: int | Column) -> Column:
    n = F.pow(F.lit(2.0), z).cast("double")
    return F.greatest(
        F.lit(0).cast("long"), F.least(F.floor(_norm_y(lat) * n), n.cast("long") - 1)
    ).cast("int")


def _edge_clamp(n: Column, z: int | Column) -> Column:
    """Largest double strictly below n=2^z: an ABSOLUTE epsilon (n - 1e-9)
    is a no-op once 1e-9 < ulp(2^z)/2 (z >= 25), sending lon=180 to pixel
    0 of the wrong tile instead of the east edge of the last one."""
    if isinstance(z, int):
        return F.lit(math.nextafter(float(1 << z), 0.0))
    return n - F.lit(1e-9)  # Column z: callers use z <= 24 here


def tile_px(lon: Column, z: int | Column, extent: int = DEFAULT_EXTENT) -> Column:
    """Tile-local x pixel in [0, extent) on the reference's discrete grid."""
    n = F.pow(F.lit(2.0), z).cast("double")
    fx = _norm_x(lon) * n
    fx = F.least(fx, _edge_clamp(n, z))  # lon=180: east edge of the last tile
    return F.least(
        F.floor((fx - F.floor(fx)) * F.lit(float(extent))), F.lit(extent - 1).cast("long")
    ).cast("int")


def tile_py(lat: Column, z: int | Column, extent: int = DEFAULT_EXTENT) -> Column:
    n = F.pow(F.lit(2.0), z).cast("double")
    fy = _norm_y(lat) * n
    fy = F.greatest(F.lit(0.0), F.least(fy, _edge_clamp(n, z)))
    return F.least(
        F.floor((fy - F.floor(fy)) * F.lit(float(extent))), F.lit(extent - 1).cast("long")
    ).cast("int")


def with_tile(df, lon="lon", lat="lat", z: int = 12, extent: int = DEFAULT_EXTENT):
    """Add (tile_z, tile_x, tile_y, px, py) columns — the engine's spatial key."""
    lon_c, lat_c = F.col(lon), F.col(lat)
    return (
        df.withColumn("tile_z", F.lit(z))
        .withColumn("tile_x", tile_x(lon_c, z))
        .withColumn("tile_y", tile_y(lat_c, z))
        .withColumn("px", tile_px(lon_c, z, extent))
        .withColumn("py", tile_py(lat_c, z, extent))
    )


def projected_tile_pixel(
    lon_c: Column,
    lat_c: Column,
    z: int,
    extent: int = DEFAULT_EXTENT,
    projection: str = "webmercator",
) -> tuple[Column, Column, Column, Column]:
    """(tile_x, tile_y, px, py) Columns for a point row under either grid.

    'webmercator' routes through the engine's tile grid above; 'equirect'
    is the pure-arithmetic twin that the DuckDB oracles replay bit-for-bit
    (lat in [-85, 85] mapped linearly, east/south edges clamped to the
    last tile/pixel exactly like tile_px). The SINGLE home for these
    clamp-sensitive expressions: cluster_points and rasterize_points both
    project through here, so the operators and their shared oracle
    arithmetic cannot drift."""
    if projection == "webmercator":
        return (
            tile_x(lon_c, z),
            tile_y(lat_c, z),
            tile_px(lon_c, z, extent),
            tile_py(lat_c, z, extent),
        )
    if projection != "equirect":
        raise ValueError(f"unknown projection {projection!r}")
    n = float(1 << z)
    top = float((1 << z) - 1)
    fx = (lon_c + 180.0) / 360.0 * n
    fy = (85.0 - lat_c) / 170.0 * n
    tx = F.least(F.floor(fx), F.lit(top)).cast("int")
    ty = F.least(F.floor(fy), F.lit(top)).cast("int")
    fx0 = F.least(fx, F.lit(top))
    fy0 = F.least(fy, F.lit(top))
    px = F.least(
        F.floor((fx - F.floor(fx0)) * float(extent)), F.lit(float(extent - 1))
    ).cast("int")
    py = F.least(
        F.floor((fy - F.floor(fy0)) * float(extent)), F.lit(float(extent - 1))
    ).cast("int")
    return tx, ty, px, py


def quadkey(z: int, x: Column, y: Column) -> Column:
    """Bing/Azure-style quadkey string for an XYZ tile: z base-4 digits,
    digit i = 2*bit(y, z-1-i) + bit(x, z-1-i). Quadkeys nest by prefix —
    a tile's ancestors are its prefixes, which makes prefix-range scans
    the locality trick Bing-compatible stores rely on. Pure Column
    concat of bit arithmetic (no UDF)."""
    if z <= 0:
        raise ValueError(f"quadkey needs z >= 1, got {z}")
    digits = [
        (
            F.shiftright(y, k).bitwiseAND(F.lit(1)) * 2
            + F.shiftright(x, k).bitwiseAND(F.lit(1))
        ).cast("string")
        for k in range(z - 1, -1, -1)
    ]
    return F.concat(*digits)


def tms_y(z: int, y: Column) -> Column:
    """XYZ (top-left origin, the engine's grid) <-> TMS (bottom-left,
    OSGeo spec) row flip: involution y' = 2^z - 1 - y."""
    return F.lit((1 << z) - 1) - y


# zigzag as Column expressions (ref Internal.hs:221-229) — registered for SQL
def zigzag(n: Column) -> Column:
    return F.shiftleft(n.cast("long"), 1).bitwiseXOR(F.shiftright(n.cast("long"), 63))


def unzigzag(u: Column) -> Column:
    return F.shiftrightunsigned(u.cast("long"), 1).bitwiseXOR(-(u.cast("long").bitwiseAND(F.lit(1))))


# ---- NumPy twins (same float64 math, for pandas UDFs / oracles) ----


def tile_xy_np(lon: np.ndarray, lat: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    n = float(2**z)
    fx = (np.asarray(lon, np.float64) + 180.0) / 360.0 * n
    rad = np.radians(np.asarray(lat, np.float64))
    fy = (1.0 - np.arcsinh(np.tan(rad)) / math.pi) / 2.0 * n
    tx = np.minimum(np.floor(fx), n - 1).astype(np.int32)
    ty = np.clip(np.floor(fy), 0, n - 1).astype(np.int32)
    return tx, ty


def tile_pixel_np(
    lon: np.ndarray, lat: np.ndarray, z: int, extent: int = DEFAULT_EXTENT
) -> tuple[np.ndarray, np.ndarray]:
    n = float(2**z)
    edge = np.nextafter(n, 0.0)  # see _edge_clamp: relative, z-safe
    fx = (np.asarray(lon, np.float64) + 180.0) / 360.0 * n
    fx = np.minimum(fx, edge)
    rad = np.radians(np.asarray(lat, np.float64))
    fy = (1.0 - np.arcsinh(np.tan(rad)) / math.pi) / 2.0 * n
    fy = np.clip(fy, 0.0, edge)
    px = np.minimum(np.floor((fx - np.floor(fx)) * extent), extent - 1).astype(np.int32)
    py = np.minimum(np.floor((fy - np.floor(fy)) * extent), extent - 1).astype(np.int32)
    return px, py


def tile_cover(
    lon_a: Column, lat_a: Column, lon_b: Column, lat_b: Column,
    z: int, max_tiles: int = 4096,
) -> Column:
    """Array of ``struct(tile_x, tile_y)`` covering the bbox spanned by
    the two corners at zoom ``z`` — the viewport query every tile server
    answers before fetching blobs. Corners are normalized with
    least/greatest so argument order never matters; antimeridian-wrapping
    boxes are NOT interpreted (split the box first). Pure Column algebra
    (two tile_x + two tile_y evaluations, one sequence cross product), so
    the SQL oracle replays it exactly; ``explode`` the result to join
    against a tile relation. A viewport wider than ``max_tiles`` raises
    loudly — a z=18 world box is 6.8e10 tiles, and that must be a caller
    bug, not a silent explode."""
    x0 = tile_x(F.least(lon_a, lon_b), z)
    x1 = tile_x(F.greatest(lon_a, lon_b), z)
    # tile_y grows southward; normalize on the OUTPUT ids, not the lats
    ya, yb = tile_y(lat_a, z), tile_y(lat_b, z)
    y0, y1 = F.least(ya, yb), F.greatest(ya, yb)
    n = (x1.cast("long") - x0 + 1) * (y1.cast("long") - y0 + 1)
    x0 = F.when(
        n > F.lit(int(max_tiles)),
        F.raise_error(F.concat(
            F.lit("tile_cover: viewport covers "), n.cast("string"),
            F.lit(f" tiles at z={z}, over max_tiles={max_tiles} — "
                  "lower the zoom or split the box"),
        )).cast("int"),
    ).otherwise(x0)
    return F.flatten(
        F.transform(
            F.sequence(x0, x1),
            lambda tx: F.transform(
                F.sequence(y0, y1),
                lambda ty: F.struct(
                    tx.cast("int").alias("tile_x"),
                    ty.cast("int").alias("tile_y"),
                ),
            ),
        )
    )
