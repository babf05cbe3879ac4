"""Tile math + cell index invariants: Column expressions agree with their
NumPy twins, hierarchy/adjacency laws hold (SURVEY.md build plan §7.4)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vectortiles_spark.functions import cells, tiles


def _sample(n=500, seed=7):
    rng = np.random.Generator(np.random.PCG64(seed))
    lon = rng.uniform(-180, 179.999, n)
    lat = rng.uniform(-85, 85, n)
    return lon, lat


def test_tile_xy_column_matches_numpy(spark):
    lon, lat = _sample()
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    for z in (0, 4, 12):
        out = df.select(
            tiles.tile_x(F.col("lon"), z).alias("tx"),
            tiles.tile_y(F.col("lat"), z).alias("ty"),
            tiles.tile_px(F.col("lon"), z).alias("px"),
            tiles.tile_py(F.col("lat"), z).alias("py"),
        ).toPandas()
        tx, ty = tiles.tile_xy_np(lon, lat, z)
        px, py = tiles.tile_pixel_np(lon, lat, z)
        assert np.array_equal(out.tx.values, tx)
        assert np.array_equal(out.ty.values, ty)
        assert np.array_equal(out.px.values, px)
        assert np.array_equal(out.py.values, py)


def test_tile_bounds():
    lon = np.array([-180.0, 0.0, 179.999999])
    lat = np.array([85.05, 0.0, -85.05])
    for z in (0, 1, 10):
        tx, ty = tiles.tile_xy_np(lon, lat, z)
        n = 2**z
        assert ((0 <= tx) & (tx < n)).all()
        assert ((0 <= ty) & (ty < n)).all()
        px, py = tiles.tile_pixel_np(lon, lat, z)
        assert ((0 <= px) & (px < 4096)).all()
        assert ((0 <= py) & (py < 4096)).all()


def test_top_left_origin():
    """(0,0) is top-left (Geometry.hs:30-31): north lat -> small py."""
    _, py_north = tiles.tile_pixel_np(np.array([0.0]), np.array([80.0]), 0)
    _, py_south = tiles.tile_pixel_np(np.array([0.0]), np.array([-80.0]), 0)
    assert py_north[0] < py_south[0]


def test_zigzag_columns(spark):
    vals = [0, -1, 1, -2, 2, 2147483647, -2147483648]
    df = spark.createDataFrame(pd.DataFrame({"n": vals}))
    out = df.select(tiles.unzigzag(tiles.zigzag(F.col("n"))).alias("r")).toPandas()
    assert out.r.tolist() == vals


def test_quad_cell_column_matches_numpy(spark):
    lon, lat = _sample(300)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    for level in (1, 6, 12):
        got = df.select(cells.quad_cell(F.col("lon"), F.col("lat"), level).alias("c")).toPandas()
        want = cells.quad_cell_np(lon, lat, level)
        assert np.array_equal(got.c.values, want)


def test_cell_hierarchy():
    """S2-style law: parent(cell) == cell >> 2, level from magnitude."""
    lon, lat = _sample(200)
    child = cells.quad_cell_np(lon, lat, 10)
    parent = cells.quad_cell_np(lon, lat, 9)
    assert np.array_equal(child >> 2, parent)
    hc = cells.hilbert_cell_np(lon, lat, 10)
    hp = cells.hilbert_cell_np(lon, lat, 9)
    assert np.array_equal(hc >> 2, hp)


def test_cell_level_roundtrip(spark):
    df = spark.range(1)
    for level in (3, 9):
        got = df.select(
            cells.cell_level(cells.quad_cell(F.lit(10.0), F.lit(20.0), level)).alias("l")
        ).collect()[0].l
        assert got == level


def test_hilbert_bijective_small():
    """Every (x, y) at level 5 maps to a distinct curve position covering 0..4^5-1."""
    n = 1 << 5
    xx, yy = np.meshgrid(np.arange(n), np.arange(n))
    d = cells.hilbert_d_np(xx.ravel(), yy.ravel(), 5)
    assert sorted(d.tolist()) == list(range(n * n))


def test_hilbert_locality():
    """Consecutive curve positions are grid neighbors (the property that
    makes range-partitioning on the cell id spatially local)."""
    n = 1 << 4
    xx, yy = np.meshgrid(np.arange(n), np.arange(n))
    d = cells.hilbert_d_np(xx.ravel(), yy.ravel(), 4)
    order = np.argsort(d)
    xs, ys = xx.ravel()[order], yy.ravel()[order]
    steps = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (steps == 1).all()


def test_neighbor_cells(spark):
    df = spark.createDataFrame(pd.DataFrame({"lon": [0.0], "lat": [0.0]}))
    out = df.select(cells.neighbor_cells(F.col("lon"), F.col("lat"), 6, ring=1).alias("nb")).collect()
    nb = out[0].nb
    assert len(nb) == 9  # interior point: full 3x3
    assert len(set(nb)) == 9
    own = cells.quad_cell_np(np.array([0.0]), np.array([0.0]), 6)[0]
    assert own in nb


def test_neighbor_cells_pole_clip(spark):
    """Rows past the top of the world are dropped, x wraps."""
    df = spark.createDataFrame(pd.DataFrame({"lon": [-180.0], "lat": [85.05]}))
    out = df.select(cells.neighbor_cells(F.col("lon"), F.col("lat"), 6, ring=1).alias("nb")).collect()
    nb = out[0].nb
    assert len(nb) == 6  # ty-1 row clipped; x wrapped, not clipped
    assert len(set(nb)) == 6


def test_hilbert_cell_column_matches_numpy_and_joins(spark):
    """The Hilbert Column path (pandas UDF) matches the NumPy twin, and an
    equi-join on hilbert cells returns exactly the same pairs as the Morton
    production key (both bijective with the (tx, ty) tile)."""
    from vectortiles_spark.functions.cells import hilbert_cell, hilbert_cell_np, quad_cell

    rng = np.random.Generator(np.random.PCG64(11))
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-84, 84, 300)
    pdf = pd.DataFrame({"pid": range(300), "lon": lon, "lat": lat})
    df = spark.createDataFrame(pdf)
    level = 6
    got = (
        df.select("pid", hilbert_cell(F.col("lon"), F.col("lat"), level).alias("h"))
        .orderBy("pid").toPandas()
    )
    expect = hilbert_cell_np(lon, lat, level)
    assert (got.h.to_numpy() == expect).all()

    withkeys = df.select(
        "pid",
        hilbert_cell(F.col("lon"), F.col("lat"), level).alias("h"),
        quad_cell(F.col("lon"), F.col("lat"), level).alias("m"),
    ).cache()
    a, b = withkeys.alias("a"), withkeys.alias("b")
    hj = {(r[0], r[1]) for r in a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.pid") < F.col("b.pid"))).select("a.pid", "b.pid").collect()}
    mj = {(r[0], r[1]) for r in a.join(b, (F.col("a.m") == F.col("b.m")) & (F.col("a.pid") < F.col("b.pid"))).select("a.pid", "b.pid").collect()}
    assert hj == mj and len(hj) > 0


def test_hilbert_cell_null_propagation(spark):
    pdf = pd.DataFrame({"pid": [1, 2, 3], "lon": [10.0, None, 20.0], "lat": [None, 5.0, 6.0]})
    from vectortiles_spark.functions.cells import hilbert_cell

    got = (
        spark.createDataFrame(pdf)
        .select("pid", hilbert_cell(F.col("lon"), F.col("lat"), 4).alias("h"))
        .orderBy("pid")
        .collect()
    )
    assert got[0].h is None and got[1].h is None and got[2].h is not None


def test_quadkey_bing_examples_and_prefix_nesting(spark):
    """Known Bing quadkeys (learn.microsoft.com tile system examples:
    tile (3,5) z=3 -> '213'), ancestor prefix nesting, and the TMS row
    involution."""
    from vectortiles_spark.functions.tiles import quadkey, tms_y

    df = spark.createDataFrame(
        [(3, 5), (0, 0), (7, 7), (4, 2)], "x int, y int"
    )
    rows = {(r.x, r.y): r for r in df.select(
        "x", "y",
        quadkey(3, F.col("x"), F.col("y")).alias("qk3"),
        quadkey(2, F.shiftright("x", 1), F.shiftright("y", 1)).alias("qk_parent"),
        tms_y(3, F.col("y")).alias("tms"),
        tms_y(3, tms_y(3, F.col("y"))).alias("tms_twice"),
    ).collect()}
    assert rows[(3, 5)].qk3 == "213"
    assert rows[(0, 0)].qk3 == "000"
    assert rows[(7, 7)].qk3 == "333"
    for r in rows.values():
        assert r.qk3[:2] == r.qk_parent  # ancestors are prefixes
        assert r.tms_twice == r.y        # involution
    assert rows[(3, 5)].tms == 2
    import pytest as _pt
    with _pt.raises(ValueError):
        quadkey(0, F.col("x"), F.col("y"))


# ------------------------------- geohash -------------------------------


def _py_geohash(lon, lat, precision):
    """Independent reference: classic interval-halving geohash."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits, ch, out, even = 0, 0, [], True
    while len(out) < precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lo_lon = mid
            else:
                ch <<= 1
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lo_lat = mid
            else:
                ch <<= 1
                hi_lat = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(alpha[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_known_values(spark):
    from vectortiles_spark.functions.cells import geohash_encode

    df = spark.createDataFrame(
        [(-5.603, 42.605, "ezs42"), (-0.1278, 51.5074, "gcpvj0d"),
         (139.6917, 35.6895, "xn774c0")],
        "lon double, lat double, want string",
    )
    p5 = df.select(geohash_encode(F.col("lon"), F.col("lat"), 5).alias("g"), "want")
    for r in p5.collect():
        assert r.g == r.want[:5], (r.g, r.want)
    p7 = df.select(geohash_encode(F.col("lon"), F.col("lat"), 7).alias("g"), "want")
    for r in p7.collect():
        assert r.g == (r.want + "xxxxxxx")[:7] or len(r.want) < 7 or r.g == r.want


def test_geohash_matches_reference_impl(spark):
    from vectortiles_spark.functions.cells import geohash_encode

    rows = [
        (((i * 9973) % 36000) / 100.0 - 180.0, ((i * 7919) % 17000) / 100.0 - 85.0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "lon double, lat double")
    for p in (1, 4, 6, 9):
        got = df.select(
            "lon", "lat", geohash_encode(F.col("lon"), F.col("lat"), p).alias("g")
        ).collect()
        for r in got:
            assert r.g == _py_geohash(r.lon, r.lat, p), (r.lon, r.lat, p, r.g)


def test_geohash_prefixes_nest(spark):
    from vectortiles_spark.functions.cells import geohash_encode

    df = spark.createDataFrame([(2.35, 48.86)], "lon double, lat double")
    g9 = df.select(geohash_encode(F.col("lon"), F.col("lat"), 9).alias("g")).collect()[0].g
    for p in range(1, 9):
        gp = df.select(geohash_encode(F.col("lon"), F.col("lat"), p).alias("g")).collect()[0].g
        assert g9.startswith(gp)


def test_tile_cover_matches_per_corner_ids(spark):
    """Every tile in the cover is within the corner-id rectangle, the
    corners themselves are covered, and the count is the product."""
    from vectortiles_spark.functions.tiles import tile_cover, tile_x, tile_y

    df = spark.range(1, 200).select(
        (F.pmod(F.col("id") * 9973, F.lit(36000)) / 100.0 - 180.0).alias("lon_a"),
        (F.pmod(F.col("id") * 7919, F.lit(17000)) / 100.0 - 85.0).alias("lat_a"),
        (F.pmod(F.col("id") * 9973, F.lit(36000)) / 100.0 - 178.0).alias("lon_b"),
        (F.pmod(F.col("id") * 7919, F.lit(17000)) / 100.0 - 83.0).alias("lat_b"),
    )
    z = 6
    out = df.select(
        tile_x(F.least("lon_a", "lon_b"), z).alias("x0"),
        tile_x(F.greatest("lon_a", "lon_b"), z).alias("x1"),
        F.least(tile_y(F.col("lat_a"), z), tile_y(F.col("lat_b"), z)).alias("y0"),
        F.greatest(tile_y(F.col("lat_a"), z), tile_y(F.col("lat_b"), z)).alias("y1"),
        tile_cover(F.col("lon_a"), F.col("lat_a"),
                   F.col("lon_b"), F.col("lat_b"), z).alias("cover"),
    ).collect()
    for r in out:
        tiles = {(t["tile_x"], t["tile_y"]) for t in r["cover"]}
        assert len(tiles) == (r["x1"] - r["x0"] + 1) * (r["y1"] - r["y0"] + 1)
        assert (r["x0"], r["y0"]) in tiles and (r["x1"], r["y1"]) in tiles
        assert all(
            r["x0"] <= x <= r["x1"] and r["y0"] <= y <= r["y1"]
            for x, y in tiles
        )


def test_tile_cover_corner_order_irrelevant(spark):
    from vectortiles_spark.functions.tiles import tile_cover

    one = spark.range(1).select(
        tile_cover(F.lit(10.0), F.lit(50.0), F.lit(12.0), F.lit(48.0), 8).alias("a"),
        tile_cover(F.lit(12.0), F.lit(48.0), F.lit(10.0), F.lit(50.0), 8).alias("b"),
    ).collect()[0]
    assert one["a"] == one["b"] and len(one["a"]) > 1


def test_tile_cover_guard_raises(spark):
    import pytest as _pt

    from vectortiles_spark.functions.tiles import tile_cover

    df = spark.range(1).select(
        tile_cover(F.lit(-179.0), F.lit(80.0), F.lit(179.0), F.lit(-80.0),
                   12, max_tiles=1000).alias("c")
    )
    with _pt.raises(Exception, match="tile_cover"):
        df.collect()
