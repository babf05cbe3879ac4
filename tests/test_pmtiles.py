"""PMTiles v3 archive (sources/pmtiles.py): tile-id math, directory and
header codecs (pure NumPy), and the distributed write/read roundtrip."""

import gzip
import os

import numpy as np
import pytest
from pyspark.sql import Row

from vectortiles_spark.sources import pmtiles as P


# ------------------------------------------------------------- pure kernels

def test_hilbert_roundtrip_all_small_zooms():
    for z in range(0, 7):
        n = 1 << z
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        xs, ys = xs.ravel(), ys.ravel()
        d = P.hilbert_d(z, xs, ys)
        # a space-filling curve: every cell exactly once
        assert sorted(d.tolist()) == list(range(n * n))
        x2, y2 = P.hilbert_xy(z, d)
        assert (x2 == xs.astype(np.uint64)).all()
        assert (y2 == ys.astype(np.uint64)).all()


def test_hilbert_locality():
    # consecutive d at z=10 are always grid neighbors (curve property)
    z = 10
    d = np.arange(5000, dtype=np.uint64)
    x, y = P.hilbert_xy(z, d)
    step = np.abs(np.diff(x.astype(np.int64))) + np.abs(np.diff(y.astype(np.int64)))
    assert (step == 1).all()


def test_tileid_known_values():
    # spec anchors: id 0 = (0,0,0); zoom bases are (4^z - 1) / 3
    assert P.zoom_base(0) == 0
    assert P.zoom_base(1) == 1
    assert P.zoom_base(2) == 5
    assert P.zoom_base(3) == 21
    tid = P.zxy_to_tileid(np.array([0]), np.array([0]), np.array([0]))
    assert tid[0] == 0
    # all four z=1 tiles land in [1, 5)
    tid = P.zxy_to_tileid(np.array([1] * 4), np.array([0, 0, 1, 1]),
                          np.array([0, 1, 0, 1]))
    assert sorted(tid.tolist()) == [1, 2, 3, 4]


def test_tileid_roundtrip_mixed_zooms():
    rng = np.random.default_rng(3)
    zs = rng.integers(0, 15, 500)
    xs = np.array([rng.integers(0, 1 << z) for z in zs])
    ys = np.array([rng.integers(0, 1 << z) for z in zs])
    tid = P.zxy_to_tileid(zs, xs, ys)
    z2, x2, y2 = P.tileid_to_zxy(tid)
    assert (z2 == zs).all() and (x2 == xs).all() and (y2 == ys).all()


def test_directory_roundtrip():
    ids = np.array([3, 9, 10, 11, 500], np.uint64)
    runs = np.array([1, 1, 1, 1, 1], np.int64)
    lens = np.array([10, 20, 5, 5, 1], np.int64)
    offs = np.array([0, 10, 30, 35, 100], np.int64)  # gap after entry 2
    buf = P._serialize_dir(ids, runs, lens, offs)
    i2, r2, l2, o2 = P._parse_dir(buf)
    assert (i2 == ids).all() and (r2 == runs).all()
    assert (l2 == lens).all() and (o2 == offs).all()
    # empty directory
    i2, r2, l2, o2 = P._parse_dir(P._serialize_dir(
        np.zeros(0, np.uint64), np.zeros(0, np.int64),
        np.zeros(0, np.int64), np.zeros(0, np.int64)))
    assert len(i2) == 0


def test_directory_rejects_torn():
    buf = P._serialize_dir(
        np.array([1, 2], np.uint64), np.ones(2, np.int64),
        np.array([4, 4], np.int64), np.array([0, 4], np.int64))
    with pytest.raises(ValueError, match="entries"):
        P._parse_dir(buf[:-2])


def test_header_roundtrip():
    f = {
        "root_off": 127, "root_len": 90, "meta_off": 217, "meta_len": 30,
        "leaf_off": 247, "leaf_len": 0, "data_off": 247, "data_len": 12345,
        "n_addressed": 7, "n_entries": 7, "n_contents": 7, "clustered": True,
        "internal_compression": P.COMPRESSION_GZIP,
        "tile_compression": P.COMPRESSION_GZIP, "tile_type": P.TILETYPE_MVT,
        "min_zoom": 3, "max_zoom": 9,
        "min_lon_e7": -1800000000, "min_lat_e7": -850000000,
        "max_lon_e7": 1800000000, "max_lat_e7": 850000000,
        "center_zoom": 3, "center_lon_e7": 0, "center_lat_e7": 0,
    }
    buf = P._pack_header(f)
    assert len(buf) == P.HEADER_LEN and buf[:7] == b"PMTiles" and buf[7] == 3
    assert P._unpack_header(buf) == f
    with pytest.raises(ValueError, match="magic"):
        P._unpack_header(b"NTtiles" + buf[7:])
    with pytest.raises(ValueError, match="version"):
        P._unpack_header(buf[:7] + b"\x02" + buf[8:])


# --------------------------------------------------------- distributed e2e

def _tile_rows(n=900, z=9):
    rng = np.random.default_rng(11)
    seen = set()
    rows = []
    while len(rows) < n:
        x, y = int(rng.integers(0, 1 << z)), int(rng.integers(0, 1 << z))
        if (x, y) in seen:
            continue
        seen.add((x, y))
        rows.append(Row(tile_z=z, tile_x=x, tile_y=y,
                        mvt=bytes([len(rows) % 251]) * (1 + len(rows) % 37)))
    return rows


def test_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.pmtiles")
    rows = _tile_rows(900)
    df = spark.createDataFrame(rows)
    P.write_pmtiles(df, path, metadata={"name": "t"}, partitions=5)
    hdr = P.read_header(path)
    assert hdr["n_entries"] == 900 and hdr["clustered"]
    assert hdr["min_zoom"] == 9 and hdr["max_zoom"] == 9
    assert P.read_metadata(path)["name"] == "t"
    back = P.read_pmtiles(spark, path).collect()
    assert sorted((r.tile_z, r.tile_x, r.tile_y, bytes(r.mvt)) for r in back) == \
        sorted((r.tile_z, r.tile_x, r.tile_y, r.mvt) for r in rows)


def test_write_is_deterministic(spark, tmp_path):
    p1, p2 = str(tmp_path / "a.pmtiles"), str(tmp_path / "b.pmtiles")
    rows = _tile_rows(200)
    P.write_pmtiles(spark.createDataFrame(rows), p1, partitions=3)
    P.write_pmtiles(spark.createDataFrame(list(reversed(rows))), p2, partitions=7)
    with open(p1, "rb") as a, open(p2, "rb") as b:
        assert a.read() == b.read()  # byte-identical regardless of input order


def test_leaf_directories(spark, tmp_path, monkeypatch):
    # force the leaf path with a tiny root budget
    monkeypatch.setattr(P, "ROOT_BUDGET", 50)
    monkeypatch.setattr(P, "LEAF_SIZE", 64)
    path = str(tmp_path / "leafy.pmtiles")
    rows = _tile_rows(300, z=8)
    P.write_pmtiles(spark.createDataFrame(rows), path, partitions=4)
    assert P.read_header(path)["leaf_len"] > 0
    back = P.read_pmtiles(spark, path).collect()
    assert sorted((r.tile_z, r.tile_x, r.tile_y, bytes(r.mvt)) for r in back) == \
        sorted((r.tile_z, r.tile_x, r.tile_y, r.mvt) for r in rows)


def test_zoom_filter_pushdown(spark, tmp_path):
    path = str(tmp_path / "mz.pmtiles")
    rows = [Row(tile_z=1, tile_x=0, tile_y=0, mvt=b"a"),
            Row(tile_z=2, tile_x=1, tile_y=1, mvt=b"bb"),
            Row(tile_z=2, tile_x=3, tile_y=0, mvt=b"cc")]
    P.write_pmtiles(spark.createDataFrame(rows), path, partitions=2)
    only2 = P.read_pmtiles(spark, path, z=2).collect()
    assert sorted((r.tile_x, r.tile_y) for r in only2) == [(1, 1), (3, 0)]
    assert P.read_pmtiles(spark, path, z=5).count() == 0


def test_duplicate_keys_raise(spark, tmp_path):
    path = str(tmp_path / "dup.pmtiles")
    rows = [Row(tile_z=3, tile_x=1, tile_y=1, mvt=b"a"),
            Row(tile_z=3, tile_x=1, tile_y=1, mvt=b"b")]
    with pytest.raises(Exception, match="duplicate tile keys"):
        P.write_pmtiles(spark.createDataFrame(rows), path, partitions=2)
    assert not os.path.exists(path)


def test_uncompressed_tiles(spark, tmp_path):
    path = str(tmp_path / "u.pmtiles")
    rows = _tile_rows(40, z=6)
    P.write_pmtiles(spark.createDataFrame(rows), path, compress=False, partitions=2)
    assert P.read_header(path)["tile_compression"] == P.COMPRESSION_NONE
    back = P.read_pmtiles(spark, path).collect()
    assert len(back) == 40
    assert {bytes(r.mvt) for r in back} == {r.mvt for r in rows}


def test_missing_and_empty(spark, tmp_path):
    assert P.read_pmtiles(spark, str(tmp_path / "nope.pmtiles")).count() == 0
    path = str(tmp_path / "empty.pmtiles")
    P.write_pmtiles(
        spark.createDataFrame([], P.TILES_SCHEMA), path, partitions=2
    )
    assert P.read_header(path)["n_entries"] == 0
    assert P.read_pmtiles(spark, path).count() == 0


def test_content_dedup_and_rle(spark, tmp_path):
    """Identical blobs are stored ONCE (back-referencing offsets) and
    consecutive-id duplicates collapse into run-length entries — the
    planet-scale ocean-tile story. The read side must be unaffected."""
    path = str(tmp_path / "ocean.pmtiles")
    z = 7
    ocean = b"\x00" * 64
    rows = [Row(tile_z=z, tile_x=x, tile_y=y, mvt=ocean)
            for x in range(16) for y in range(16)]
    # a few distinct "land" tiles scattered in the middle of the range
    for i, (x, y) in enumerate([(3, 3), (9, 14), (12, 1)]):
        rows[x * 16 + y] = Row(tile_z=z, tile_x=x, tile_y=y,
                               mvt=b"land-%d" % i * 9)
    P.write_pmtiles(spark.createDataFrame(rows), path, partitions=4)
    hdr = P.read_header(path)
    assert hdr["n_addressed"] == 256
    assert hdr["n_contents"] == 4          # ocean + 3 land tiles
    assert hdr["n_entries"] < 32           # Hilbert contiguity -> few runs
    # data section holds exactly the 4 distinct gzipped blobs
    assert hdr["data_len"] == sum(
        len(gzip.compress(b, mtime=0))
        for b in [ocean, b"land-0" * 9, b"land-1" * 9, b"land-2" * 9])
    back = P.read_pmtiles(spark, path).collect()
    assert sorted((r.tile_z, r.tile_x, r.tile_y, bytes(r.mvt)) for r in back) == \
        sorted((r.tile_z, r.tile_x, r.tile_y, r.mvt) for r in rows)


def test_run_length_entries_honored_on_read(spark, tmp_path):
    """Archives written by other tools may RLE identical consecutive
    tiles; the reader expands them (we never write them)."""
    path = str(tmp_path / "rle.pmtiles")
    blob = gzip.compress(b"same", mtime=0)
    root = P._gz(P._serialize_dir(
        np.array([P.zoom_base(2) + 1], np.uint64),  # ids 6,7,8 via run 3
        np.array([3], np.int64),
        np.array([len(blob)], np.int64),
        np.array([0], np.int64)))
    hdr = P._pack_header({
        "root_off": P.HEADER_LEN, "root_len": len(root),
        "meta_off": P.HEADER_LEN + len(root), "meta_len": 0,
        "leaf_off": P.HEADER_LEN + len(root), "leaf_len": 0,
        "data_off": P.HEADER_LEN + len(root), "data_len": len(blob),
        "n_addressed": 3, "n_entries": 1, "n_contents": 1, "clustered": True,
        "internal_compression": P.COMPRESSION_GZIP,
        "tile_compression": P.COMPRESSION_GZIP, "tile_type": P.TILETYPE_MVT,
        "min_zoom": 2, "max_zoom": 2,
        "min_lon_e7": 0, "min_lat_e7": 0, "max_lon_e7": 0, "max_lat_e7": 0,
        "center_zoom": 2, "center_lon_e7": 0, "center_lat_e7": 0,
    })
    with open(path, "wb") as f:
        f.write(hdr + root + blob)
    back = P.read_pmtiles(spark, path).collect()
    assert len(back) == 3
    assert all(bytes(r.mvt) == b"same" for r in back)
    assert sorted(
        int(t) for t in P.zxy_to_tileid(
            np.array([r.tile_z for r in back]),
            np.array([r.tile_x for r in back]),
            np.array([r.tile_y for r in back]))
    ) == [6, 7, 8]


def test_zoom_filter_keeps_run_crossing_zoom_boundary(spark, tmp_path):
    """Zoom bases are contiguous in id space, so an RLE run written at z
    can extend into z+1 (a planet ocean does this constantly); the zoom
    pushdown must keep the boundary-crossing entry."""
    path = str(tmp_path / "cross.pmtiles")
    blob = gzip.compress(b"ocean", mtime=0)
    # run of 4 ids starting at the LAST id of z=1 (id 4): covers ids
    # 4,5,6,7 -> one z=1 tile + three z=2 tiles
    root = P._gz(P._serialize_dir(
        np.array([4], np.uint64), np.array([4], np.int64),
        np.array([len(blob)], np.int64), np.array([0], np.int64)))
    hdr = P._pack_header({
        "root_off": P.HEADER_LEN, "root_len": len(root),
        "meta_off": P.HEADER_LEN + len(root), "meta_len": 0,
        "leaf_off": P.HEADER_LEN + len(root), "leaf_len": 0,
        "data_off": P.HEADER_LEN + len(root), "data_len": len(blob),
        "n_addressed": 4, "n_entries": 1, "n_contents": 1, "clustered": True,
        "internal_compression": P.COMPRESSION_GZIP,
        "tile_compression": P.COMPRESSION_GZIP, "tile_type": P.TILETYPE_MVT,
        "min_zoom": 1, "max_zoom": 2,
        "min_lon_e7": 0, "min_lat_e7": 0, "max_lon_e7": 0, "max_lat_e7": 0,
        "center_zoom": 1, "center_lon_e7": 0, "center_lat_e7": 0,
    })
    with open(path, "wb") as f:
        f.write(hdr + root + blob)
    assert P.read_pmtiles(spark, path).count() == 4
    z2 = P.read_pmtiles(spark, path, z=2).collect()   # ids 5,6,7
    assert len(z2) == 3 and all(r.tile_z == 2 for r in z2)
    z1 = P.read_pmtiles(spark, path, z=1).collect()   # id 4 only
    assert len(z1) == 1 and z1[0].tile_z == 1


def test_header_bounds_cover_rle_runs(spark, tmp_path):
    """min/max zoom and the bbox must cover ADDRESSED tiles inside runs,
    not just entry heads (chunked run expansion on the write side)."""
    path = str(tmp_path / "runs.pmtiles")
    z = 5
    ocean = b"\x00" * 32
    # every z=5 tile identical -> collapses to ONE run entry
    rows = [Row(tile_z=z, tile_x=x, tile_y=y, mvt=ocean)
            for x in range(32) for y in range(32)]
    P.write_pmtiles(spark.createDataFrame(rows), path, partitions=3)
    hdr = P.read_header(path)
    assert hdr["n_entries"] == 1 and hdr["n_addressed"] == 1024
    assert hdr["min_zoom"] == hdr["max_zoom"] == 5
    # full-planet coverage at z=5 -> bbox spans the whole mercator square
    assert hdr["min_lon_e7"] == -1800000000 and hdr["max_lon_e7"] == 1800000000


def test_first_entry_offset_sentinel_rejected_both_paths():
    """Sentinel 0 on the FIRST entry is malformed on the vector path AND
    the serial path (other zeros present) — both must raise."""
    from vectortiles_spark.mvt import wire

    for off_fields in ([0, 5], [0, 0]):  # serial path needs a later 0
        stream = np.array(
            [2, 10, 1, 1, 1, 4, 4] + off_fields, np.uint64
        )  # n=2, ids 10,11, runs 1,1, lens 4,4
        buf = bytes(wire.encode_varints(stream))
        with pytest.raises(ValueError, match="sentinel"):
            P._parse_dir(buf)


def test_failed_write_leaves_no_part_litter(spark, tmp_path):
    """A duplicate-key failure mid-assembly must clean up part files and
    the part directory, not just the .tmp archive."""
    rows = [Row(tile_z=3, tile_x=1, tile_y=1, mvt=bytearray(b"x")) for _ in range(2)]
    df = spark.createDataFrame(rows, P.TILES_SCHEMA)
    out = str(tmp_path / "dup.pmtiles")
    with pytest.raises(ValueError, match="duplicate"):
        P.write_pmtiles(df, out)
    litter = [p for p in os.listdir(tmp_path) if p != "dup.pmtiles"]
    assert litter == [], litter
    assert not os.path.exists(out)
