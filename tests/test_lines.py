"""merge_lines: chaining kernel vs brute structure, distributed pass
determinism, error contract."""

import itertools

import numpy as np
import pytest

from vectortiles_spark.operators.lines import _merge_group, merge_lines


def L(*pts):
    return np.array(pts, float)


def test_merge_group_chain_and_reversal():
    m = _merge_group([L((0, 0), (1, 0)), L((2, 0), (1, 0)), L((2, 0), (3, 0))])
    assert len(m) == 1 and m[0].tolist() == [[0, 0], [1, 0], [2, 0], [3, 0]]


def test_merge_group_junction_breaks():
    m = _merge_group([L((0, 0), (1, 0)), L((1, 0), (2, 0)), L((1, 0), (1, 1))])
    assert sorted(len(c) for c in m) == [2, 2, 2]
    # every chain is in canonical (lexicographically smaller) orientation
    for c in m:
        assert tuple(c.ravel()) <= tuple(c[::-1].ravel())


def test_merge_group_cycle_closes_at_min_vertex():
    m = _merge_group(
        [L((0, 0), (1, 0)), L((1, 0), (1, 1)), L((1, 1), (0, 1)), L((0, 1), (0, 0))]
    )
    assert len(m) == 1
    c = m[0]
    assert len(c) == 5 and c[0].tolist() == [0, 0] and c[-1].tolist() == [0, 0]


def test_merge_group_multivertex_inputs_keep_interiors():
    """Interior vertices of input polylines survive into the chain."""
    m = _merge_group([L((0, 0), (1, 5), (2, 0)), L((2, 0), (3, 5), (4, 0))])
    assert len(m) == 1
    assert m[0].tolist() == [[0, 0], [1, 5], [2, 0], [3, 5], [4, 0]]


def test_merge_group_deterministic_under_permutation():
    base = [
        L((0, 0), (1, 0)), L((1, 0), (2, 0)), L((2, 0), (2, 1)),
        L((2, 1), (3, 1)), L((2, 0), (4, 0)),
    ]
    ref = [c.tolist() for c in _merge_group(base)]
    for perm in itertools.permutations(range(5)):
        assert [c.tolist() for c in _merge_group([base[i] for i in perm])] == ref


def _seg_rows(segs):
    """(tile_x, fid, line) -> FEATURE-ish rows with nested geom."""
    return [
        (0, int(tx), 0, "roads", 2, int(fid), [[[list(map(float, p)) for p in line]]])
        for tx, fid, line in segs
    ]


_SCHEMA = (
    "tile_z int, tile_x int, tile_y int, layer string, geom_type int, "
    "feature_id bigint, geom array<array<array<array<double>>>>"
)


def test_merge_lines_distributed_matches_kernel(spark):
    rng = np.random.default_rng(3)
    segs, expect = [], {}
    fid = 0
    for tx in range(4):
        lines = []
        for chain in range(5):
            y = chain * 10
            xs = np.arange(rng.integers(3, 8))
            for i in xs[:-1]:
                a, b = (float(i), float(y)), (float(i + 1), float(y))
                if rng.random() < 0.5:
                    a, b = b, a
                segs.append((tx, fid, [a, b]))
                fid += 1
            lines.extend(
                [L((i, y), (i + 1, y)) for i in xs[:-1]]
            )
        expect[tx] = [c.tolist() for c in _merge_group(lines)]
    df = spark.createDataFrame(_seg_rows(segs), _SCHEMA)
    for parts in (1, 7):
        out = merge_lines(df.repartition(parts)).collect()
        assert len(out) == 4
        for r in out:
            got = [part[0] for part in r.geom]
            assert got == expect[r.tile_x], r.tile_x
            # feature_id is the group minimum
            assert r.feature_id == min(f for tx, f, _ in segs if tx == r.tile_x)


def test_merge_lines_rejects_non_linestring(spark):
    rows = [(0, 0, 0, "roads", 3, 1, [[[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 0.0]]]])]
    df = spark.createDataFrame(rows, _SCHEMA)
    with pytest.raises(Exception, match="non-linestring"):
        merge_lines(df).collect()


def test_merge_lines_feeds_simplify_and_encode(spark):
    """Integration: merged chains flow through simplify_geoms ->
    geom_features -> encode_tiles -> decode_tiles and come back as the
    same vertex sequences (collinear interiors removed by DP)."""
    from vectortiles_spark.operators.simplify import simplify_geoms
    from vectortiles_spark.operators.tiling import decode_tiles, encode_tiles, geom_features

    # two chains per tile on an integer lattice; interiors collinear
    segs = []
    fid = 0
    for tx in range(2):
        for chain in range(2):
            y = 10.0 * chain + 2
            for i in range(4):
                segs.append((tx, fid, [(2.0 * i, y), (2.0 * i + 2, y)]))
                fid += 1
    df = spark.createDataFrame(_seg_rows(segs), _SCHEMA)
    merged = merge_lines(df)
    simp = simplify_geoms(merged, tolerance=0.5)
    feats = geom_features(simp)
    tiles = encode_tiles(feats)
    back = decode_tiles(tiles)
    got = {}
    for r in back.collect():
        got.setdefault((r.tile_x, r.feature_id), 0)
        got[(r.tile_x, r.feature_id)] += 1
    # one decoded feature per tile (the merged multilinestring), fid = min
    assert set(got) == {(0, 0), (1, 8)}
    # and the decoded command stream length matches 2 parts x 2 vertices
    # (DP collapses the collinear interiors): MoveTo(1)+1pt, LineTo(1)+1pt
    # per part = 2 * (1 + 2 + 1 + 2) = 12 command-stream integers
    for r in back.collect():
        assert len(r.geom_cmds) == 12, r
