"""Linestring merging (dissolve): chain touching polylines into maximal
paths before simplification/encoding.

Real tiling pipelines merge same-class road/boundary segments inside each
tile before generalizing — merged lines simplify better (no artificial
anchors at segment joints) and encode smaller (one MoveTo per chain
instead of per fragment). The reference codec has no opinion on this (it
encodes whatever feature set it is given — lib/Geography/VectorTile.hs);
the operator exists for the engine's vector pipeline between
clip_features and simplify_geoms.

Semantics (the standard GIS line-dissolve contract):

* Nodes are EXACT coordinate matches (inputs are tile-pixel coordinates,
  where exact equality is the intended join rule).
* Chains extend only through degree-2 nodes; junctions (degree >= 3) and
  loose ends break paths. Components that are pure cycles come back as a
  single closed linestring.
* Output is deterministic under any input row order/partitioning: edges
  are processed in sorted-coordinate order, every chain is emitted in its
  lexicographically smaller orientation, cycles are rotated to start at
  their minimum vertex, and parts are sorted.

Scale shape: ONE shuffle on the group key (tile + layer), then pure
per-group chaining whose cost is linear in the group's vertex count —
group size is bounded by tile content exactly like the encode sink's
groups. No driver-side state, no cross-group edges (a chain cannot span
tiles by construction: clipping already cut it at tile borders).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..mvt.geometry import GEOM_LINESTRING


def _merge_group(lines: list[np.ndarray]) -> list[np.ndarray]:
    """Chain a list of (n>=2, 2) float64 polylines into maximal paths.

    Pure function; deterministic in the SET of input lines (sorts its own
    work order). Returns canonical-oriented, sorted parts.
    """
    # deterministic edge order regardless of arrival order
    keyed = sorted(
        range(len(lines)), key=lambda i: tuple(lines[i].ravel().tolist())
    )
    lines = [lines[i] for i in keyed]
    adj: dict[tuple, list[int]] = {}
    for ei, ln in enumerate(lines):
        for node in (tuple(ln[0]), tuple(ln[-1])):
            adj.setdefault(node, []).append(ei)
    used = [False] * len(lines)

    def oriented(ei: int, leave: tuple) -> np.ndarray:
        ln = lines[ei]
        return ln if tuple(ln[0]) == leave else ln[::-1]

    def walk(ei: int, leave: tuple) -> np.ndarray:
        used[ei] = True
        seq = [oriented(ei, leave)]
        # a self-loop's endpoint has this edge listed twice; the loop is
        # already complete, never extended
        while True:
            node = tuple(seq[-1][-1])
            edges = adj[node]
            if len(edges) != 2:
                break
            nxt = [e for e in edges if not used[e]]
            if len(nxt) != 1:
                break
            used[nxt[0]] = True
            seq.append(oriented(nxt[0], node)[1:])
        return np.concatenate(seq)

    chains: list[np.ndarray] = []
    for node in sorted(adj):
        if len(adj[node]) == 2:
            continue
        for ei in sorted(
            (e for e in adj[node] if not used[e]),
            key=lambda e: tuple(oriented(e, node).ravel().tolist()),
        ):
            if not used[ei]:
                chains.append(walk(ei, node))
    for ei in range(len(lines)):  # leftovers are pure cycles
        if not used[ei]:
            chains.append(walk(ei, tuple(lines[ei][0])))

    out = []
    for c in chains:
        if tuple(c[0]) == tuple(c[-1]) and len(c) > 2:
            # cycle: rotate the duplicated joint to the minimum vertex
            body = c[:-1]
            k = min(range(len(body)), key=lambda i: tuple(body[i]))
            c = np.concatenate([body[k:], body[:k], body[k : k + 1]])
        fwd, rev = tuple(c.ravel().tolist()), tuple(c[::-1].ravel().tolist())
        out.append(c if fwd <= rev else c[::-1])
    out.sort(key=lambda c: tuple(c.ravel().tolist()))
    return out


def merge_lines(
    df: DataFrame,
    group_cols: tuple = ("tile_z", "tile_x", "tile_y", "layer"),
    geom_col: str = "geom",
    geom_type_col: str = "geom_type",
    feature_id_col: str = "feature_id",
) -> DataFrame:
    """Merge every group's linestring fragments into maximal chains: one
    output row per group, ``feature_id = min`` over the group's inputs,
    ``geom`` = the canonical sorted parts (a multilinestring feature ready
    for simplify_geoms / encode_tiles). All rows must be linestrings —
    a non-linestring geom_type in a group raises, matching the codec's
    loud-rejection posture."""
    cols = [*group_cols, feature_id_col, geom_type_col, geom_col]
    src = df.select(*cols)
    schema = src.schema

    def fn(key, pdf):
        bad = set(pdf[geom_type_col]) - {GEOM_LINESTRING}
        if bad:
            raise ValueError(f"merge_lines got non-linestring geom_type {bad}")
        lines = []
        for parts in pdf[geom_col]:
            for part in parts:
                for ring in part:
                    arr = np.asarray([list(p) for p in ring], dtype=np.float64)
                    if len(arr) >= 2:
                        lines.append(arr)
        merged = _merge_group(lines)
        geom = [[c.tolist()] for c in merged]  # part = [single line]
        return pd.DataFrame(
            {
                **{g: [key[i]] for i, g in enumerate(group_cols)},
                feature_id_col: [pdf[feature_id_col].min()],
                geom_type_col: [GEOM_LINESTRING],
                geom_col: [geom],
            }
        )

    return src.groupBy(*group_cols).applyInPandas(fn, schema)
