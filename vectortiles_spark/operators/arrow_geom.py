"""Shared Arrow-native unnest for the engine's 4-level geometry columns
(parts x rings x points x [x, y]).

One flatten pass per batch + zero-copy NumPy ring views is ~500x faster
than ``to_pylist`` + per-ring ``np.asarray`` (measured in clip.py's
history); clip, simplify, and geom_features all consume geometry this
way, so the offset walk lives here once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _unwrap(arr):
    """(per-slot lengths, flattened child) for one list level. Empty
    arrays short-circuit WITHOUT calling compute kernels: Spark's Arrow
    stream can ship an empty child with no offsets buffer, and
    value_lengths/flatten on that segfault the worker (pyarrow 16)."""
    if len(arr) == 0:
        return np.zeros(0, dtype=np.int64), pa.array([], type=arr.type.value_type)
    return np.asarray(arr.value_lengths().fill_null(0)), arr.flatten()


def feature_parts(garr, dtype=np.float64, transform=None):
    """Yield, per feature row of the Arrow list column `garr`, its parts
    as ``[[ring_view, ...], ...]`` where every ring view is a zero-copy
    (k, 2) slice of one flattened `dtype` block. Null lists at the
    feature/part/ring levels count as empty; a null or non-pair at the
    innermost POINT level is fatal (raises ValueError for the batch) —
    a malformed point would otherwise silently shear every ring after it. `transform`, when given, maps the whole (n, 2) flat
    block once before slicing (e.g. a batch-level projection) — far
    cheaper than transforming ring by ring."""
    n_parts, parts_arr = _unwrap(garr)
    n_rings, rings_arr = _unwrap(parts_arr)
    n_pts, coords = _unwrap(rings_arr)
    n_coords, values = _unwrap(coords)
    if len(n_coords) and not np.all(n_coords == 2):
        raise ValueError("every geometry point must be an [x, y] pair")
    flat = np.asarray(values, dtype=dtype).reshape(-1, 2)
    if transform is not None:
        flat = transform(flat)
    ring_starts = np.concatenate(([0], np.cumsum(n_pts)))
    pi = ri = 0
    for f in range(len(n_parts)):
        parts = []
        for _ in range(n_parts[f]):
            nr = n_rings[pi]
            pi += 1
            parts.append(
                [
                    flat[ring_starts[ri + r] : ring_starts[ri + r + 1]]
                    for r in range(nr)
                ]
            )
            ri += nr
        yield parts
