"""Shared Arrow-native unnest for the engine's 4-level geometry columns
(parts x rings x points x [x, y]).

One flatten pass per batch + zero-copy NumPy ring views is ~500x faster
than ``to_pylist`` + per-ring ``np.asarray`` (measured in clip.py's
history); clip, simplify, and geom_features all consume geometry this
way, so the offset walk lives here once.
"""

from __future__ import annotations

import numpy as np


def feature_parts(garr, dtype=np.float64, transform=None):
    """Yield, per feature row of the Arrow list column `garr`, its parts
    as ``[[ring_view, ...], ...]`` where every ring view is a zero-copy
    (k, 2) slice of one flattened `dtype` block. Null lists at any level
    count as empty. Raises when any innermost point is not an
    [x, y] pair — a malformed row would otherwise silently shear every
    ring after it. `transform`, when given, maps the whole (n, 2) flat
    block once before slicing (e.g. a batch-level projection) — far
    cheaper than transforming ring by ring."""
    n_parts = np.asarray(garr.value_lengths().fill_null(0))
    parts_arr = garr.flatten()
    n_rings = np.asarray(parts_arr.value_lengths().fill_null(0))
    rings_arr = parts_arr.flatten()
    n_pts = np.asarray(rings_arr.value_lengths().fill_null(0))
    coords = rings_arr.flatten()
    n_coords = np.asarray(coords.value_lengths().fill_null(0))
    if len(n_coords) and not np.all(n_coords == 2):
        raise ValueError("every geometry point must be an [x, y] pair")
    flat = np.asarray(coords.flatten(), dtype=dtype).reshape(-1, 2)
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
