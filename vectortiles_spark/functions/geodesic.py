"""Geodesic (sphere-aware) distance algebra.

Everything spatial elsewhere in the engine is planar or lattice-exact;
this module adds real-world metric distance on the sphere as pure Column
expressions (JVM whole-stage codegen — no UDFs) with textual SQL twins
spelled in the SAME IEEE-754 operation order, so a DuckDB oracle computing
the twin lands within ~2 ulp of the Spark value (the only non-correctly-
rounded ops are sin/cos/asin; +,*,/,sqrt are exact per IEEE).

The haversine formula is used verbatim (not Vincenty): at 100 TB the
distance column feeds radius predicates and rank orderings, where the
sphere model's ~0.3% ellipsoid error is irrelevant but branch-free
vectorizable arithmetic is not.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mean Earth radius in meters (IUGG R1); shared by Column, SQL, and NumPy
#: twins so all three agree bit-for-bit on the leading multiply.
EARTH_RADIUS_M = 6371008.8

#: Meters per degree of latitude on that sphere (R * pi / 180).
M_PER_DEG_LAT = EARTH_RADIUS_M * np.pi / 180.0


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters between two (lon, lat) points.

    2R * asin(sqrt(sin^2(dphi/2) + cos(phi1) cos(phi2) sin^2(dlambda/2))).
    The sum under the sqrt is clamped to <= 1.0 so antipodal rounding
    noise can't push asin's argument out of domain (NaN)."""
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi2 = (F.radians(lat2) - F.radians(lat1)) / F.lit(2.0)
    dlam2 = (F.radians(lon2) - F.radians(lon1)) / F.lit(2.0)
    sp, sl = F.sin(dphi2), F.sin(dlam2)
    a = sp * sp + F.cos(phi1) * F.cos(phi2) * (sl * sl)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """DuckDB twin of :func:`haversine_m` — identical operation order."""
    p1, p2 = f"radians({lat1})", f"radians({lat2})"
    sp = f"sin((radians({lat2}) - radians({lat1})) / 2.0)"
    sl = f"sin((radians({lon2}) - radians({lon1})) / 2.0)"
    a = f"({sp} * {sp} + cos({p1}) * cos({p2}) * ({sl} * {sl}))"
    return f"(2.0 * {EARTH_RADIUS_M!r} * asin(sqrt(least({a}, 1.0))))"


def haversine_np(lon1, lat1, lon2, lat2) -> np.ndarray:
    """NumPy twin (tests / brute-force oracles), same operation order."""
    lon1, lat1 = np.asarray(lon1, float), np.asarray(lat1, float)
    lon2, lat2 = np.asarray(lon2, float), np.asarray(lat2, float)
    p1, p2 = np.radians(lat1), np.radians(lat2)
    sp = np.sin((np.radians(lat2) - np.radians(lat1)) / 2.0)
    sl = np.sin((np.radians(lon2) - np.radians(lon1)) / 2.0)
    a = sp * sp + np.cos(p1) * np.cos(p2) * (sl * sl)
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(a, 1.0)))
