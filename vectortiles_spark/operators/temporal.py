"""Temporal join operators Spark lacks natively: as-of join and
binned interval (range) join.

Both are expressed as compositions of built-in DataFrame ops so Catalyst
keeps whole-stage codegen and AQE in play:

* ``asof_join`` — the union+window formulation: tag the two inputs, union
  them, and carry the most recent right-side row forward with
  ``last(..., ignorenulls=True)`` over a key-partitioned, time-ordered
  running window.  ONE shuffle (on the key), no join node at all — the
  classic sort-merge-asof needs a range join Spark doesn't have, and a
  naive ``left.ts >= right.ts`` theta-join is quadratic per key.  At
  100 TB the union+window shape shuffles each input exactly once and
  streams each key group in time order, which is the lower bound for
  this operator.

* ``interval_join`` — points-in-intervals via time binning: each point
  lands in exactly one fixed-width bin, each interval explodes to the
  bins it covers, and the pair survives an equi-join + exact range
  refine.  The equi-join keeps Catalyst in sort-merge/broadcast land
  (never a cartesian), and because a point has exactly one bin a
  matching pair is produced exactly once — no post-join dedup.  Bin
  width trades interval fan-out against bin skew; choose it near the
  typical interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_RTS = "__asof_right_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    tolerance_s: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with
    the greatest ``on`` <= left.``on`` within the same ``by`` group (the
    semantics of pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` with
    ``left.on >= right.on``).  Left rows with no match keep NULLs.

    ``value_cols`` are the right-side columns to carry (renamed with
    ``suffix``); the matched right timestamp is exposed as
    ``f"{on}{suffix}"``.  With ``tolerance_s``, matches older than the
    tolerance (in seconds, measured on the timestamp/epoch axis) are
    nulled out — rows are never dropped.

    The right side must be unique per (by, on); ties there would make
    "the" match ill-defined on any engine.  Pre-aggregate duplicates
    first (e.g. ``right.groupBy(by + [on]).agg(...)``).

    Plan shape: union -> single Exchange on ``by`` -> one running-window
    pass.  Nothing here is a join node; skewed keys degrade to a large
    sorted group, not a blown-up join.
    """
    lcols = left.columns
    out_ts = f"{on}{suffix}"
    out_vals = {c: f"{c}{suffix}" for c in value_cols}
    for named in (out_ts, *out_vals.values()):
        if named in lcols:
            raise ValueError(f"suffixed right column {named!r} collides with left")
    for named in (_TAG, _RTS):
        if named in lcols or named in right.columns:
            raise ValueError(f"column {named!r} is reserved by asof_join")
    # the right ts rides under BOTH names: `on` so one window ordering
    # covers rows from either side, and _RTS as the carried match column
    # (null on left rows, so last(ignorenulls) skips them)
    right_sel = right.select(
        *by,
        F.col(on).alias(on),
        F.col(on).alias(_RTS),
        *[F.col(c).alias(out_vals[c]) for c in value_cols],
        F.lit(0).alias(_TAG),
    )
    # allowMissingColumns null-fills _RTS/value cols on the left side and
    # left-only columns on the right side
    left_sel = left.select(*lcols, F.lit(1).alias(_TAG))
    unioned = left_sel.unionByName(right_sel, allowMissingColumns=True)

    # right rows (tag 0) sort BEFORE left rows at equal timestamps, so an
    # exact-tie right row is visible to the left row (>= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(out_ts, F.last(_RTS, ignorenulls=True).over(w))
    for c in value_cols:
        carried = carried.withColumn(
            out_vals[c], F.last(out_vals[c], ignorenulls=True).over(w)
        )

    res = carried.filter(F.col(_TAG) == 1)
    if tolerance_s is not None:
        # epoch axis: timestamps hop through TIMESTAMP so TIMESTAMP_NTZ
        # inputs keep fractional seconds (sessionize precedent)
        def _ep(c: str) -> Column:
            col = F.col(c)
            if "timestamp" in res.schema[c].dataType.simpleString():
                return col.cast("timestamp").cast("double")
            return col.cast("double")

        # materialize staleness FIRST: the when() below rewrites out_ts,
        # and an unresolved (ts - out_ts) > tol expression would re-resolve
        # against the already-nulled out_ts for every later value column,
        # leaving stale values un-nulled
        stale_c = "__asof_stale"
        res = res.withColumn(stale_c, (_ep(on) - _ep(out_ts)) > float(tolerance_s))
        for oc in [out_ts, *out_vals.values()]:
            res = res.withColumn(
                oc, F.when(F.col(stale_c), F.lit(None)).otherwise(F.col(oc))
            )
    return res.select(*lcols, out_ts, *[out_vals[c] for c in value_cols])


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_s: float,
    by: list[str] | None = None,
) -> DataFrame:
    """Inner join of point rows to every interval row whose half-open
    range ``[start, end)`` contains the point's timestamp (plus optional
    equality keys ``by``).

    Both sides are mapped onto fixed ``bin_s``-second time bins: a point
    has exactly one bin, an interval explodes to every bin it overlaps,
    and the candidate pairs from the bin equi-join are refined with the
    exact range predicate.  Output columns: all point columns, then all
    interval columns (names must not collide).

    Scale: the explode fan-out is ceil(len/bin_s)+1 rows per interval —
    bounded and chosen by the caller; the join itself is a plain
    equi-join on (bin, *by) that Catalyst can broadcast when the
    exploded interval side is small, with AQE handling hot bins.
    """
    by = by or []
    shared = (set(points.columns) & set(intervals.columns)) - set(by)
    if shared:
        raise ValueError(
            f"interval_join: columns {sorted(shared)!r} exist on both sides "
            "(only `by` keys may be shared) — rename before joining"
        )
    for df_, side in ((points, "points"), (intervals, "intervals")):
        if "__bin" in df_.columns:
            raise ValueError(f"interval_join: '__bin' on {side} is reserved")

    def _ep(df: DataFrame, c: str) -> Column:
        col = F.col(c)
        if "timestamp" in df.schema[c].dataType.simpleString():
            return col.cast("timestamp").cast("double")
        return col.cast("double")

    p = points.withColumn("__bin", F.floor(_ep(points, ts_col) / F.lit(bin_s)))
    i = intervals.withColumn(
        "__bins",
        F.sequence(
            F.floor(_ep(intervals, start_col) / F.lit(bin_s)),
            # end is exclusive, but an interval ending exactly on a bin
            # edge still owns that bin's opening instant's predecessors;
            # covering floor(end/bin) is harmless (refine rejects extras)
            F.floor(_ep(intervals, end_col) / F.lit(bin_s)),
        ),
    ).withColumn("__bin", F.explode("__bins")).drop("__bins")

    cond = [p["__bin"] == i["__bin"]]
    for k in by:
        cond.append(p[k] == i[k])
    cond.append(p[ts_col] >= i[start_col])
    cond.append(p[ts_col] < i[end_col])
    joined = p.join(i, cond, "inner")
    out = [p[c] for c in points.columns] + [
        i[c] for c in intervals.columns if c not in by
    ]
    return joined.select(*out)
