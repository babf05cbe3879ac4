"""Whole-layer vectorized MVT decode kernels.

The scalar decode path (codec._parse_feature + geometry.geom_from_stream)
walks features one at a time; on a many-feature tile the per-feature NumPy
dispatch overhead dominates (measured ~63 ms for the reference's roads.mvt
vs the reference's 9.98 ms, bench/results.txt:22-26). These kernels process
EVERY feature of a layer in a fixed number of vectorized rounds:

* ``varints_at``       — decode one varint at each of N positions at once
                         (round r reads byte r of every unfinished lane);
* ``parse_features_batch`` — frontier walk over all feature messages: one
                         round per protobuf field, so a 4-field feature
                         costs 4 vectorized rounds regardless of count;
* ``assemble_geoms``   — command-table parse (one round per command slot)
                         + segmented cumsum cursor expansion + reduceat
                         shoelace ring classification.

Any lane that deviates from well-formed input (truncated varint, span
overrun, unknown wire type, repeated packed chunk, malformed command
sequence) is handed to the scalar twin for that single feature, so error
messages and lenient-truncation quirks stay byte-identical with the scalar
path — the differential tests in tests/test_fastdecode.py pin this.

Semantics contract: fosskers/vectortiles decode
(lib/Geography/VectorTile/Protobuf/Internal.hs:96-213); see codec.py and
geometry.py for the per-function file:line citations.
"""

from __future__ import annotations

import numpy as np

from . import wire
from .geometry import (
    CMD_CLOSEPATH,
    CMD_LINETO,
    CMD_MOVETO,
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    geom_from_stream,
    unzig,
)

_U7 = np.uint64(7)
_U0x7F = np.uint64(0x7F)


def varints_at(
    b: np.ndarray, pos: np.ndarray, limit: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one varint starting at each ``pos[i]``, bounded by
    ``limit[i]`` (exclusive). Returns ``(values u64, next_pos i64, ok)``.

    A lane whose varint crosses its limit or runs past 10 bytes gets
    ok=False (the scalar path raises there; the caller routes such lanes
    to the scalar twin so the exception is identical). Values wrap mod
    2^64 exactly like wire.read_varint.
    """
    n = pos.size
    # fast path: every lane in bounds and single-byte (the overwhelmingly
    # common case for field tags and small lengths)
    if n and int(pos.max()) < b.size:
        first = b[pos]
        if (first < 128).all() and bool((pos < limit).all()):
            return first.astype(np.uint64), pos + 1, np.ones(n, dtype=bool)
    val = np.zeros(n, dtype=np.uint64)
    cur = pos.astype(np.int64).copy()
    done = np.zeros(n, dtype=bool)
    ok = np.ones(n, dtype=bool)
    for k in range(10):
        active = ~done & ok
        if not active.any():
            break
        oob = active & (cur >= limit)
        ok[oob] = False
        active &= ~oob
        ia = np.flatnonzero(active)
        if ia.size == 0:
            break
        byte = b[cur[ia]].astype(np.uint64)
        val[ia] |= (byte & _U0x7F) << np.uint64(7 * k)
        fin = (byte & np.uint64(0x80)) == 0
        done[ia[fin]] = True
        cur[ia[~fin]] += 1
    ok &= done  # >10-byte varint: scalar raises "varint too long"
    return val, cur + 1, ok


class BatchFeatures:
    """Columnar result of parse_features_batch (one layer's features)."""

    __slots__ = ("ids", "types", "tag_vals", "tag_cnt", "geom_vals", "geom_cnt", "irregular")

    def __init__(self, ids, types, tag_vals, tag_cnt, geom_vals, geom_cnt, irregular):
        self.ids = ids            # uint64 (n,)
        self.types = types        # uint64 (n,)
        self.tag_vals = tag_vals  # uint32 concatenated packed tag values
        self.tag_cnt = tag_cnt    # int64 (n,) varints per feature
        self.geom_vals = geom_vals  # uint32 concatenated command streams
        self.geom_cnt = geom_cnt    # int64 (n,)
        self.irregular = irregular  # bool (n,) -> caller uses scalar parser


def _scan_spans(gathered: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-span varint counts over a gathered (concatenated) buffer, plus a
    bad-span mask: a span that ends mid-varint (its bytes would silently
    merge into the next span's) or contains a >10-byte varint. Bad spans
    must be re-routed to the scalar path, which raises there."""
    counts = np.zeros(lens.size, dtype=np.int64)
    bad = np.zeros(lens.size, dtype=bool)
    if gathered.size == 0:
        return counts, bad
    is_end = (gathered & 0x80) == 0
    span_end = np.cumsum(lens)
    nonempty = lens > 0
    bad[nonempty] = ~is_end[span_end[nonempty] - 1]
    ends = np.flatnonzero(is_end)
    if ends.size:
        vlen = np.diff(np.concatenate(([-1], ends)))
        long = ends[vlen > 10]
        if long.size:
            bad[np.searchsorted(span_end, long, side="right")] = True
    cum = np.concatenate(([0], np.cumsum(is_end)))
    counts = cum[span_end] - cum[span_end - lens]
    return counts, bad


def _gather_packed(
    b: np.ndarray, starts: np.ndarray, lens: np.ndarray, irregular: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Gather per-lane packed spans and decode all varints at once,
    marking lanes with malformed spans irregular (zeroed out of the gather
    so a second pass is clean). Returns (values u32, per-lane counts)."""
    lens = lens.copy()
    lens[irregular] = 0
    for _ in range(2):
        buf = wire.ragged_gather(b, np.maximum(starts, 0), lens)
        counts, bad = _scan_spans(buf, lens)
        if not bad.any():
            break
        irregular[bad] = True
        lens[bad] = 0
    vals = (
        wire.decode_varints(buf).astype(np.uint32)
        if buf.size
        else np.zeros(0, dtype=np.uint32)
    )
    return vals, counts


def parse_features_batch(b: np.ndarray, fstart: np.ndarray, flen: np.ndarray) -> BatchFeatures:
    """Wire-parse every feature message of a layer in parallel.

    ``b`` is the layer buffer (uint8), ``fstart``/``flen`` the feature
    message spans found by the layer walk. One frontier round per field:
    all lanes read their current field tag together, then each wire-type
    cohort advances together.
    """
    n = fstart.size
    pos = fstart.astype(np.int64).copy()
    end = (fstart + flen).astype(np.int64)
    fid = np.zeros(n, dtype=np.uint64)
    # uint64 like the wire value: a (nonsense but legal) type varint >= 2^63
    # must stay positive so the batch RawFeature equals the scalar one
    ftype = np.zeros(n, dtype=np.uint64)
    tag_s = np.full(n, -1, dtype=np.int64)
    tag_l = np.zeros(n, dtype=np.int64)
    geo_s = np.full(n, -1, dtype=np.int64)
    geo_l = np.zeros(n, dtype=np.int64)
    irregular = np.zeros(n, dtype=bool)

    while True:
        active = (pos < end) & ~irregular
        ia = np.flatnonzero(active)
        if ia.size == 0:
            break
        key, p2, ok = varints_at(b, pos[ia], end[ia])
        irregular[ia[~ok]] = True
        ia, key, p2 = ia[ok], key[ok], p2[ok]
        fnum = (key >> np.uint64(3)).astype(np.int64)
        wt = (key & _U7).astype(np.int64)
        newpos = np.full(ia.size, -1, dtype=np.int64)

        m = wt == wire.WT_VARINT
        if m.any():
            sub = np.flatnonzero(m)
            # a packed-capable field (tags/geometry) in UNPACKED varint form
            # is legal protobuf but rare — scalar path appends per value;
            # defer those lanes to it rather than model accumulation here
            fs = fnum[sub]
            unpacked = (fs == 2) | (fs == 4)
            irregular[ia[sub[unpacked]]] = True
            sub = sub[~unpacked]
            v, p3, ok2 = varints_at(b, p2[sub], end[ia[sub]])
            irregular[ia[sub[~ok2]]] = True
            good = sub[ok2]
            newpos[good] = p3[ok2]
            lanes, vals, f = ia[good], v[ok2], fnum[good]
            idm = f == 1
            fid[lanes[idm]] = vals[idm]
            tym = f == 3
            ftype[lanes[tym]] = vals[tym]

        m = wt == wire.WT_LEN
        if m.any():
            sub = np.flatnonzero(m)
            length, p3, ok2 = varints_at(b, p2[sub], end[ia[sub]])
            irregular[ia[sub[~ok2]]] = True
            good = sub[ok2]
            ln = length[ok2].astype(np.int64)
            start = p3[ok2]
            lanes = ia[good]
            # span overrunning the feature message: the scalar path slices
            # leniently (memoryview truncation) — keep that quirk scalar-side
            over = start + ln > end[lanes]
            irregular[lanes[over]] = True
            keep = ~over
            lanes, ln, start, f = lanes[keep], ln[keep], start[keep], fnum[good][keep]
            for field_num, s_arr, l_arr in ((2, tag_s, tag_l), (4, geo_s, geo_l)):
                fm = f == field_num
                lf = lanes[fm]
                rep = s_arr[lf] >= 0  # second packed chunk -> scalar concat path
                irregular[lf[rep]] = True
                s_arr[lf[~rep]] = start[fm][~rep]
                l_arr[lf[~rep]] = ln[fm][~rep]
            newpos[good[keep]] = start + ln

        m = wt == wire.WT_FIXED64
        newpos[m] = p2[m] + 8
        m = wt == wire.WT_FIXED32
        newpos[m] = p2[m] + 4
        # scalar _parse_feature routes fnum 2/4 of ANY wire type through
        # _parse_packed_u32 (which reads a varint for non-LEN) — don't
        # model that quirk here, defer those lanes to the scalar twin
        m = ((wt == wire.WT_FIXED64) | (wt == wire.WT_FIXED32)) & ((fnum == 2) | (fnum == 4))
        irregular[ia[m]] = True
        m = (
            (wt != wire.WT_VARINT)
            & (wt != wire.WT_FIXED64)
            & (wt != wire.WT_LEN)
            & (wt != wire.WT_FIXED32)
        )
        irregular[ia[m]] = True  # scalar skip_field raises on these

        valid = newpos >= 0
        pos[ia[valid]] = newpos[valid]

    # gather until the irregular set is stable: a bad span found in one
    # gather zeroes that lane out of BOTH value buffers, keeping per-lane
    # offsets (cumsum of counts) aligned with the concatenated values
    while True:
        n_irr = int(irregular.sum())
        geom_vals, geom_cnt = _gather_packed(b, geo_s, geo_l, irregular)
        tag_vals, tag_cnt = _gather_packed(b, tag_s, tag_l, irregular)
        if int(irregular.sum()) == n_irr:
            break
    return BatchFeatures(fid, ftype, tag_vals, tag_cnt, geom_vals, geom_cnt, irregular)


# ---------------- batch geometry assembly ----------------


def _parse_command_table(vals: np.ndarray, cnt: np.ndarray):
    """Parse every feature's command stream into a flat command table.

    Returns (feat, cid, ccount, pstart, ptake, bad) where row r describes
    one command: owning feature, command id, declared count, param start
    offset in ``vals``, and params actually present (min(2*count, rest) —
    the scalar commands() clipping). Rows are grouped per feature in
    stream order. ``bad`` marks features whose stream has an illegal
    command int (scalar parse_cmd raises there).
    """
    n = cnt.size
    fstart = np.cumsum(cnt) - cnt
    fend = fstart + cnt
    pos = fstart.astype(np.int64).copy()
    bad = np.zeros(n, dtype=bool)
    r_feat, r_cid, r_cc, r_ps, r_pt = [], [], [], [], []
    # frontier rounds pay off while MANY lanes advance together; once only a
    # few long-tail lanes remain (one multipolygon with thousands of rings),
    # one vectorized round per command is pure overhead — finish those lanes
    # with a plain-int Python scan over their own stream instead
    tail_cutoff = max(4, n // 64)
    t_rows: list[tuple[int, int, int, int, int]] = []
    while True:
        active = (pos < fend) & ~bad
        ia = np.flatnonzero(active)
        if ia.size == 0:
            break
        if ia.size <= tail_cutoff:
            append = t_rows.append
            for i in ia.tolist():
                p = int(pos[i])
                e = int(fend[i])
                sl = vals[p:e].tolist()
                q, rest = 0, e - p
                while q < rest:
                    cmd = sl[q]
                    cidv = cmd & 7
                    if cidv == CMD_CLOSEPATH:
                        ccv = cmd >> 3
                        if ccv != 1:
                            bad[i] = True
                            break
                        take = 0
                    elif cidv == CMD_MOVETO or cidv == CMD_LINETO:
                        ccv = cmd >> 3
                        take = 2 * ccv
                        rem = rest - q - 1
                        if take > rem:
                            take = rem
                    else:
                        bad[i] = True
                        break
                    append((i, cidv, ccv, p + q + 1, take))
                    q += 1 + take
            break
        cmd = vals[pos[ia]].astype(np.int64)
        cid = cmd & 7
        cc = cmd >> 3
        okc = (cid == CMD_MOVETO) | (cid == CMD_LINETO) | ((cid == CMD_CLOSEPATH) & (cc == 1))
        bad[ia[~okc]] = True
        ia, cid, cc = ia[okc], cid[okc], cc[okc]
        ps = pos[ia] + 1
        want = np.where(cid == CMD_CLOSEPATH, 0, 2 * cc)
        take = np.minimum(want, fend[ia] - ps)
        r_feat.append(ia)
        r_cid.append(cid)
        r_cc.append(cc)
        r_ps.append(ps)
        r_pt.append(take)
        pos[ia] = ps + take
    if t_rows:
        t_arr = np.asarray(t_rows, dtype=np.int64)
        r_feat.append(t_arr[:, 0])
        r_cid.append(t_arr[:, 1])
        r_cc.append(t_arr[:, 2])
        r_ps.append(t_arr[:, 3])
        r_pt.append(t_arr[:, 4])
    if not r_feat:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z, z, bad
    # tail rows were appended LAST, and each lane's frontier rows precede its
    # tail rows in stream order — a stable sort by feature keeps that order
    feat = np.concatenate(r_feat)
    order = np.argsort(feat, kind="stable")
    return (
        feat[order],
        np.concatenate(r_cid)[order],
        np.concatenate(r_cc)[order],
        np.concatenate(r_ps)[order],
        np.concatenate(r_pt)[order],
        bad,
    )


def _seg_cumsum(d: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Per-segment cumsum over rows of a (M, 2) array, vectorized."""
    if d.shape[0] == 0:
        return d
    c = np.cumsum(d, axis=0)
    starts = np.cumsum(seg_lens) - seg_lens
    base = np.zeros((seg_lens.size, d.shape[1]), dtype=c.dtype)
    nz = seg_lens > 0
    first_nz = np.flatnonzero(nz)
    if first_nz.size:
        later = first_nz[starts[first_nz] > 0]
        base[later] = c[starts[later] - 1]
    return c - np.repeat(base, seg_lens, axis=0)


def _feat_mask(n: int, feats: np.ndarray) -> np.ndarray:
    """Membership lookup table over feature indices (faster than np.isin
    for the dense small-int domain a layer's feature ids live in)."""
    lut = np.zeros(n, dtype=bool)
    lut[feats] = True
    return lut


def assemble_geoms(
    types: np.ndarray, vals: np.ndarray, cnt: np.ndarray, defer_fallback: bool = False
) -> list:
    """Decode every feature's geometry at once. Returns a list of geometry
    objects in geometry.py's representations (same objects geom_from_stream
    yields). Features whose streams deviate from the canonical shapes the
    batch path models are delegated to scalar geom_from_stream, which
    raises (or handles) exactly like the per-feature path.

    ``defer_fallback=True`` leaves deviating lanes as ``None`` instead of
    running the scalar twin here, so a caller that interleaves OTHER
    per-feature work (metadata decoding, which can raise too) can invoke
    the scalar twin at each feature's turn and preserve the sequential
    path's exact first-error ordering. ``None`` is unambiguous — no real
    geometry decodes to it (an empty multiline/polygon is ``[]``).
    """
    n = types.size
    out: list = [None] * n
    feat, cid, cc, ps, pt, badf = _parse_command_table(vals, cnt)
    ncmds = np.bincount(feat, minlength=n)
    fallback = badf.copy()
    fallback |= (types != GEOM_POINT) & (types != GEOM_LINESTRING) & (types != GEOM_POLYGON)

    # command-table row ranges per feature
    row_start = np.cumsum(ncmds) - ncmds

    params = unzig(vals) if vals.size else np.zeros(0, dtype=np.int64)

    # ---- points: exactly one MoveTo with >=1 decoded pair ----
    is_pt = (types == GEOM_POINT) & ~fallback
    pt_feats = np.flatnonzero(is_pt)
    if pt_feats.size:
        # clamp the row index: a 0-command feature's row_start may point
        # past the table; the ncmds==1 term already rejects such lanes
        r = np.minimum(row_start[pt_feats], max(cid.size - 1, 0))
        good = ncmds[pt_feats] == 1
        if cid.size:
            good &= (cid[r] == CMD_MOVETO) & (pt[r] >= 2)
        else:
            good[:] = False
        fallback[pt_feats[~good]] = True
        pf = pt_feats[good]
        if pf.size:
            r = row_start[pf]
            take2 = (pt[r] // 2) * 2  # odd trailing param dropped (pairsWith)
            d = wire.ragged_gather(params, ps[r], take2).reshape(-1, 2)
            k = take2 // 2
            pts = _seg_cumsum(d, k)
            offs = np.cumsum(k) - k
            for j, fi in enumerate(pf):
                out[fi] = pts[offs[j]:offs[j] + k[j]]

    # ---- linestrings: (MoveTo, LineTo) pairs, cursor carries per feature ----
    is_ls = (types == GEOM_LINESTRING) & ~fallback
    ls_feats = np.flatnonzero(is_ls)
    if ls_feats.size:
        # validate structure feature-wise on the command table
        valid = np.ones(ls_feats.size, dtype=bool)
        valid &= ncmds[ls_feats] % 2 == 0
        rows = np.flatnonzero(_feat_mask(n, ls_feats[valid])[feat])
        if rows.size:
            slot = rows - np.repeat(row_start[ls_feats[valid]], ncmds[ls_feats[valid]])
            even = slot % 2 == 0
            rok = np.where(
                even,
                (cid[rows] == CMD_MOVETO) & (pt[rows] >= 2),
                (cid[rows] == CMD_LINETO) & (pt[rows] >= 2),
            )
            # per-feature AND over rows
            badrows = rows[~rok]
            if badrows.size:
                valid &= ~_feat_mask(n, feat[badrows])[ls_feats]
        fallback[ls_feats[~valid]] = True
        lf = ls_feats[valid]
        if lf.size:
            # parts: MoveTo row m (first pair only, Internal.hs:169) then
            # LineTo row m+1 (odd trailing param dropped)
            tbl_rows = np.flatnonzero(_feat_mask(n, lf)[feat])
            mv = tbl_rows[0::2] if tbl_rows.size else tbl_rows
            ln = tbl_rows[1::2] if tbl_rows.size else tbl_rows
            take_ln = (pt[ln] // 2) * 2
            starts = np.empty(mv.size * 2, dtype=np.int64)
            lens = np.empty(mv.size * 2, dtype=np.int64)
            starts[0::2] = ps[mv]
            lens[0::2] = 2
            starts[1::2] = ps[ln]
            lens[1::2] = take_ln
            d = wire.ragged_gather(params, starts, lens).reshape(-1, 2)
            part_pts = 1 + take_ln // 2
            nparts = (ncmds[lf] // 2).astype(np.int64)
            # points per feature = sum of its parts' points
            pend = np.cumsum(nparts)
            pstart_f = pend - nparts
            part_cum = np.concatenate(([0], np.cumsum(part_pts)))
            feat_pts = part_cum[pend] - part_cum[pstart_f]
            pts = _seg_cumsum(d, feat_pts)
            p_off = part_cum[:-1]
            for j, fi in enumerate(lf):
                parts = [
                    pts[p_off[p]:p_off[p] + part_pts[p]]
                    for p in range(pstart_f[j], pend[j])
                ]
                out[fi] = parts

    # ---- polygons: (MoveTo, LineTo>=2pts, ClosePath) triples ----
    is_pg = (types == GEOM_POLYGON) & ~fallback
    pg_feats = np.flatnonzero(is_pg)
    if pg_feats.size:
        valid = ncmds[pg_feats] % 3 == 0
        rows = np.flatnonzero(_feat_mask(n, pg_feats[valid])[feat])
        if rows.size:
            slot = rows - np.repeat(row_start[pg_feats[valid]], ncmds[pg_feats[valid]])
            phase = slot % 3
            rok = np.where(
                phase == 0,
                (cid[rows] == CMD_MOVETO) & (pt[rows] >= 2),
                np.where(
                    phase == 1,
                    (cid[rows] == CMD_LINETO) & (pt[rows] >= 4),
                    cid[rows] == CMD_CLOSEPATH,
                ),
            )
            badrows = rows[~rok]
            if badrows.size:
                valid &= ~_feat_mask(n, feat[badrows])[pg_feats]
        fallback[pg_feats[~valid]] = True
        gf = pg_feats[valid]
        if gf.size:
            tbl_rows = np.flatnonzero(_feat_mask(n, gf)[feat])
            mv = tbl_rows[0::3]
            ln = tbl_rows[1::3]
            take_ln = (pt[ln] // 2) * 2
            starts = np.empty(mv.size * 2, dtype=np.int64)
            lens = np.empty(mv.size * 2, dtype=np.int64)
            starts[0::2] = ps[mv]
            lens[0::2] = 2
            starts[1::2] = ps[ln]
            lens[1::2] = take_ln
            d = wire.ragged_gather(params, starts, lens).reshape(-1, 2)
            ring_pts = 1 + take_ln // 2  # open ring point count
            nrings = (ncmds[gf] // 3).astype(np.int64)
            rend = np.cumsum(nrings)
            rstart_f = rend - nrings
            ring_cum = np.concatenate(([0], np.cumsum(ring_pts)))
            feat_pts = ring_cum[rend] - ring_cum[rstart_f]
            pts = _seg_cumsum(d, feat_pts)  # cursor carries across rings per feature
            R = ring_pts.size
            M = pts.shape[0]
            r_off = ring_cum[:-1]
            # vectorized re-close: scatter open points into a buffer with one
            # extra slot per ring, closing slot = ring's first point
            ring_of = np.repeat(np.arange(R), ring_pts)
            dest = np.arange(M) + ring_of
            closed = np.empty((M + R, 2), dtype=pts.dtype)
            closed[dest] = pts
            c_start = r_off + np.arange(R)
            closed[c_start + ring_pts] = pts[r_off]
            # shoelace over OPEN rings: the wrapped next/prev differences are
            # built in one vectorized pass; the final per-ring reduction uses
            # np.dot on contiguous slices so the float summation order is
            # BIT-IDENTICAL to scalar surveyor() (reduceat's sequential sum
            # could flip the sign of a near-zero area and regroup rings)
            x = pts[:, 0].astype(np.float64)
            y = pts[:, 1].astype(np.float64)
            inext = np.arange(M) + 1
            inext[r_off + ring_pts - 1] = r_off
            iprev = np.arange(M) - 1
            iprev[r_off] = r_off + ring_pts - 1
            dy = y[inext] - y[iprev]
            for j, fi in enumerate(gf):
                polys: list[list[np.ndarray]] = []
                for rg in range(rstart_f[j], rend[j]):
                    ring = closed[c_start[rg]:c_start[rg] + ring_pts[rg] + 1]
                    a, b_ = r_off[rg], r_off[rg] + ring_pts[rg]
                    if not polys or float(np.dot(x[a:b_], dy[a:b_]) / 2.0) > 0:
                        polys.append([ring])
                    else:
                        polys[-1].append(ring)
                out[fi] = polys

    # empty streams: scalar returns [] for line/polygon, raises for points
    empty = (cnt == 0) & ~fallback
    for fi in np.flatnonzero(empty & ((types == GEOM_LINESTRING) | (types == GEOM_POLYGON))):
        out[fi] = []
    fallback |= empty & (types == GEOM_POINT)

    # scalar twin for every deviating lane, in feature order so the first
    # malformed feature raises exactly like the sequential path (unless the
    # caller asked to run the twin itself at each feature's turn)
    if fallback.any() and not defer_fallback:
        offs = np.cumsum(cnt) - cnt
        for fi in np.flatnonzero(fallback):
            out[fi] = geom_from_stream(int(types[fi]), vals[offs[fi]:offs[fi] + cnt[fi]])
    return out


def canonical_stream_mask(types: np.ndarray, vals: np.ndarray, cnt: np.ndarray) -> np.ndarray:
    """Per-feature bool: the stream is already in the canonical encoder
    form, i.e. geom_to_stream(geom_from_stream(s)) == s byte-for-byte.

    zig/unzig and parse_cmd/unparse_cmd are exact inverses on uint32, so
    canonicality is purely STRUCTURAL: one MoveTo with every declared pair
    present (points); strict (MoveTo c=1, LineTo c>=1 full) pairs
    (linestrings); strict (MoveTo c=1, LineTo c>=2 full, ClosePath)
    triples (polygons). The distributed ingest path copies canonical
    streams through without building geometry objects at all; the rest
    take the scalar decode+re-encode detour (which also raises on invalid
    input exactly like the per-feature path).
    """
    n = types.size
    feat, cid, cc, ps, pt, badf = _parse_command_table(vals, cnt)
    ncmds = np.bincount(feat, minlength=n)
    ok = ~badf
    full = pt == 2 * cc  # every declared pair present in the buffer

    is_pt = types == GEOM_POINT
    row0 = np.minimum(np.cumsum(ncmds) - ncmds, max(cid.size - 1, 0))
    if cid.size:
        pt_ok = (ncmds == 1) & (cid[row0] == CMD_MOVETO) & (cc[row0] >= 1) & full[row0]
    else:
        pt_ok = np.zeros(n, dtype=bool)
    ok &= ~is_pt | pt_ok

    for gtype, period in ((GEOM_LINESTRING, 2), (GEOM_POLYGON, 3)):
        is_g = types == gtype
        ok &= ~is_g | (ncmds % period == 0)
        gfe = np.flatnonzero(is_g & ok)
        rows = np.flatnonzero(_feat_mask(n, gfe)[feat])
        if not rows.size:
            continue
        slot = rows - np.repeat(row0[gfe], ncmds[gfe])
        phase = slot % period
        min_line = 1 if gtype == GEOM_LINESTRING else 2
        rok = np.where(
            phase == 0,
            (cid[rows] == CMD_MOVETO) & (cc[rows] == 1) & full[rows],
            (cid[rows] == CMD_LINETO) & (cc[rows] >= min_line) & full[rows],
        )
        if period == 3:
            third = phase == 2
            rok[third] = cid[rows[third]] == CMD_CLOSEPATH
        badrows = rows[~rok]
        if badrows.size:
            ok &= ~_feat_mask(n, feat[badrows])
    ok &= (types == GEOM_POINT) | (types == GEOM_LINESTRING) | (types == GEOM_POLYGON)
    return ok
