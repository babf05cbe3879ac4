"""Overzoom: derive z+k child tiles from parent tile BLOBS.

A tile server rarely stores every zoom — it stores a max-zoom tile set
and derives deeper levels on demand by scaling the parent's geometry
into each child's frame (tippecanoe/tileserver-gl behavior). The same
operation backs pyramid *repair* (regenerate one damaged zoom from the
level above) and serving overview tiles from a partially-built pyramid.
Unlike ``build_pyramid`` (tiling.py), which needs the ORIGINAL feature
relation, overzoom needs only the finished blobs.

Precision contract: a child derived from a parent carries the PARENT's
coordinate resolution scaled by 2^levels (child coordinates are even
multiples at levels=1) — the standard overzoom trade: it can never
recover sub-parent-pixel detail a direct build at z+k would have. The
q_overzoom oracle replays exactly this doubling arithmetic in SQL.

Scale shape: children of a parent are computed FROM that parent alone,
so the distributed operator is a single mapInArrow with ZERO shuffle —
each task turns its parent rows into 4^levels-way child rows in place.
Contrast: rebuilding z+k from source features pays a full feature
shuffle into the encode; overzoom pays a decode + clip + encode per
parent, all executor-local.

Geometry semantics reuse the tiler's clip kernels (operators/clip.py):
Liang-Barsky polyline clip, exact multi-piece polygon clip with hole
regrouping, the same integer localization/rounding and the same
edge-ownership rule (a child's high edge belongs to the next child,
except on the parent's own east/south edge). Reference semantic
contract for the decode/encode halves: vectortiles Internal.hs
(rings closed, pts->lines->polys layer order) — see mvt/codec.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..mvt import codec, wire
from ..mvt.geometry import (
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    geom_to_stream,
)
from .clip import _localize_line, _localize_ring, clip_polygon_exact, clip_polyline
from .tiling import TILE_SCHEMA


def _child_range(lo: float, hi: float, extent: int, s: int, buffer_px: int):
    """Clamped inclusive child-index interval covered by [lo, hi]."""
    a = int(np.floor((lo - buffer_px) / extent))
    b = int(np.floor((hi + buffer_px) / extent))
    return max(0, min(s - 1, a)), max(0, min(s - 1, b))


def overzoom_blob(
    data: bytes, levels: int = 1, buffer_px: int = 0
) -> list[tuple[int, int, bytes, int, int]]:
    """One parent blob -> [(dx, dy, child_blob, n_features, n_layers)] for
    every non-empty child in the 2^levels x 2^levels grid. Rejects the
    same malformed inputs decode_tile rejects.

    Dispatches to the batched kernel (_overzoom_rows) — byte-identical to
    the scalar twin below (differential-pinned in tests/test_overzoom.py),
    ~10x faster on dense point tiles."""
    out = []
    z, xs, ys, ms, nfs, nls = _overzoom_rows(
        [(0, 0, 0, data)], levels=levels, buffer_px=buffer_px
    )
    for x2, y2, blob, nf, nl in zip(xs, ys, ms, nfs, nls):
        out.append((x2, y2, blob, nf, nl))
    return out


def overzoom_blob_scalar(
    data: bytes, levels: int = 1, buffer_px: int = 0
) -> list[tuple[int, int, bytes, int, int]]:
    """Reference twin of overzoom_blob: plain per-feature object path
    through decode_tile -> _split_feature -> encode_tile. Kept for the
    differential suite; the distributed operator uses the batched
    kernel."""
    if levels < 1:
        raise ValueError(f"overzoom levels must be >= 1, got {levels}")
    s = 1 << levels
    kids: dict[tuple[int, int], dict[str, codec.Layer]] = {}
    for name, layer in codec.decode_tile(data).items():
        ext = layer.extent
        for f in layer.features:
            for (cx, cy), geom in _split_feature(f, ext, s, buffer_px):
                lay = kids.setdefault((cx, cy), {}).setdefault(
                    name, codec.Layer(name, layer.version, ext, [])
                )
                lay.features.append(
                    codec.Feature(f.feature_id, f.metadata, f.geom_type, geom)
                )
    out = []
    for (cx, cy), layers in sorted(kids.items()):
        blob = codec.encode_tile(list(layers.values()))
        nfeat = sum(len(l.features) for l in layers.values())
        out.append((cx, cy, blob, nfeat, len(layers)))
    return out


def _split_feature(f, ext: int, s: int, b: int):
    """Yield ((cx, cy), child-local geometry) for every child the scaled
    feature intersects. Child boxes are [c*ext - b, (c+1)*ext + b]; with
    b == 0 the high edge is OPEN except on the parent's own east/south
    edge (child s-1) — the tiler's exact-tiling ownership rule, so a
    point on an interior child boundary emits exactly once."""
    if f.geom_type == GEOM_POINT:
        pts = np.asarray(f.geom, np.int64) * s
        if not len(pts):
            return
        xlo, xhi = _child_range(pts[:, 0].min(), pts[:, 0].max(), ext, s, b)
        ylo, yhi = _child_range(pts[:, 1].min(), pts[:, 1].max(), ext, s, b)
        for cy in range(ylo, yhi + 1):
            for cx in range(xlo, xhi + 1):
                x0, y0 = cx * ext - b, cy * ext - b
                x1, y1 = (cx + 1) * ext + b, (cy + 1) * ext + b
                mx = (pts[:, 0] >= x0) & (
                    (pts[:, 0] < x1) if b == 0 and cx < s - 1 else (pts[:, 0] <= x1)
                )
                my = (pts[:, 1] >= y0) & (
                    (pts[:, 1] < y1) if b == 0 and cy < s - 1 else (pts[:, 1] <= y1)
                )
                m = mx & my
                if m.any():
                    yield (cx, cy), pts[m] - (cx * ext, cy * ext)
        return

    if f.geom_type == GEOM_LINESTRING:
        parts = [np.asarray(p, np.float64) * s for p in f.geom if len(p) >= 2]
        if not parts:
            return
        # per-part bboxes; a part STRICTLY outside a child box would come
        # back [] from the clipper, so skipping it is output-identical
        # (touching parts still go to the kernel)
        pbb = [
            (p[:, 0].min(), p[:, 0].max(), p[:, 1].min(), p[:, 1].max())
            for p in parts
        ]
        xlo, xhi = _child_range(
            min(bb[0] for bb in pbb), max(bb[1] for bb in pbb), ext, s, b
        )
        ylo, yhi = _child_range(
            min(bb[2] for bb in pbb), max(bb[3] for bb in pbb), ext, s, b
        )
        for cy in range(ylo, yhi + 1):
            for cx in range(xlo, xhi + 1):
                x0, y0 = cx * ext - b, cy * ext - b
                x1, y1 = (cx + 1) * ext + b, (cy + 1) * ext + b
                out = []
                for p, (bx0, bx1, by0, by1) in zip(parts, pbb):
                    if bx1 < x0 or bx0 > x1 or by1 < y0 or by0 > y1:
                        continue
                    pieces = (
                        # bbox fully inside: the kernel's fully-inside
                        # branch would hand back these same values
                        (p,)
                        if bx0 >= x0 and bx1 <= x1 and by0 >= y0 and by1 <= y1
                        else clip_polyline(p, x0, y0, x1, y1)
                    )
                    for piece in pieces:
                        loc = _localize_line(piece, float(cx * ext), float(cy * ext))
                        if loc is not None:
                            out.append(np.asarray(loc, np.int64))
                if out:
                    yield (cx, cy), out
        return

    if f.geom_type == GEOM_POLYGON:
        # decode stores rings CLOSED; the exact clipper tolerates that,
        # but strip the duplicate once here instead of per child box
        polys = [
            [
                (np.asarray(r, np.float64) * s)[:-1]
                if len(r) > 1 and np.array_equal(r[0], r[-1])
                else np.asarray(r, np.float64) * s
                for r in poly
                if len(r)
            ]
            for poly in f.geom
            if len(poly) and len(poly[0])
        ]
        polys = [p for p in polys if len(p[0]) >= 3]
        if not polys:
            return
        # per-polygon bboxes; a part strictly outside a child box clips to
        # [] (every ring eliminated by some half-plane pass), so the skip
        # is output-identical
        pbb = []
        for poly in polys:
            ar = poly[0] if len(poly) == 1 else np.concatenate(poly)
            pbb.append((ar[:, 0].min(), ar[:, 0].max(), ar[:, 1].min(), ar[:, 1].max()))
        xlo, xhi = _child_range(
            min(bb[0] for bb in pbb), max(bb[1] for bb in pbb), ext, s, b
        )
        ylo, yhi = _child_range(
            min(bb[2] for bb in pbb), max(bb[3] for bb in pbb), ext, s, b
        )
        for cy in range(ylo, yhi + 1):
            for cx in range(xlo, xhi + 1):
                x0, y0 = cx * ext - b, cy * ext - b
                x1, y1 = (cx + 1) * ext + b, (cy + 1) * ext + b
                ox, oy = float(cx * ext), float(cy * ext)
                out = []
                for rings, (bx0, bx1, by0, by1) in zip(polys, pbb):
                    if bx1 < x0 or bx0 > x1 or by1 < y0 or by0 > y1:
                        continue
                    for piece in clip_polygon_exact(rings, x0, y0, x1, y1):
                        loc_rings = []
                        for k, r in enumerate(piece):
                            loc = _localize_ring(r, ox, oy)
                            if k == 0 and loc is None:
                                loc_rings = None  # exterior collapsed
                                break
                            if loc is not None:
                                loc_rings.append(np.asarray(loc, np.int64))
                        if loc_rings:
                            out.append(loc_rings)
                if out:
                    yield (cx, cy), out
        return

    raise ValueError("Geometry type of UNKNOWN given.")


def _raw_gate(raw):
    """Decide whether one parsed layer can skip decode_tile entirely:
    regular batch decode, every feature a single-point ``[MoveTo(1), zx,
    zy]`` stream, metadata either absent everywhere or exactly one
    uniform in-range key with a uniform value tag — i.e. the shape every
    point-sink layer has. Returns the prepared arrays or None. The gate
    PROVES well-formedness of everything it bypasses (tag pairing, index
    ranges, geometry validity), so a gated tile needs no decode_tile
    validation pass; anything else falls back to the decode path, which
    rejects exactly what decode_tile rejects."""
    bt = raw.batch
    if bt is None:
        return None
    n = len(bt.ids)
    if n == 0:
        return None
    if not bool((np.asarray(bt.types) == 1).all()):
        return None
    gc = np.asarray(bt.geom_cnt)
    gv = np.asarray(bt.geom_vals)
    if not bool((gc == 3).all()) or len(gv) != 3 * n or not bool((gv[0::3] == 9).all()):
        return None
    tc = np.asarray(bt.tag_cnt)
    if bool((tc == 0).all()):
        return gv, None, None, ((), ())
    if not bool((tc == 2).all()):
        return None
    tv = np.asarray(bt.tag_vals)
    if len(tv) != 2 * n:
        return None
    kk, vv = tv[0::2], tv[1::2]
    if not bool((kk == kk[0]).all()) or int(kk[0]) >= len(raw.keys):
        return None
    if not len(raw.values) or int(vv.max()) >= len(raw.values):
        return None
    used = np.unique(vv)
    tags = {raw.values[int(i)][0] for i in used}
    if len(tags) != 1:
        return None
    tag0 = next(iter(tags))
    return gv, vv.astype(np.int64), used, ((raw.keys[int(kk[0])],), (tag0,))


def _raw_parent_chunks(data: bytes, z2: int, ptx: int, pty: int, s: int):
    """Wire-level lane for a WHOLE parent: if every layer passes
    _raw_gate, derive all children straight from the parsed command
    streams (unzigzag -> scale -> floor-div child -> re-zigzag, all
    vectorized) and return [(group_key, chunk)] for the batch encoder —
    no decode_tile, no Feature objects. Returns None when any layer
    fails the gate (duplicate names, lines/polys, multi-key metadata,
    irregular wire), sending the parent through the decode path
    unchanged. Framing errors raise here exactly as decode_tile would —
    parse_raw_tile is the same parser."""
    raws = codec.parse_raw_tile(data)
    names = [r.name for r in raws]
    if len(set(names)) != len(names):
        return None
    preps = []
    for raw in raws:
        p = _raw_gate(raw)
        if p is None:
            return None
        preps.append(p)
    out = []
    for raw, (gv, vcodes, used, (keys0, tags0)) in zip(raws, preps):
        ext = raw.extent if raw.extent is not None else codec.DEFAULT_EXTENT
        zx = gv[1::3].astype(np.int64)
        zy = gv[2::3].astype(np.int64)
        px = (zx >> 1) ^ -(zx & 1)
        py = (zy >> 1) ^ -(zy & 1)
        xs, ys = px * s, py * s
        lim = s * ext
        ok = (xs >= 0) & (xs <= lim) & (ys >= 0) & (ys <= lim)
        keep = np.flatnonzero(ok)
        if not len(keep):
            continue
        xs, ys = xs[keep], ys[keep]
        cx = np.minimum(xs // ext, s - 1)
        cy = np.minimum(ys // ext, s - 1)
        # child-major, parent emission order within a child — the same
        # (cx, cy, original index) order the decode lanes produce
        order = np.lexsort((keep, cy, cx))
        cx, cy = cx[order], cy[order]
        lx = xs[order] - cx * ext
        ly = ys[order] - cy * ext
        m = len(order)
        svals = np.empty((m, 3), np.uint32)
        svals[:, 0] = 9
        svals[:, 1] = ((lx << 1) ^ (lx >> 63)).astype(np.uint32)
        svals[:, 2] = ((ly << 1) ^ (ly >> 63)).astype(np.uint32)
        chunk = {
            "tz": np.full(m, z2, np.int64),
            "tx": ptx * s + cx,
            "ty": pty * s + cy,
            "fid": np.asarray(bt_ids := raw.batch.ids, np.uint64).astype(np.int64)[keep][order],
            "gt": np.ones(m, np.int64),
            "svals": svals.ravel(),
            "slens": np.full(m, 3, np.int64),
            "codes": [],
            "framed": [],
        }
        if keys0:
            local = np.searchsorted(used, vcodes[keep][order])
            chunk["codes"] = [local]
            chunk["framed"] = [[
                wire.len_delimited(
                    4, codec.encode_value_bytes(tags0[0], raw.values[int(i)][1])
                )
                for i in used.tolist()
            ]]
        out.append(((raw.name, ext, raw.version, keys0, tags0), chunk))
    return out


def _overzoom_rows(parents, levels: int = 1, buffer_px: int = 0):
    """Batched overzoom kernel over MANY parents at once.

    parents: iterable of (tile_z, tile_x, tile_y, mvt_bytes). Returns six
    parallel lists (tile_z, tile_x, tile_y, mvt, n_features, n_layers),
    children sorted by key.

    Byte-identical to the scalar object path (encode_layer field order,
    first-appearance dictionaries, stable pts->lines->polys sort,
    parent-order feature emission) — pinned by the differential suite.
    Two lanes per parent-layer:

    * batched lane (homogeneous metadata — every feature carries the same
      key/tag tuple, the shape every sink-produced layer has): child
      assignment for single-point features is one vectorized block
      (floor-div child, subtract, zigzag), everything else splits through
      the clip kernels; ALL resulting child rows across ALL parents of
      the batch then encode in ONE encode_multi_tile_batch call per
      distinct (layer, extent, version, keys) group — the same ~30-array-
      pass path the tile sink uses, no per-feature Python encode.
    * object lane (heterogeneous metadata): per-child encode_layer, the
      decode-side general case.
    """
    if levels < 1:
        raise ValueError(f"overzoom levels must be >= 1, got {levels}")
    s = 1 << levels
    b = buffer_px
    frames: dict[tuple, list] = {}  # child key -> [(name, frame, nrows)]
    groups: dict[tuple, dict] = {}
    raw_chunks: dict[tuple, list] = {}  # gkey -> [chunk dicts], append order

    for pz, ptx, pty, data in parents:
        z2 = pz + levels
        if b == 0:
            got = _raw_parent_chunks(bytes(data), z2, ptx, pty, s)
            if got is not None:
                for gkey, chunk in got:
                    raw_chunks.setdefault(gkey, []).append(chunk)
                continue
        for name, layer in codec.decode_tile(bytes(data)).items():
            ext = layer.extent
            feats = layer.features
            if not feats:
                continue
            keys0 = tuple(feats[0].metadata.keys())
            tags0 = tuple(t for t, _ in feats[0].metadata.values())
            # batched-lane gate: at most ONE metadata key, uniform across
            # features. With C <= 1 the batch encoder's per-column value
            # dictionary coincides with encode_layer's interleaved
            # first-appearance dictionary, so both lanes emit identical
            # bytes; C >= 2 layers keep the object path (dictionary entry
            # ORDER would differ — decode-equal but not byte-equal).
            gate = len(keys0) <= 1 and all(
                tuple(f.metadata.keys()) == keys0
                and tuple(t for t, _ in f.metadata.values()) == tags0
                for f in feats
            )
            if not gate:
                kids: dict[tuple, codec.Layer] = {}
                for f in feats:
                    for c, geom in _split_feature(f, ext, s, b):
                        lay = kids.setdefault(
                            c, codec.Layer(name, layer.version, ext, [])
                        )
                        lay.features.append(
                            codec.Feature(f.feature_id, f.metadata, f.geom_type, geom)
                        )
                for c in sorted(kids):
                    ck = (z2, ptx * s + c[0], pty * s + c[1])
                    frame = wire.len_delimited(3, codec.encode_layer(kids[c]))
                    frames.setdefault(ck, []).append(
                        (name, frame, len(kids[c].features))
                    )
                continue

            # ---- batched lane ----
            single_res: dict[int, tuple] = {}
            if b == 0:
                singles = [
                    i for i, f in enumerate(feats)
                    if f.geom_type == GEOM_POINT and len(f.geom) == 1
                ]
                if singles:
                    coords = (
                        np.concatenate([feats[i].geom for i in singles]).astype(np.int64)
                        * s
                    )
                    lim = s * ext
                    ok = (
                        (coords[:, 0] >= 0) & (coords[:, 0] <= lim)
                        & (coords[:, 1] >= 0) & (coords[:, 1] <= lim)
                    )
                    cx = np.minimum(coords[:, 0] // ext, s - 1)
                    cy = np.minimum(coords[:, 1] // ext, s - 1)
                    lx = coords[:, 0] - cx * ext
                    ly = coords[:, 1] - cy * ext
                    zz = np.empty((len(singles), 3), np.uint32)
                    zz[:, 0] = 9  # MoveTo(1)
                    zz[:, 1] = ((lx << 1) ^ (lx >> 63)).astype(np.uint32)
                    zz[:, 2] = ((ly << 1) ^ (ly >> 63)).astype(np.uint32)
                    cxl, cyl, okl = cx.tolist(), cy.tolist(), ok.tolist()
                    for j, i in enumerate(singles):
                        single_res[i] = (okl[j], cxl[j], cyl[j], zz[j])

            kid_rows: dict[tuple, list] = {}
            for i, f in enumerate(feats):
                r = single_res.get(i)
                if r is not None:
                    okj, cxj, cyj, stream = r
                    if okj:
                        kid_rows.setdefault((cxj, cyj), []).append(
                            (f.geom_type, f.feature_id, f.metadata, stream)
                        )
                    continue
                for c, geom in _split_feature(f, ext, s, b):
                    stream = geom_to_stream(f.geom_type, geom).astype(np.uint32)
                    kid_rows.setdefault(c, []).append(
                        (f.geom_type, f.feature_id, f.metadata, stream)
                    )
            if not kid_rows:
                continue
            g = groups.setdefault(
                (name, ext, layer.version, keys0, tags0),
                {
                    "tz": [], "tx": [], "ty": [], "fid": [], "gt": [],
                    "streams": [], "vals": [[] for _ in keys0],
                },
            )
            for c in sorted(kid_rows):
                rows = kid_rows[c]
                rows.sort(key=lambda r: r[0])  # stable: pts, lines, polys
                x2, y2 = ptx * s + c[0], pty * s + c[1]
                for gt, fid, meta, stream in rows:
                    g["tz"].append(z2)
                    g["tx"].append(x2)
                    g["ty"].append(y2)
                    w = fid & 0xFFFFFFFFFFFFFFFF  # wire uint64 -> signed i64
                    g["fid"].append(w - (1 << 64) if w >= (1 << 63) else w)
                    g["gt"].append(gt)
                    g["streams"].append(np.asarray(stream, np.uint32))
                    for k_i, key in enumerate(keys0):
                        g["vals"][k_i].append(meta[key][1])

    for gkey in list(groups) + [k for k in raw_chunks if k not in groups]:
        name, ext, version, keys0, tags0 = gkey
        parts = []
        g = groups.get(gkey)
        if g:
            # the decode-lane rows of this group, folded into one chunk
            m = len(g["fid"])
            codes_l, framed_l = [], []
            for k_i in range(len(keys0)):
                vals = g["vals"][k_i]
                lut: dict = {}
                uniq: list = []
                codes = np.empty(m, np.int64)
                for i, v in enumerate(vals):
                    c = lut.get(v)
                    if c is None:
                        c = lut[v] = len(uniq)
                        uniq.append(v)
                    codes[i] = c
                codes_l.append(codes)
                # fully FRAMED Layer.values entries (0x22 + len + body),
                # the shape encode_multi_tile_batch's dictionaries expect
                framed_l.append([
                    wire.len_delimited(4, codec.encode_value_bytes(tags0[k_i], v))
                    for v in uniq
                ])
            parts.append({
                "tz": np.asarray(g["tz"], np.int64),
                "tx": np.asarray(g["tx"], np.int64),
                "ty": np.asarray(g["ty"], np.int64),
                "fid": np.asarray(g["fid"], np.int64),
                "gt": np.asarray(g["gt"], np.int64),
                "svals": (
                    np.concatenate(g["streams"]) if m else np.zeros(0, np.uint32)
                ),
                "slens": np.fromiter(
                    (len(st) for st in g["streams"]), np.int64, count=m
                ),
                "codes": codes_l,
                "framed": framed_l,
            })
        parts.extend(raw_chunks.get(gkey, ()))
        n = int(sum(len(p["fid"]) for p in parts))
        if not n:
            continue
        tz = np.concatenate([p["tz"] for p in parts])
        tx = np.concatenate([p["tx"] for p in parts])
        ty = np.concatenate([p["ty"] for p in parts])
        fid = np.concatenate([p["fid"] for p in parts])
        gt = np.concatenate([p["gt"] for p in parts])
        geom_values = np.concatenate([p["svals"] for p in parts])
        lens = np.concatenate([p["slens"] for p in parts])
        geom_offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=geom_offsets[1:])
        meta_cols = []
        for k_i, key in enumerate(keys0):
            # chunk-local codes offset into one concatenated framed-value
            # table; encode_multi_tile_batch re-canonicalizes per run, so
            # cross-chunk dedupe is unnecessary
            base = 0
            code_parts, framed_all = [], []
            for p in parts:
                code_parts.append(p["codes"][k_i] + base)
                framed_all.extend(p["framed"][k_i])
                base += len(p["framed"][k_i])
            codes = np.concatenate(code_parts)
            foff = np.zeros(len(framed_all) + 1, np.int64)
            np.cumsum(
                np.fromiter(map(len, framed_all), np.int64, count=len(framed_all)),
                out=foff[1:],
            )
            fbuf = np.frombuffer(b"".join(framed_all), np.uint8)
            meta_cols.append((key, codes, fbuf, foff))
        mvts, tile_starts, _ = codec.encode_multi_tile_batch(
            tz, tx, ty,
            np.zeros(n, np.int64), [name],
            fid, gt,
            geom_values, geom_offsets, meta_cols,
            version=version, extent=ext,
        )
        bounds = np.concatenate([tile_starts, [n]]).astype(np.int64)
        for t_i, frame in enumerate(mvts):
            r0 = int(bounds[t_i])
            ck = (int(tz[r0]), int(tx[r0]), int(ty[r0]))
            frames.setdefault(ck, []).append(
                (name, frame, int(bounds[t_i + 1] - r0))
            )

    out = ([], [], [], [], [], [])
    for ck in sorted(frames):
        parts = sorted(frames[ck], key=lambda p: p[0])
        blob = b"".join(fr for _, fr, _ in parts)
        for col, v in zip(out, (
            ck[0], ck[1], ck[2], blob,
            sum(nr for _, _, nr in parts), len(parts),
        )):
            col.append(v)
    return out


def overzoom_tiles(
    tiles: DataFrame, levels: int = 1, buffer_px: int = 0
) -> DataFrame:
    """Distributed overzoom: (tile_z, tile_x, tile_y, mvt) rows in, the
    2^levels-deeper child tile rows out. ZERO shuffle — see module
    docstring; feed the output straight into a tile sink or another
    overzoom_tiles hop."""
    if levels < 1:
        raise ValueError(f"overzoom levels must be >= 1, got {levels}")
    s = 1 << levels

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            parents = zip(
                batch.column("tile_z").to_pylist(),
                batch.column("tile_x").to_pylist(),
                batch.column("tile_y").to_pylist(),
                batch.column("mvt").to_pylist(),
            )
            cz, cx, cy, cm, cnf, cnl = _overzoom_rows(parents, levels, buffer_px)
            if cz:
                yield pa.record_batch(
                    [
                        pa.array(cz, pa.int32()),
                        pa.array(cx, pa.int32()),
                        pa.array(cy, pa.int32()),
                        pa.array(cm, pa.binary()),
                        pa.array(cnf, pa.int64()),
                        pa.array(cnl, pa.int32()),
                    ],
                    names=[
                        "tile_z", "tile_x", "tile_y", "mvt", "n_features", "n_layers",
                    ],
                )

    return tiles.mapInArrow(run, schema=TILE_SCHEMA)
