"""Protobuf wire-format primitives, hand-rolled in NumPy.

No protobuf library exists in this environment, so the Mapbox Vector Tile
wire format is implemented directly from the field-number/wire-tag table
documented in SURVEY.md §1.3 (derived from the reference's generated schema
code, e.g. /root/reference/lib/Geography/VectorTile/Protobuf/Internal/
Vector_tile/Tile/Layer.hs:71-79).

All bulk paths (packed geometry command streams, packed tag lists) are
vectorized over NumPy arrays; only message framing walks fields in Python.
"""

from __future__ import annotations

import numpy as np

# Wire types
WT_VARINT = 0
WT_FIXED64 = 1
WT_LEN = 2
WT_FIXED32 = 5

_U7 = np.uint64(7)
_U1 = np.uint64(1)


_SMALL_VARINT = [bytes([i]) for i in range(128)]


def encode_varints(values: np.ndarray) -> bytes:
    """Varint encoding of a uint64 array -> concatenated bytes.

    Small arrays (the common per-feature case: 3-element point command
    streams, short tag lists) take a pure-Python fast path — NumPy's fixed
    setup cost dominates under ~64 elements; large arrays (multi-ring
    polygons, packed layers) go through the fully vectorized path."""
    n = len(values)
    if n == 0:
        return b""
    if n < 64:
        out = bytearray()
        for x in (values.tolist() if isinstance(values, np.ndarray) else values):
            v = int(x) & 0xFFFFFFFFFFFFFFFF
            while v >= 128:
                out.append((v & 0x7F) | 0x80)
                v >>= 7
            out.append(v)
        return bytes(out)
    buf, _ = encode_varints_with_lens(values)
    return buf.tobytes()


def encode_varints_with_lens(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varint encode returning (uint8 buffer, per-value byte
    lengths). The building block of the ragged-stitch feature framer: the
    caller interleaves these buffers by offset arithmetic, so per-value
    lengths must come out alongside the bytes."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nbytes += (tmp != 0)
        tmp = tmp >> _U7
    total = int(nbytes.sum())
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    owner = np.repeat(np.arange(n), nbytes)
    offset = (np.arange(total) - starts[owner]).astype(np.uint64)
    chunks = (v[owner] >> (offset * _U7)) & np.uint64(0x7F)
    cont = (offset < (nbytes[owner] - 1).astype(np.uint64)).astype(np.uint8)
    return chunks.astype(np.uint8) | (cont << 7), nbytes


_ARANGE = np.zeros(0, dtype=np.int64)


def _arange(n: int) -> np.ndarray:
    """Cached arange view — avoids re-materializing multi-MB index ramps
    (fresh page allocation is the dominant cost on this host)."""
    global _ARANGE
    if _ARANGE.size < n:
        _ARANGE = np.arange(max(n, 2 * _ARANGE.size, 1 << 16), dtype=np.int64)
    return _ARANGE[:n]


def ragged_gather(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate buf[starts[i]:starts[i]+lens[i]] for all i, vectorized."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=buf.dtype)
    # identity shortcut: contiguous, in-order ranges are just a slice
    if starts.size and int(starts[-1]) + int(lens[-1]) - int(starts[0]) == total:
        ends = starts + lens
        if starts.size == 1 or bool((starts[1:] == ends[:-1]).all()):
            return buf[int(starts[0]):int(starts[0]) + total]
    out_start = np.cumsum(lens) - lens
    idx = np.repeat(starts - out_start, lens) + _arange(total)
    return buf[idx]


def ragged_stitch(slots: list[tuple[np.ndarray, np.ndarray]]) -> tuple[np.ndarray, np.ndarray]:
    """Interleave K ragged byte buffers feature-wise, fully vectorized.

    slots: [(buf_uint8, lens_int64)] — slot s contributes buf[s] split into
    per-feature chunks of lens[s][i] bytes; output feature i is the
    concatenation of slot 0..K-1's i-th chunks. Returns (out_uint8,
    per_feature_total_lens). O(total bytes) with no Python per-feature loop
    (the classic repeat/cumsum ragged scatter)."""
    n = len(slots[0][1])
    lens = np.stack([l for _, l in slots])  # (K, n)
    feat_total = lens.sum(axis=0)
    feat_start = np.cumsum(feat_total) - feat_total
    within = np.vstack([np.zeros(n, dtype=np.int64), np.cumsum(lens, axis=0)[:-1]])
    out = np.empty(int(feat_total.sum()), dtype=np.uint8)
    for s, (buf, L) in enumerate(slots):
        total = int(L.sum())
        if total == 0:
            continue
        src_start = np.cumsum(L) - L
        # scatter: dest = repeat(dest_start - src_start, L) + arange(total)
        idx = np.repeat(feat_start + within[s] - src_start, L) + _arange(total)
        out[idx] = buf[:total]
    return out, feat_total


def encode_varint(value: int) -> bytes:
    """Single varint (uint64 two's-complement for negatives)."""
    v = value & 0xFFFFFFFFFFFFFFFF
    if v < 128:
        return _SMALL_VARINT[v]
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varints(buf: bytes | np.ndarray) -> np.ndarray:
    """Vectorized decode of a buffer of back-to-back varints -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    if not is_end[-1]:
        raise ValueError("truncated varint stream")
    # value index per byte
    vid = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_end[:-1], out=vid[1:])
    nvals = int(is_end.sum())
    # position of each byte within its value
    ends = np.flatnonzero(is_end)
    starts = np.empty(nvals, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    pos = (np.arange(b.size) - starts[vid]).astype(np.uint64)
    if pos.max() > 9:
        raise ValueError("varint longer than 10 bytes")
    out = np.zeros(nvals, dtype=np.uint64)
    np.bitwise_or.at(out, vid, (b & np.uint8(0x7F)).astype(np.uint64) << (pos * _U7))
    return out


def read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    """Read one varint at pos; return (value, new_pos). Wraps mod 2^64
    like the vectorized decode_varints — a 10-byte varint's spare high
    bits (up to 70) must not leak into the value."""
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def read_tag(buf: memoryview, pos: int) -> tuple[int, int, int]:
    """Read a field tag; return (field_number, wire_type, new_pos)."""
    key, pos = read_varint(buf, pos)
    return key >> 3, key & 7, pos


def skip_field(
    buf: memoryview, pos: int, wire_type: int, end: int | None = None
) -> int:
    """Skip an unknown field (forward compatibility). A skip that runs
    past ``end`` (default: the buffer end) is a TORN field — raise rather
    than silently accepting a truncated message."""
    if end is None:
        end = len(buf)
    if wire_type == WT_VARINT:
        _, pos = read_varint(buf, pos)
    elif wire_type == WT_FIXED64:
        pos += 8
    elif wire_type == WT_LEN:
        n, pos = read_varint(buf, pos)
        pos += n
    elif wire_type == WT_FIXED32:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire_type}")
    if pos > end:
        raise ValueError("truncated unknown field")
    return pos


def tag_bytes(field_number: int, wire_type: int) -> bytes:
    return encode_varint((field_number << 3) | wire_type)


def len_delimited(field_number: int, payload: bytes) -> bytes:
    return tag_bytes(field_number, WT_LEN) + encode_varint(len(payload)) + payload


def packed_uint32(field_number: int, values: np.ndarray) -> bytes:
    """Packed repeated uint32 field (Feature.tags / Feature.geometry)."""
    return len_delimited(field_number, encode_varints(values))
