"""Mapbox Vector Tile codec: tile <-> features, hand-rolled wire format.

Implements the two-level model of the reference (SURVEY.md §1): a raw
protobuf level (``RawTile``/``RawLayer``/``RawFeature``/``RawValue``) and a
canonical level (``Layer``/``Feature`` with decoded geometry + metadata).

Field numbers / wire tags follow the vector_tile.proto contract documented
in SURVEY.md §1.3 (verified against the reference's generated schema code,
/root/reference/lib/Geography/VectorTile/Protobuf/Internal/Vector_tile/).

Encode-side canonicalization (stronger than the reference, which iterates
HashMaps in unspecified order — Internal.hs:101-102, 321-329): layers are
emitted sorted by name, dictionaries in first-appearance order, features
points-first then linestrings then polygons (matching Internal.hs:123-125).
The correctness gate is decode-to-identical-features, which both satisfy.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from . import wire
from .geometry import (
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    geom_from_stream,
    geom_to_stream,
)

# Value tags = proto field numbers of vector_tile.Tile.Value
# (SURVEY.md §1.3; …/Tile/Value.hs:73-79)
VAL_STRING = 1
VAL_FLOAT = 2
VAL_DOUBLE = 3
VAL_INT = 4
VAL_UINT = 5
VAL_SINT = 6
VAL_BOOL = 7

DEFAULT_EXTENT = 4096  # …/Tile/Layer.hs:31
DEFAULT_VERSION = 1    # decoded default; we emit 2 for our own output
DEFAULT_FEATURE_ID = 0  # …/Tile/Feature.hs:21


@dataclass
class RawFeature:
    id: int = DEFAULT_FEATURE_ID
    tags: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.uint32))
    type: int = 0
    geometry: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.uint32))

    def __eq__(self, other):
        return (
            self.id == other.id
            and np.array_equal(self.tags, other.tags)
            and self.type == other.type
            and np.array_equal(self.geometry, other.geometry)
        )


@dataclass
class RawLayer:
    version: int = DEFAULT_VERSION
    name: str = ""
    features: list[RawFeature] = field(default_factory=list)
    keys: list[str] = field(default_factory=list)
    values: list[tuple] = field(default_factory=list)  # (tag, python value)
    extent: int | None = None


@dataclass
class Feature:
    """Canonical feature: decoded geometry + metadata dict.

    metadata maps key -> (value_tag, python value); geom representation per
    geometry.py module docstring.
    """

    feature_id: int
    metadata: dict[str, tuple]
    geom_type: int
    geom: object

    def canonical(self):
        """Order-insensitive comparable form (geometry as nested tuples)."""
        if self.geom_type == GEOM_POINT:
            g = tuple(map(tuple, np.asarray(self.geom).tolist()))
        elif self.geom_type == GEOM_LINESTRING:
            g = tuple(tuple(map(tuple, p.tolist())) for p in self.geom)
        else:
            g = tuple(
                tuple(tuple(map(tuple, r.tolist())) for r in poly) for poly in self.geom
            )
        return (self.feature_id, tuple(sorted(self.metadata.items())), self.geom_type, g)


@dataclass
class Layer:
    name: str
    version: int = 2
    extent: int = DEFAULT_EXTENT
    features: list[Feature] = field(default_factory=list)


# ---------------- raw protobuf parse (decode side) ----------------


def _parse_value(buf: memoryview) -> tuple:
    pos = 0
    end = len(buf)
    out: tuple | None = None
    while pos < end:
        fnum, wt, pos = wire.read_tag(buf, pos)
        if fnum == VAL_STRING and wt == wire.WT_LEN:
            n, pos = wire.read_varint(buf, pos)
            out = (VAL_STRING, bytes(buf[pos:pos + n]).decode("utf-8"))
            pos += n
        elif fnum == VAL_FLOAT and wt == wire.WT_FIXED32:
            out = (VAL_FLOAT, struct.unpack("<f", buf[pos:pos + 4])[0])
            pos += 4
        elif fnum == VAL_DOUBLE and wt == wire.WT_FIXED64:
            out = (VAL_DOUBLE, struct.unpack("<d", buf[pos:pos + 8])[0])
            pos += 8
        elif fnum == VAL_INT and wt == wire.WT_VARINT:
            v, pos = wire.read_varint(buf, pos)
            out = (VAL_INT, v - (1 << 64) if v >= (1 << 63) else v)
        elif fnum == VAL_UINT and wt == wire.WT_VARINT:
            v, pos = wire.read_varint(buf, pos)
            out = (VAL_UINT, v)
        elif fnum == VAL_SINT and wt == wire.WT_VARINT:
            v, pos = wire.read_varint(buf, pos)
            out = (VAL_SINT, (v >> 1) ^ -(v & 1))
        elif fnum == VAL_BOOL and wt == wire.WT_VARINT:
            v, pos = wire.read_varint(buf, pos)
            out = (VAL_BOOL, bool(v))
        else:
            pos = wire.skip_field(buf, pos, wt)
    if out is None:
        raise ValueError("Value decode: No legal Value type offered")
    return out


def _parse_packed_u32(buf: memoryview, pos: int, wt: int, acc: list[np.ndarray]):
    """Packed (LEN) or unpacked (VARINT) repeated uint32."""
    if wt == wire.WT_LEN:
        n, pos = wire.read_varint(buf, pos)
        acc.append(wire.decode_varints(bytes(buf[pos:pos + n])).astype(np.uint32))
        return pos + n
    v, pos = wire.read_varint(buf, pos)
    acc.append(np.array([v], dtype=np.uint32))
    return pos


def _parse_feature(buf: memoryview) -> RawFeature:
    pos = 0
    end = len(buf)
    f = RawFeature()
    tags_acc: list[np.ndarray] = []
    geom_acc: list[np.ndarray] = []
    while pos < end:
        fnum, wt, pos = wire.read_tag(buf, pos)
        if fnum == 1 and wt == wire.WT_VARINT:  # id
            f.id, pos = wire.read_varint(buf, pos)
        elif fnum == 2:  # tags
            pos = _parse_packed_u32(buf, pos, wt, tags_acc)
        elif fnum == 3 and wt == wire.WT_VARINT:  # type
            f.type, pos = wire.read_varint(buf, pos)
        elif fnum == 4:  # geometry
            pos = _parse_packed_u32(buf, pos, wt, geom_acc)
        else:
            pos = wire.skip_field(buf, pos, wt)
    if tags_acc:
        f.tags = np.concatenate(tags_acc)
    if geom_acc:
        f.geometry = np.concatenate(geom_acc)
    return f


def _parse_layer(buf: memoryview) -> RawLayer:
    pos = 0
    end = len(buf)
    layer = RawLayer()
    while pos < end:
        fnum, wt, pos = wire.read_tag(buf, pos)
        if fnum == 15 and wt == wire.WT_VARINT:
            layer.version, pos = wire.read_varint(buf, pos)
        elif fnum == 1 and wt == wire.WT_LEN:
            n, pos = wire.read_varint(buf, pos)
            layer.name = bytes(buf[pos:pos + n]).decode("utf-8")
            pos += n
        elif fnum == 2 and wt == wire.WT_LEN:
            n, pos = wire.read_varint(buf, pos)
            layer.features.append(_parse_feature(buf[pos:pos + n]))
            pos += n
        elif fnum == 3 and wt == wire.WT_LEN:
            n, pos = wire.read_varint(buf, pos)
            layer.keys.append(bytes(buf[pos:pos + n]).decode("utf-8"))
            pos += n
        elif fnum == 4 and wt == wire.WT_LEN:
            n, pos = wire.read_varint(buf, pos)
            layer.values.append(_parse_value(buf[pos:pos + n]))
            pos += n
        elif fnum == 5 and wt == wire.WT_VARINT:
            layer.extent, pos = wire.read_varint(buf, pos)
        else:
            pos = wire.skip_field(buf, pos, wt)
    return layer


def parse_raw_tile(data: bytes) -> list[RawLayer]:
    """Parse MVT bytes to raw protobuf-level layers (Tile.layers, field 3)."""
    buf = memoryview(data)
    pos = 0
    end = len(buf)
    layers: list[RawLayer] = []
    while pos < end:
        fnum, wt, pos = wire.read_tag(buf, pos)
        if fnum == 3 and wt == wire.WT_LEN:
            n, pos = wire.read_varint(buf, pos)
            layers.append(_parse_layer(buf[pos:pos + n]))
            pos += n
        else:
            pos = wire.skip_field(buf, pos, wt)
    return layers


# ---------------- raw -> canonical (fromProtobuf, Internal.hs:96-112) ----------------


def layer_from_raw(raw: RawLayer) -> Layer:
    """ref Internal.hs:104-112 + feats (Internal.hs:295-308).

    Errors on an empty feature list and on UNKNOWN geometry, matching the
    reference's strictness.
    """
    if not raw.features:
        raise ValueError("VectorTile.features: `[RawFeature]` empty")
    feats: list[Feature] = []
    for rf in raw.features:
        if rf.type not in (GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON):
            raise ValueError("Geometry type of UNKNOWN given.")
        tags = np.asarray(rf.tags, dtype=np.int64)
        tags = tags[: (tags.size // 2) * 2].reshape(-1, 2)
        meta = {raw.keys[k]: raw.values[v] for k, v in tags}
        geom = geom_from_stream(rf.type, rf.geometry)
        feats.append(Feature(rf.id, meta, rf.type, geom))
    # points first, then linestrings, then polygons (Internal.hs:304-308
    # splits by type; stable within type)
    feats.sort(key=lambda f: f.geom_type)
    return Layer(
        name=raw.name,
        version=raw.version,
        extent=raw.extent if raw.extent is not None else DEFAULT_EXTENT,
        features=feats,
    )


def decode_tile(data: bytes) -> dict[str, Layer]:
    """tile :: ByteString -> VectorTile (ref lib/Geography/VectorTile.hs:70-71)."""
    return {layer.name: layer for layer in (layer_from_raw(r) for r in parse_raw_tile(data))}


# ---------------- canonical -> wire bytes (encode side) ----------------


def _encode_value(tag: int, v) -> bytes:
    if tag == VAL_STRING:
        return wire.len_delimited(VAL_STRING, v.encode("utf-8") if isinstance(v, str) else bytes(v))
    if tag == VAL_FLOAT:
        return wire.tag_bytes(VAL_FLOAT, wire.WT_FIXED32) + struct.pack("<f", v)
    if tag == VAL_DOUBLE:
        return wire.tag_bytes(VAL_DOUBLE, wire.WT_FIXED64) + struct.pack("<d", v)
    if tag == VAL_INT:
        return wire.tag_bytes(VAL_INT, wire.WT_VARINT) + wire.encode_varint(int(v))
    if tag == VAL_UINT:
        return wire.tag_bytes(VAL_UINT, wire.WT_VARINT) + wire.encode_varint(int(v))
    if tag == VAL_SINT:
        n = int(v)
        return wire.tag_bytes(VAL_SINT, wire.WT_VARINT) + wire.encode_varint(
            ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
        )
    if tag == VAL_BOOL:
        return wire.tag_bytes(VAL_BOOL, wire.WT_VARINT) + wire.encode_varint(1 if v else 0)
    raise ValueError(f"unknown value tag {tag}")


def _encode_feature(fid: int, tags: np.ndarray, geom_type: int, stream: np.ndarray) -> bytes:
    # field order: id(1), tags(2 packed), type(3), geometry(4 packed)
    body = wire.tag_bytes(1, wire.WT_VARINT) + wire.encode_varint(int(fid))
    if len(tags):
        body += wire.packed_uint32(2, tags)
    body += wire.tag_bytes(3, wire.WT_VARINT) + wire.encode_varint(int(geom_type))
    body += wire.packed_uint32(4, stream)
    return wire.len_delimited(2, body)  # Layer.features field 2


def encode_layer_from_streams(
    name: str,
    feats: list[tuple[int, dict, int, np.ndarray]],
    version: int = 2,
    extent: int = DEFAULT_EXTENT,
) -> bytes:
    """Layer wire encode from (feature_id, metadata, geom_type, command_stream)
    tuples whose geometry is ALREADY a uint32 command stream.

    This is the hot path called per tile inside the Spark applyInPandas sink
    (SURVEY.md §2.D8): upstream stages produce command streams (points via
    pure Column math, polygons/lines via the NumPy kernel), so the per-tile
    work left here is dictionary building + wire framing.

    Contract per the reference: dictionaries layer-level (totalMeta,
    Internal.hs:321-329; first-appearance order where the reference's
    HashSet order is unspecified), features sorted points-first then lines
    then polygons (Internal.hs:123-125), field order name, features, keys,
    values, extent, version-last (…/Tile/Layer.hs:51-55).
    """
    keys: dict[str, int] = {}
    values: dict[tuple, int] = {}
    feats = sorted(feats, key=lambda f: f[2])  # pts, lines, polys; stable
    encoded_feats: list[bytes] = []
    for fid, meta, geom_type, stream in feats:
        tag_list: list[int] = []
        for k, v in meta.items():
            tag_list.append(keys.setdefault(k, len(keys)))
            tag_list.append(values.setdefault(v, len(values)))
        encoded_feats.append(
            _encode_feature(fid, np.asarray(tag_list, dtype=np.uint32), geom_type, stream)
        )
    body = wire.len_delimited(1, name.encode("utf-8"))
    body += b"".join(encoded_feats)
    for k in keys:
        body += wire.len_delimited(3, k.encode("utf-8"))
    for (tag, v) in values:
        body += wire.len_delimited(4, _encode_value(tag, v))
    body += wire.tag_bytes(5, wire.WT_VARINT) + wire.encode_varint(int(extent))
    body += wire.tag_bytes(15, wire.WT_VARINT) + wire.encode_varint(int(version))
    return body


def encode_layer(layer: Layer) -> bytes:
    """toProtobuf @Layer + wire put, ref Internal.hs:114-125."""
    feats = [
        (f.feature_id, f.metadata, f.geom_type, geom_to_stream(f.geom_type, f.geom))
        for f in layer.features
    ]
    return encode_layer_from_streams(layer.name, feats, layer.version, layer.extent)


def encode_tile(layers: list[Layer]) -> bytes:
    """untile :: VectorTile -> ByteString (ref lib/Geography/VectorTile.hs:74-75).

    Layers sorted by name for deterministic output (the reference iterates a
    HashMap, order unspecified — Internal.hs:101-102)."""
    out = bytearray()
    for layer in sorted(layers, key=lambda l: l.name):
        out += wire.len_delimited(3, encode_layer(layer))
    return bytes(out)


def roundtrip_features(data: bytes) -> dict[str, list]:
    """Decode -> canonical feature sets per layer (order-insensitive)."""
    return {
        name: sorted(f.canonical() for f in layer.features)
        for name, layer in decode_tile(data).items()
    }
