"""Adversarial decode robustness: arbitrary bytes must raise cleanly (or
decode), never hang, crash the interpreter, or return garbage silently —
the property a distributed ingest path needs when fed corrupt objects."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vectortiles_spark.images import codec as ic
from vectortiles_spark.mvt import codec, geometry


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_decode_tile_never_hangs_or_crashes(data):
    try:
        codec.decode_tile(data)
    except (ValueError, IndexError, UnicodeDecodeError, OverflowError):
        pass  # clean rejection


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_truncated_real_tile_prefixes(data):
    """Prefixes of a REAL tile spliced with random suffixes."""
    with open("/root/reference/test/roads.mvt", "rb") as f:
        real = f.read()
    mutated = real[: len(data) * 50] + data
    try:
        codec.decode_tile(mutated)
    except (ValueError, IndexError, UnicodeDecodeError, OverflowError):
        pass


@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=40))
@settings(max_examples=300, deadline=None)
def test_geometry_stream_fuzz(vals):
    stream = np.array(vals, dtype=np.uint32)
    for gt in (1, 2, 3):
        try:
            geom = geometry.geom_from_stream(gt, stream)
            # whatever decoded must re-encode without error
            geometry.geom_to_stream(gt, geom)
        except (ValueError, IndexError):
            pass


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_image_decode_fuzz(data):
    for fmt in ("ppm", "dct", None):
        try:
            ic.decode_image(data, fmt)
        except (ValueError, IndexError, OverflowError):
            pass


def test_torn_unknown_field_rejected():
    # skip_field must bounds-check: a tile-level unknown field whose
    # payload (or fixed width) runs past the buffer is torn input, not
    # an empty tile (round-5 verify probe found these ACCEPTED)
    import pytest

    from vectortiles_spark.mvt import codec

    for torn in (
        b"\x99\x88\x77",      # torn fixed64 unknown field
        b"\x0a\x03\xff\xff",  # unknown len field claims 3 bytes, has 2
        b"\x0d\x00",          # unknown fixed32, 1 of 4 bytes
    ):
        with pytest.raises(ValueError):
            codec.decode_tile(torn)
    # a varint with no terminator dies in read_varint itself — the
    # scalar paths' pinned rejection type for that is IndexError
    with pytest.raises((ValueError, IndexError)):
        codec.decode_tile(b"\x08\xff")
    assert codec.decode_tile(b"") == {}  # genuinely empty stays empty
