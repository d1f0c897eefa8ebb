"""Container edge cases: nonstandard-but-legal streams."""

import gzip
import struct
import zlib

import numpy as np
import pytest

import tpuzlib
from tpuzlib import Inflater, inflate


def test_small_window_zlib_streams(paradiselost):
    """zlib streams with wbits < 15 (CMF high nibble < 7) must decode
    through the streaming Inflater (reference accepts any wbits <= 15:
    inflate.ts:214-218 only rejects > 7)."""
    data = paradiselost[:50000]
    for wbits in (9, 11, 13, 14):
        wire = zlib.compress(data, 6, wbits=wbits)
        inf = Inflater()
        bufs = inf.append(wire)
        r = inf.finish()
        assert r.success and r.checksum == "match", wbits
        assert bytes(tpuzlib.mergeBuffers(bufs)) == data


def test_one_shot_detection_matches_reference(paradiselost):
    """One-shot inflate() mirrors the reference detection rule exactly:
    zlib only when the first byte is 0x78 (sd-inflate.ts:204-207), so a
    wbits=9 stream (0x18...) is treated as RAW and fails -- parity."""
    wire = zlib.compress(b"x" * 100, 6, wbits=9)
    assert wire[0] != 0x78
    with pytest.raises(ValueError):
        inflate(wire)


def test_gzip_ftext_flag():
    data = b"plain text content here"
    body = zlib.compress(data, 6)[2:-4]
    hdr = struct.pack("<BBBBIBB", 0x1F, 0x8B, 8, 0x01, 0, 0, 3)  # FTEXT
    wire = hdr + body + struct.pack("<II", zlib.crc32(data), len(data))
    inf = Inflater()
    bufs = inf.append(wire)
    r = inf.finish()
    assert r.success
    assert bytes(tpuzlib.mergeBuffers(bufs)) == data


def test_gzip_reserved_flags_rejected():
    hdr = struct.pack("<BBBBIBB", 0x1F, 0x8B, 8, 0x40, 0, 0, 3)
    with pytest.raises(ValueError, match="header flags"):
        Inflater().append(hdr + b"\x03\x00" + b"\x00" * 8)


def test_trailing_garbage_after_stream(paradiselost):
    """Bytes after the trailer don't break the verdict (reference keeps
    decoding state at DONE)."""
    wire = zlib.compress(paradiselost[:1000], 6) + b"GARBAGE TRAILING DATA"
    inf = Inflater()
    bufs = inf.append(wire)
    r = inf.finish()
    assert r.success and r.checksum == "match"
    assert bytes(tpuzlib.mergeBuffers(bufs)) == paradiselost[:1000]


def test_stored_only_stream(rng):
    """Level-0 zlib output (stored blocks only) decodes."""
    data = rng.integers(0, 256, 200000, dtype=np.uint8).tobytes()
    wire = zlib.compress(data, 0)
    assert bytes(inflate(wire)) == data


def test_max_distance_and_length(rng):
    """Matches at distance 32768 and length 258 survive the round trip."""
    block = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    data = block + bytes(31768) + block  # dist 32768 candidates
    wire = zlib.compress(data, 9)
    assert bytes(inflate(wire)) == data
    ours = tpuzlib.deflate(data, level=9)
    assert zlib.decompress(bytes(ours)) == data


def test_deflate64_like_big_stored(rng):
    """Stored blocks at the 65535 limit chain correctly both directions."""
    data = rng.integers(0, 256, 200000, dtype=np.uint8).tobytes()
    ours = tpuzlib.deflate(data, level=1)
    assert zlib.decompress(bytes(ours)) == data


def test_totals_and_telemetry(paradiselost):
    """total_in/total_out parity (zstream.ts:24,30) + stage telemetry."""
    from tpuzlib.utils import trace

    trace.reset()
    trace.enable(True)
    try:
        d = tpuzlib.Deflater(level=6)
        bufs = d.append(paradiselost)
        bufs += d.finish()
        assert d.total_in == len(paradiselost)
        assert d.total_out == sum(len(b) for b in bufs)
        inf = Inflater()
        obufs = inf.append(tpuzlib.mergeBuffers(bufs))
        inf.finish()
        assert inf.total_in == d.total_out
        assert inf.total_out == len(paradiselost)
        t = trace.get_telemetry()
        assert t["deflate.append"]["bytes"] == len(paradiselost)
        assert t["inflate.append"]["calls"] == 1
    finally:
        trace.enable(False)
        trace.reset()
