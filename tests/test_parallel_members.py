"""Gzip member sharding (BASELINE config 5, host/thread flavor)."""

import gzip
import zlib

import numpy as np
import pytest

from tpuzlib.parallel.members import compress_members, decompress_members


def test_members_roundtrip(paradiselost):
    data = (paradiselost * 8)[: 3 << 20]
    wire, idx = compress_members(data, level=6, member_size=1 << 20)
    assert len(idx) == 3
    # interop: stdlib reads concatenated members
    assert gzip.decompress(bytes(wire)) == data
    out, crc = decompress_members(wire, idx)
    assert bytes(out) == data
    assert crc == zlib.crc32(data)
    # sequential member-boundary discovery (no index)
    out2, crc2 = decompress_members(wire)
    assert bytes(out2) == data and crc2 == crc


def test_members_single(paradiselost):
    wire, idx = compress_members(paradiselost[:10000], member_size=1 << 20)
    assert len(idx) == 1
    out, crc = decompress_members(wire, idx, verify=True)
    assert bytes(out) == paradiselost[:10000]


def test_members_external_input(rng):
    """Members produced by stdlib gzip decode through our member API."""
    parts = [rng.integers(0, 256, n, dtype=np.uint8).tobytes() for n in (1000, 50000, 7)]
    wire = b"".join(gzip.compress(p, 6) for p in parts)
    out, crc = decompress_members(wire)
    whole = b"".join(parts)
    assert bytes(out) == whole and crc == zlib.crc32(whole)
