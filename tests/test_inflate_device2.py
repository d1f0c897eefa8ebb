"""Cursor-parallel device inflate (kernels/inflate_device2).

Runs on the CPU backend (conftest); the same jit programs serve the TPU.
Oracle: python-zlib compressed streams and our own engine's streams.
"""

import zlib

import numpy as np
import pytest

import tpuzlib
from tpuzlib.kernels.inflate_device2 import inflate_device_v2, _plan_blocks


@pytest.fixture(scope="module")
def paradiselost():
    return open("/root/reference/test/paradiselost.txt", "rb").read()


def _raw(payload):
    return np.ascontiguousarray(np.frombuffer(payload, np.uint8))


def test_plan_discovers_all_blocks(paradiselost):
    wire = bytes(tpuzlib.deflate(paradiselost, level=6))
    plan = _plan_blocks(_raw(wire[2:-4]))
    assert plan is not None
    assert plan[-1][4] is True  # final block found (BFINAL)
    assert not any(p[5] for p in plan)  # no open ends


@pytest.mark.parametrize("device_expand", [True, False])
def test_roundtrip_own_stream(paradiselost, device_expand):
    wire = bytes(tpuzlib.deflate(paradiselost, level=6))
    out = inflate_device_v2(
        _raw(wire[2:-4]), stride_bits=1 << 14, max_cursors=256,
        device_expand=device_expand,
    )
    assert out is not None and bytes(out) == paradiselost


def test_roundtrip_zlib_stream(paradiselost):
    for lvl in (1, 6, 9):
        zc = zlib.compress(paradiselost, lvl)
        out = inflate_device_v2(
            _raw(zc[2:-4]), stride_bits=1 << 14, max_cursors=256
        )
        assert out is not None and bytes(out) == paradiselost, lvl


def test_single_and_fixed_blocks():
    small = zlib.compress(b"hello hello hello world", 6)
    out = inflate_device_v2(_raw(small[2:-4]))
    assert bytes(out) == b"hello hello hello world"
    fx = zlib.compressobj(1, zlib.DEFLATED, -15)
    data = fx.compress(b"abcd" * 64) + fx.flush()
    out = inflate_device_v2(_raw(data))
    assert bytes(out) == b"abcd" * 64


def test_incompressible_decodes_on_device():
    """Stored blocks decode via the transparent byte LUT (round 3) —
    no host fallback (reference inline path: infblocks.ts:243-333)."""
    rng = np.random.default_rng(0)
    blob = rng.integers(0, 256, 1 << 16, dtype=np.uint8).tobytes()
    zc = zlib.compress(blob, 6)  # stored blocks
    out = inflate_device_v2(_raw(zc[2:-4]))
    assert out is not None and bytes(out) == blob


def test_mixed_stored_and_huffman_decodes_on_device(paradiselost):
    """Stored runs hidden behind Huffman blocks (invisible to
    discovery) splice in via the early-EOB host gap walk."""
    rng = np.random.default_rng(5)
    src = (
        paradiselost[:150000]
        + rng.integers(0, 256, 120000, dtype=np.uint8).tobytes()
        + b"\x00" * 50000
        + paradiselost[:100000]
    )
    zc = zlib.compress(src, 6)
    out = inflate_device_v2(_raw(zc[2:-4]), size_hint=len(src) + 1024)
    assert out is not None and bytes(out) == src


def test_dictionary(paradiselost):
    dictionary = paradiselost[:4096]
    c = zlib.compressobj(6, zlib.DEFLATED, -15, zdict=dictionary)
    data = c.compress(paradiselost[4096 : 1 << 17]) + c.flush()
    out = inflate_device_v2(
        _raw(data), dictionary=np.frombuffer(dictionary, np.uint8),
        stride_bits=1 << 14, max_cursors=128,
    )
    if out is not None:
        assert bytes(out) == paradiselost[4096 : 1 << 17]


def test_fuzz_vs_zlib():
    rng = np.random.default_rng(7)
    base = open("/root/reference/test/paradiselost.txt", "rb").read()
    for trial in range(6):
        n = int(rng.integers(2000, 1 << 17))
        off = int(rng.integers(0, len(base) - n))
        blob = base[off : off + n]
        zc = zlib.compress(blob, int(rng.integers(1, 10)))
        out = inflate_device_v2(
            _raw(zc[2:-4]), stride_bits=1 << 13, max_cursors=128
        )
        if out is not None:
            assert bytes(out) == blob, trial


@pytest.mark.parametrize("ndev", [3, 8])
def test_sharded_inflate_mesh(paradiselost, ndev):
    """Multi-chip inflate: cursor tokenize sharded over a CPU mesh."""
    from tpuzlib.parallel import make_mesh, sharded_inflate

    wire = bytes(tpuzlib.deflate(paradiselost, level=6))
    mesh = make_mesh(ndev, platform="cpu")
    out = sharded_inflate(
        _raw(wire[2:-4]), mesh, stride_bits=1 << 14, max_cursors=256
    )
    assert out is not None and bytes(out) == paradiselost
