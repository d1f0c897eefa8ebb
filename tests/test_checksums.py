"""Checksum tests: oracle is Python's zlib (same math as reference
src/adler32.ts / src/crc32.ts — verified by the reference's own corpus)."""

import zlib

import numpy as np
import pytest

from tpuzlib.api import checksums
from tpuzlib.kernels import adler32 as adler_k
from tpuzlib.kernels import crc32 as crc_k

LENGTHS = [0, 1, 2, 3, 7, 8, 255, 256, 257, 1000, 4096, 5551, 5552, 5553, 65536, 300001]


def _data(rng, n):
    return rng.integers(0, 256, size=n, dtype=np.uint8)


@pytest.mark.parametrize("n", LENGTHS)
def test_adler32_host(rng, n):
    d = _data(rng, n)
    assert adler_k.adler32_host(d) == zlib.adler32(d.tobytes())


@pytest.mark.parametrize("n", LENGTHS)
def test_crc32_host(rng, n):
    d = _data(rng, n)
    assert crc_k.crc32_host(d) == zlib.crc32(d.tobytes())


@pytest.mark.parametrize("n", [0, 1, 1023, 1024, 1025, 4096, 100000, 300001])
def test_adler32_device(rng, n):
    d = _data(rng, n)
    assert adler_k.adler32_device(d) == zlib.adler32(d.tobytes())


@pytest.mark.parametrize("n", [0, 1, 1023, 1024, 1025, 4096, 100000, 300001])
def test_crc32_device(rng, n):
    d = _data(rng, n)
    assert crc_k.crc32_device(d) == zlib.crc32(d.tobytes())


@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF, 0xFFFFFFFF, 12345])
def test_seeds(rng, seed):
    d = _data(rng, 10000)
    b = d.tobytes()
    assert crc_k.crc32_host(d, seed) == zlib.crc32(b, seed)
    assert crc_k.crc32_device(d, seed) == zlib.crc32(b, seed)
    assert adler_k.adler32_host(d, seed) == zlib.adler32(b, seed)
    assert adler_k.adler32_device(d, seed) == zlib.adler32(b, seed)


def test_chaining(rng):
    """Reference README.md:151-161 chaining contract: feed previous result
    as next seed."""
    chunks = [_data(rng, n) for n in [100, 5000, 1, 0, 70000]]
    a, c = 1, 0
    for ch in chunks:
        a = checksums.adler32(ch, a)
        c = checksums.crc32(ch, c)
    whole = b"".join(ch.tobytes() for ch in chunks)
    assert a == zlib.adler32(whole)
    assert c == zlib.crc32(whole)


def test_combine(rng):
    """Associative shard combine — the multi-chip merge primitive."""
    d1, d2 = _data(rng, 33333), _data(rng, 77777)
    whole = d1.tobytes() + d2.tobytes()
    c = crc_k.crc32_combine(
        crc_k.crc32_host(d1), crc_k.crc32_host(d2), len(d2)
    )
    assert c == zlib.crc32(whole)
    a = adler_k.adler32_combine(
        adler_k.adler32_host(d1), adler_k.adler32_host(d2), len(d2)
    )
    assert a == zlib.adler32(whole)


def test_corpus_checksums(paradiselost):
    d = np.frombuffer(paradiselost, dtype=np.uint8)
    assert crc_k.crc32_host(d) == zlib.crc32(paradiselost)
    assert adler_k.adler32_host(d) == zlib.adler32(paradiselost)
    assert crc_k.crc32_device(d) == zlib.crc32(paradiselost)
    assert adler_k.adler32_device(d) == zlib.adler32(paradiselost)


def test_public_api_types(rng):
    d = _data(rng, 1000)
    # accepts bytes, bytearray, memoryview, ndarray of any dtype
    assert checksums.crc32(d.tobytes()) == zlib.crc32(d.tobytes())
    assert checksums.crc32(bytearray(d.tobytes())) == zlib.crc32(d.tobytes())
    assert checksums.crc32(memoryview(d.tobytes())) == zlib.crc32(d.tobytes())
    f32 = rng.random(256, dtype=np.float32)
    assert checksums.crc32(f32) == zlib.crc32(f32.tobytes())
    assert checksums.adler32(f32) == zlib.adler32(f32.tobytes())


def test_crc32_pallas_kernel(rng):
    """Fused unpack+matmul Pallas kernel (interpret mode on CPU) must
    agree with zlib and with the jnp device path's linear forms."""
    from tpuzlib.kernels import crc32 as crc_k
    from tpuzlib.kernels.crc32_pallas import BLOCK, TILE, crc32_device_pallas

    for n in (BLOCK * TILE, BLOCK * TILE * 2 + 12345, 100):
        d = rng.integers(0, 256, n, dtype=np.uint8)
        assert crc32_device_pallas(d) == zlib.crc32(d.tobytes())
        assert crc32_device_pallas(d, seed=77) == zlib.crc32(d.tobytes(), 77)


def test_adler32_pallas_kernel(rng):
    """Fused nibble-split+matmul Pallas kernel (interpret mode on CPU)
    must agree with zlib across block-boundary sizes and seeds."""
    from tpuzlib.kernels.adler32_pallas import BLOCK, TILE, adler32_device_pallas

    for n in (BLOCK * TILE, BLOCK * TILE * 2 + 12345, 100, BLOCK + 1):
        d = rng.integers(0, 256, n, dtype=np.uint8)
        assert adler32_device_pallas(d) == zlib.adler32(d.tobytes())
        seed = zlib.adler32(b"prefix bytes")
        assert adler32_device_pallas(d, seed=seed) == zlib.adler32(
            d.tobytes(), seed
        )


def test_checksum_device_jit_scalars(rng):
    """Fully-on-device jit entry points (Pallas forms + in-jit combine)
    must return device scalars that agree with zlib — these are the
    loop-differencing device-time forms used by bench.py."""
    import jax.numpy as jnp

    from tpuzlib.kernels.adler32_pallas import adler32_device_jit
    from tpuzlib.kernels.crc32_pallas import crc32_device_jit

    for n in (300_000, 1 << 19):
        d = rng.integers(0, 256, n, dtype=np.uint8)
        dd = jnp.asarray(d)
        assert int(crc32_device_jit(dd)) == zlib.crc32(d.tobytes())
        assert int(adler32_device_jit(dd)) == zlib.adler32(d.tobytes())
