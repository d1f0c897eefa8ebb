"""Device-kernel tests (run on the CPU jax backend; same jit code paths
as TPU) and mesh-sharded pipeline tests on 8 virtual devices."""

import sys
import zlib

import numpy as np
import pytest

TEXT = (b"the quick brown fox jumps over the lazy dog. " * 4000)[:131072]


@pytest.fixture(scope="module")
def mixed_data(rng=None):
    r = np.random.default_rng(3)
    parts = [
        TEXT[:50000],
        r.integers(0, 256, 30000, dtype=np.uint8).tobytes(),
        b"\x00" * 20000,
        TEXT[:31072],
    ]
    return b"".join(parts)


def test_device_deflate_static_roundtrip(mixed_data):
    from tpuzlib.kernels.deflate_device import deflate_device_raw

    raw = deflate_device_raw(
        np.frombuffer(mixed_data, np.uint8), level=4, chunk=1 << 16, dynamic=False
    )
    assert zlib.decompress(bytes(raw), -15) == mixed_data


def test_device_deflate_dynamic_roundtrip_and_size(mixed_data):
    from tpuzlib.kernels.deflate_device import deflate_device_raw

    raw = deflate_device_raw(
        np.frombuffer(mixed_data, np.uint8), level=4, chunk=1 << 16, dynamic=True
    )
    assert zlib.decompress(bytes(raw), -15) == mixed_data
    # dynamic trees must beat static on this data
    raw_static = deflate_device_raw(
        np.frombuffer(mixed_data, np.uint8), level=4, chunk=1 << 16, dynamic=False
    )
    assert len(raw) < len(raw_static)


def test_device_inflate_roundtrip(mixed_data):
    from tpuzlib.kernels.inflate_device import inflate_device_raw

    wire = zlib.compress(mixed_data, 6)[2:-4]
    out = inflate_device_raw(np.frombuffer(wire, np.uint8))
    assert bytes(out) == mixed_data


def test_device_inflate_overflow_retry():
    """Ultra-compressible data exceeds the per-segment output cap and
    must fall back to the smaller probe."""
    from tpuzlib.kernels.inflate_device import inflate_device_raw

    data = b"\x00" * 3_000_000
    wire = zlib.compress(data, 9)[2:-4]
    out = inflate_device_raw(np.frombuffer(wire, np.uint8))
    assert bytes(out) == data


def test_device_inflate_decodes_device_deflate(mixed_data):
    from tpuzlib.kernels.deflate_device import deflate_device_raw
    from tpuzlib.kernels.inflate_device import inflate_device_raw

    raw = deflate_device_raw(np.frombuffer(mixed_data, np.uint8), level=6,
                             chunk=1 << 16)
    out = inflate_device_raw(np.frombuffer(bytes(raw), np.uint8))
    assert bytes(out) == mixed_data


def test_device_dictionary_context():
    """Chunk halos: matches must reach across chunk boundaries."""
    from tpuzlib.kernels.deflate_device import deflate_device_raw

    data = TEXT[:100000]
    raw_chunked = deflate_device_raw(np.frombuffer(data, np.uint8), level=6,
                                     chunk=1 << 15)
    assert zlib.decompress(bytes(raw_chunked), -15) == data


# --- sharded pipeline -------------------------------------------------------


def test_sharded_deflate_8dev():
    import jax

    from tpuzlib.parallel import make_mesh, sharded_deflate

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh()
    data = np.frombuffer(TEXT[: 8 * 16384], np.uint8)
    out, adler, crc = sharded_deflate(data, mesh, level=6)
    assert zlib.decompress(bytes(out)) == data.tobytes()
    assert adler == zlib.adler32(data.tobytes())
    assert crc == zlib.crc32(data.tobytes())


def test_sharded_checksum_combine_random():
    import jax

    from tpuzlib.parallel import make_mesh, sharded_deflate

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(4)
    r = np.random.default_rng(11)
    data = r.integers(0, 256, 4 * 4096, dtype=np.uint8)
    out, adler, crc = sharded_deflate(data, mesh, level=1)
    assert adler == zlib.adler32(data.tobytes())
    assert crc == zlib.crc32(data.tobytes())
    assert zlib.decompress(bytes(out)) == data.tobytes()


def test_graft_entry():
    sys.path.insert(0, "/root/repo")
    import importlib

    import __graft_entry__ as g

    importlib.reload(g)
    import jax

    fn, args = g.entry()
    words, nbits = jax.jit(fn)(*args)
    assert int(nbits) > 0
    g.dryrun_multichip(min(8, len(jax.devices())))
