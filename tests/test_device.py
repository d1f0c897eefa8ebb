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
    words, nbits, ok = jax.jit(fn)(*args)
    assert np.asarray(ok).all() and (np.asarray(nbits) > 0).all()
    g.dryrun_multichip(min(8, len(jax.devices())))


def test_fully_jit_dynamic_encoder():
    """make_encode_chunk_dynamic: trees + header + body entirely on
    device; output must be a valid dynamic DEFLATE block and no larger
    than zlib at the same level."""
    import jax.numpy as jnp

    from tpuzlib.codec.bitsink import BitSink
    from tpuzlib.kernels.deflate_device import make_encode_chunk_dynamic

    ctx, n = 1 << 12, 1 << 15
    enc = make_encode_chunk_dynamic(6, n, ctx=ctx)
    for payload in (
        TEXT[:n],
        np.random.default_rng(5).integers(0, 256, n, np.uint8).tobytes(),
        b"\x00" * n,
    ):
        data = np.zeros(ctx + n, np.uint8)
        data[ctx:] = np.frombuffer(payload, np.uint8)
        words, bits = enc(jnp.asarray(data), np.int32(0), np.int32(n), np.int32(1))
        w, b = np.asarray(words), int(bits)
        sink = BitSink()
        if b >> 5:
            sink.push(w[: b >> 5].astype(np.uint64), np.full(b >> 5, 32, np.int64))
        if b & 31:
            sink.push_scalar(int(w[b >> 5]) & ((1 << (b & 31)) - 1), b & 31)
        raw, _, _ = sink.flush(final=True)
        assert zlib.decompress(bytes(raw), -15) == payload


def test_device_package_merge_matches_host(rng):
    """Device package-merge lengths must satisfy Kraft and match the host
    optimum's total cost."""
    import jax
    import jax.numpy as jnp

    from tpuzlib.codec.huffman_encode import package_merge
    from tpuzlib.kernels.huffman_device import package_merge_device

    for trial in range(6):
        freqs = rng.integers(0, 1000, 286, np.int64)
        freqs[rng.integers(0, 286, 100)] = 0
        dev = np.asarray(
            package_merge_device(jax, jnp, jnp.asarray(freqs.astype(np.int32)), 15)
        )
        host = package_merge(freqs, 15)
        kraft = (1 << 15) * np.sum(np.where(dev > 0, 2.0 ** (-dev.astype(float)), 0))
        assert kraft <= (1 << 15) + 1e-6
        cost_dev = int((freqs * dev).sum())
        cost_host = int((freqs * host).sum())
        assert cost_dev == cost_host, (trial, cost_dev, cost_host)


def test_device_fully_jit_stream(mixed_data):
    """dynamic="device": multi-chunk stream from the zero-host-sync
    encoder must decode externally."""
    from tpuzlib.kernels.deflate_device import deflate_device_raw

    raw = deflate_device_raw(
        np.frombuffer(mixed_data[:100000], np.uint8), level=4, chunk=1 << 15,
        dynamic="device",
    )
    assert zlib.decompress(bytes(raw), -15) == mixed_data[:100000]


@pytest.mark.parametrize("ndev", [3, 5, 7])
def test_sharded_deflate_odd_device_counts(ndev):
    import jax

    from tpuzlib.parallel import make_mesh, sharded_deflate

    if len(jax.devices()) < ndev:
        pytest.skip("needs %d virtual devices" % ndev)
    mesh = make_mesh(ndev)
    data = np.frombuffer(TEXT[: ndev * 8192], np.uint8)
    out, adler, crc = sharded_deflate(data, mesh, level=4)
    assert zlib.decompress(bytes(out)) == data.tobytes()
    assert adler == zlib.adler32(data.tobytes())
    assert crc == zlib.crc32(data.tobytes())


def test_sharded_deflate_arbitrary_lengths():
    """v2 sharded path: any input length; padding never reaches output
    and checksums cover exactly the valid bytes."""
    import zlib

    from tpuzlib.parallel import make_mesh, sharded_deflate

    mesh = make_mesh(8, platform="cpu")
    rng = np.random.default_rng(5)
    base = rng.integers(0, 40, 1 << 16, dtype=np.uint8)
    for n in (50000, 12345, 63, 8 * 4096 - 1, 40000):
        data = np.ascontiguousarray(base[:n])
        out, adler, crc = sharded_deflate(data, mesh, level=6)
        dec = zlib.decompress(bytes(out))
        assert dec == data.tobytes()
        assert adler == zlib.adler32(data.tobytes())
        assert crc == zlib.crc32(data.tobytes())


def test_sharded_deflate_dynamic_beats_static():
    """Dynamic-tree mesh blocks must compress text tighter than the
    static-tree path."""
    from tpuzlib.parallel import make_mesh, sharded_deflate

    mesh = make_mesh(4, platform="cpu")
    text = np.frombuffer(
        open("/root/reference/test/paradiselost.txt", "rb").read()[: 1 << 16],
        np.uint8,
    )
    out_dyn, _, _ = sharded_deflate(text, mesh, level=6, dynamic=True)
    out_sta, _, _ = sharded_deflate(text, mesh, level=6, dynamic=False)
    import zlib

    assert zlib.decompress(bytes(out_dyn)) == text.tobytes()
    assert zlib.decompress(bytes(out_sta)) == text.tobytes()
    assert len(out_dyn) < len(out_sta)
