"""Round-2 parity + robustness fixes.

Covers: trailing-garbage detection after stream end (sd-inflate.ts:130-132),
FDICT verification in the speculative container path (inflate.ts:475-503),
the 32K-1 inflate-dictionary clip (inflate.ts:489-492), the logged (not
silent) speculative fallback, native overflow-resume (no re-decode), and
numpy/native checksum parity.
"""

import logging
import zlib

import numpy as np
import pytest

import tpuzlib


def test_trailing_garbage_after_stream_end():
    wire = tpuzlib.deflate(b"hello trailing garbage world", level=6)
    inf = tpuzlib.Inflater()
    inf.append(wire)
    with pytest.raises(ValueError, match="inflate error: bad input data"):
        inf.append(b"\x01\x02\x03\x04")


def test_trailing_garbage_same_append_ok():
    # garbage arriving in the SAME append as the trailer is ignored
    # (reference only throws when an append consumes nothing)
    data = b"hello trailing garbage world"
    wire = bytes(tpuzlib.deflate(data, level=6)) + b"\xde\xad\xbe\xef"
    inf = tpuzlib.Inflater()
    out = inf.append(wire)
    res = inf.finish()
    assert res.success
    assert bytes(np.concatenate(out)) == data


def test_gzip_trailing_garbage_after_done():
    wire = tpuzlib.deflate(b"abc" * 100, level=6, format="gzip")
    inf = tpuzlib.Inflater()
    inf.append(wire)
    with pytest.raises(ValueError, match="bad input data"):
        inf.append(b"xx")


def _zlib_dict_stream(data: bytes, dictionary: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_DEFAULT_STRATEGY,
                         dictionary)
    return c.compress(data) + c.flush()


def test_speculative_container_fdict_required():
    from tpuzlib.parallel.speculative import inflate_parallel_container

    dictionary = b"the quick brown fox " * 20
    data = b"the quick brown fox jumps over the lazy dog " * 50
    wire = _zlib_dict_stream(data, dictionary)
    with pytest.raises(ValueError, match="Custom dictionary required"):
        inflate_parallel_container(wire)
    with pytest.raises(ValueError, match="not valid"):
        inflate_parallel_container(
            wire, dictionary=np.frombuffer(b"wrong dict!!", np.uint8)
        )
    out = inflate_parallel_container(
        wire, dictionary=np.frombuffer(dictionary, np.uint8)
    )
    assert bytes(out) == data


def test_inflate_dictionary_clip_32k_minus_1():
    from tpuzlib.codec.engine import RawInflateEngine

    big = np.arange(70000, dtype=np.uint32).astype(np.uint8)
    eng = RawInflateEngine(dictionary=big)
    assert len(eng.window) == (1 << 15) - 1
    assert bytes(eng.window) == bytes(big[-((1 << 15) - 1):])
    eng2 = RawInflateEngine()
    eng2.set_dictionary(big)
    assert len(eng2.window) == (1 << 15) - 1


def test_forced_speculative_dispatch_roundtrip(monkeypatch):
    monkeypatch.setenv("TPUZLIB_SPECULATIVE", "1")
    data = (b"speculative dispatch coverage " * 4000)
    wire = tpuzlib.deflate(data, level=6, format="gzip")
    out = tpuzlib.inflate(wire)
    assert bytes(out) == data


def test_forced_speculative_dict_semantics(monkeypatch):
    # reference semantics must not change under the parallel dispatch
    monkeypatch.setenv("TPUZLIB_SPECULATIVE", "1")
    dictionary = b"semantics " * 40
    data = b"semantics preserved under dispatch " * 100
    wire = _zlib_dict_stream(data, dictionary)
    with pytest.raises(ValueError, match="Custom dictionary required"):
        tpuzlib.inflate(wire)
    out = tpuzlib.inflate(wire, dictionary=np.frombuffer(dictionary, np.uint8))
    assert bytes(out) == data


def test_speculative_fallback_logs(monkeypatch, caplog):
    # a non-verdict failure in the parallel path must fall back with a
    # WARNING, never silently
    monkeypatch.setenv("TPUZLIB_SPECULATIVE", "1")

    import tpuzlib.parallel.speculative as spec

    def boom(*a, **k):
        raise RuntimeError("injected failure")

    monkeypatch.setattr(spec, "inflate_parallel", boom)
    data = b"fallback logging " * 200
    wire = tpuzlib.deflate(data, level=6)
    with caplog.at_level(logging.WARNING, logger="tpuzlib"):
        out = tpuzlib.inflate(wire)
    assert bytes(out) == data
    assert any("speculative inflate failed" in r.message for r in caplog.records)


def test_native_overflow_resume_high_ratio():
    # compression ratio >> 4 forces the output buffer to overflow; the
    # native decoder must RESUME (persistent C state), and the result must
    # still be exact
    from tpuzlib.native.bindings import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    from tpuzlib.native import api as native_api

    data = bytes(8 << 20)  # 8 MiB of zeros: ratio ~1000x
    raw = zlib.compress(data, 6)[2:-4]
    out, consumed, status = native_api.inflate_raw(
        np.frombuffer(raw, np.uint8)
    )
    assert status == native_api.STATUS_OK
    assert len(out) == len(data)
    assert not out.any()


def test_native_overflow_resume_structured():
    from tpuzlib.native.bindings import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    # structured repeating data with long-range matches across the resume
    # boundary exercises the carried 32K window
    block = bytes(range(256)) * 16
    data = block * 2048  # 8 MiB, ratio >> 4
    wire = zlib.compress(data, 9)
    out = tpuzlib.inflate(wire)
    assert bytes(out) == data


@pytest.mark.parametrize("n", [0, 1, 63, 4096, 100001])
def test_checksum_numpy_native_parity(monkeypatch, rng, n):
    # the vectorized-numpy bodies are the algorithmic reference for the
    # device kernels; keep them from drifting while the native path is the
    # default (ADVICE.md round 1)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    import tpuzlib.native.bindings as bindings

    monkeypatch.setattr(bindings, "get_lib", lambda: None)
    from tpuzlib.kernels.adler32 import adler32_host
    from tpuzlib.kernels.crc32 import crc32_host

    assert adler32_host(data) == zlib.adler32(data.tobytes())
    assert crc32_host(data) == zlib.crc32(data.tobytes())
    seed_a = zlib.adler32(b"seed material")
    seed_c = zlib.crc32(b"seed material")
    assert adler32_host(data, seed_a) == zlib.adler32(data.tobytes(), seed_a)
    assert crc32_host(data, seed_c) == zlib.crc32(data.tobytes(), seed_c)
