"""numpy-friendly wrappers over the native library."""

from __future__ import annotations

import ctypes

import numpy as np

from .bindings import get_lib

# level -> (max_chain, max_lazy, nice_len, lazy); effort chosen so output
# is never larger than zlib's at the same level (deeper chains than
# reference defconfig.ts:33-44 at equal level number)
NATIVE_LEVELS = {
    1: (8, 0, 16, 0),
    2: (16, 0, 32, 0),
    3: (32, 0, 64, 0),
    4: (32, 8, 64, 1),
    5: (64, 16, 128, 1),
    6: (96, 32, 258, 1),
    7: (512, 64, 258, 1),
    8: (1024, 258, 258, 1),
    9: (4096, 258, 258, 1),
}

STATUS_OK = 0
STATUS_NEED_MORE = 1
STATUS_DATA_ERROR = 2
STATUS_OVERFLOW = 3


def _p8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _p32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def inflate_raw(
    data: np.ndarray,
    start_bit: int = 0,
    dictionary: np.ndarray | None = None,
    size_hint: int | None = None,
):
    """Serial native raw-DEFLATE decode.

    Returns (out_bytes, consumed_bits, status); status is STATUS_OK,
    STATUS_NEED_MORE (truncated; out contains what was decodable) or
    STATUS_DATA_ERROR.  Grows the output buffer on overflow."""
    lib = get_lib()
    assert lib is not None
    data = np.ascontiguousarray(data)
    dict_arr = (
        np.ascontiguousarray(dictionary[-(1 << 15):])
        if dictionary is not None and len(dictionary)
        else np.empty(0, dtype=np.uint8)
    )
    dict_len = len(dict_arr)
    cap = max(size_hint or 0, 4 * len(data) + (1 << 16))
    while True:
        dst = np.empty(dict_len + cap, dtype=np.uint8)
        if dict_len:
            dst[:dict_len] = dict_arr
        out_len = ctypes.c_int64(0)
        consumed = ctypes.c_int64(0)
        status = lib.tz_inflate_raw(
            _p8(data),
            np.int64(len(data)),
            np.int64(start_bit),
            _p8(dst),
            np.int64(len(dst)),
            np.int64(dict_len),
            ctypes.byref(out_len),
            ctypes.byref(consumed),
        )
        if status == STATUS_OVERFLOW:
            cap *= 4
            continue
        out = dst[dict_len : dict_len + out_len.value]
        return out, consumed.value, status


class InflateStream:
    """Resumable native decoder: Huffman tables + block mode persist in a
    C-side state so streaming appends continue mid-block at symbol
    granularity (the native analog of the reference's suspend/resume
    contract, infblocks.ts:164-179)."""

    def __init__(self):
        import weakref

        lib = get_lib()
        assert lib is not None
        self._lib = lib
        self._ptr = lib.tz_state_new()
        self._finalizer = weakref.finalize(self, lib.tz_state_free, self._ptr)

    def push(
        self,
        data: np.ndarray,
        start_bit: int,
        window: np.ndarray,
        size_hint: int | None = None,
    ):
        data = np.ascontiguousarray(data)
        wlen = len(window)
        cap = max(size_hint or 0, 4 * len(data) + (1 << 16))
        while True:
            dst = np.empty(wlen + cap, dtype=np.uint8)
            if wlen:
                dst[:wlen] = window
            out_len = ctypes.c_int64(0)
            consumed = ctypes.c_int64(0)
            status = self._lib.tz_inflate_stream(
                self._ptr,
                _p8(data),
                np.int64(len(data)),
                np.int64(start_bit),
                _p8(dst),
                np.int64(len(dst)),
                np.int64(wlen),
                ctypes.byref(out_len),
                ctypes.byref(consumed),
            )
            if status == STATUS_OVERFLOW:
                cap *= 4
                continue
            return dst[wlen : wlen + out_len.value], consumed.value, status


def tokenize(data: np.ndarray, ctx_len: int, level: int):
    """Native hash-chain LZ77 tokenize; mirrors lz77.tokenize_chunk."""
    from ..codec.emit_native import tokenize_full

    litlen, dist, _, _, _ = tokenize_full(data, ctx_len, level)
    return litlen, dist
