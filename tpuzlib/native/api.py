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
    6: (48, 24, 96, 1),
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
    STATUS_DATA_ERROR.  Output capacity overflows RESUME from the
    persistent C state (no re-decode) via InflateStream.

    The inflate-side dictionary is clipped to the last 32K-1 bytes
    (reference /root/reference/src/inflate.ts:489-492)."""
    dict_arr = (
        np.ascontiguousarray(dictionary[-((1 << 15) - 1):])
        if dictionary is not None and len(dictionary)
        else np.empty(0, dtype=np.uint8)
    )
    stream = InflateStream()
    return stream.push(data, start_bit, dict_arr, size_hint=size_hint)


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
        """Decode from ``start_bit``; ``window`` preloads lookback context.

        On output-capacity overflow the decode RESUMES from the C state at
        the overflow bit position with a larger buffer (the already-decoded
        prefix is kept, never re-decoded — reference streaming-resume
        contract, infblocks.ts:164-179)."""
        data = np.ascontiguousarray(data)
        cap = max(size_hint or 0, 4 * len(data) + (1 << 16))
        bit = start_bit
        win = window
        pieces: list[np.ndarray] = []
        while True:
            wlen = len(win)
            dst = np.empty(wlen + cap, dtype=np.uint8)
            if wlen:
                dst[:wlen] = win
            out_len = ctypes.c_int64(0)
            consumed = ctypes.c_int64(0)
            status = self._lib.tz_inflate_stream(
                self._ptr,
                _p8(data),
                np.int64(len(data)),
                np.int64(bit),
                _p8(dst),
                np.int64(len(dst)),
                np.int64(wlen),
                ctypes.byref(out_len),
                ctypes.byref(consumed),
            )
            produced = dst[wlen : wlen + out_len.value]
            if status == STATUS_OVERFLOW:
                # keep what was decoded, carry the last 32K as window, and
                # resume mid-block from the C state with a larger buffer
                pieces.append(produced.copy())
                win = dst[: wlen + out_len.value][-(1 << 15):].copy()
                bit = consumed.value
                cap *= 2
                continue
            if not pieces:
                return produced, consumed.value, status
            pieces.append(produced)
            return np.concatenate(pieces), consumed.value, status


def tokenize(data: np.ndarray, ctx_len: int, level: int):
    """Native hash-chain LZ77 tokenize; mirrors lz77.tokenize_chunk."""
    from ..codec.emit_native import tokenize_full

    litlen, dist, _, _, _ = tokenize_full(data, ctx_len, level)
    return litlen, dist
