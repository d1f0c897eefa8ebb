"""Shared helpers: buffer coercion, merge, constants.

Capability parity with reference src/common.ts (u8ArrayFromBufferSource
common.ts:102-114, mergeBuffers common.ts:116-126, header constants
common.ts:45-49) — redesigned for numpy byte views rather than JS
BufferSource.
"""

from __future__ import annotations

import numpy as np

# Container constants (RFC 1950 / RFC 1952)
PRESET_DICT = 0x20
Z_DEFLATED = 8
GZIP_ID1 = 0x1F
GZIP_ID2 = 0x8B

MIN_MATCH = 3
MAX_MATCH = 258
WINDOW_SIZE = 1 << 15  # 32 KiB DEFLATE window


def u8_view(data) -> np.ndarray:
    """Coerce any bytes-like / buffer / ndarray input to a uint8 ndarray view.

    Accepts bytes, bytearray, memoryview, array.array, and numpy arrays of
    any dtype (reinterpreted as raw bytes, mirroring the reference's
    acceptance of any ArrayBufferView).
    """
    if isinstance(data, np.ndarray):
        if data.dtype == np.uint8 and data.ndim == 1:
            return data
        return np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    if isinstance(data, (bytes, bytearray, memoryview)):
        return np.frombuffer(data, dtype=np.uint8)
    try:
        mv = memoryview(data).cast("B")
        return np.frombuffer(mv, dtype=np.uint8)
    except TypeError:
        raise TypeError(
            "expected a bytes-like object or ndarray, got %r" % type(data).__name__
        )


def mergeBuffers(buffers) -> np.ndarray:
    """Concatenate a list of byte buffers into one uint8 array.

    Parity with reference common.ts:116-126.
    """
    views = [u8_view(b) for b in buffers]
    if not views:
        return np.empty(0, dtype=np.uint8)
    return np.concatenate(views)
