"""RFC 1951 constant tables (lengths, distances, code-length order, fixed
trees).  Derived from the public DEFLATE specification; capability parity
with reference src/inftree.ts:66-81 (cplens/cplext/cpdist/cpdext) and
src/deftree.ts:269-298 (length/dist code maps)."""

from __future__ import annotations

import numpy as np

MIN_MATCH = 3
MAX_MATCH = 258
WINDOW_SIZE = 1 << 15

# Literal/length alphabet: 0..255 literals, 256 end-of-block, 257..285 lengths
NUM_LITLEN = 288  # two trailing invalid codes in the fixed tree
NUM_DIST = 32  # 30 valid + 2 invalid
EOB = 256

# Length codes 257..285 -> (base, extra bits)
LENGTH_BASE = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51,
     59, 67, 83, 99, 115, 131, 163, 195, 227, 258],
    dtype=np.int32,
)
LENGTH_EXTRA = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4,
     4, 5, 5, 5, 5, 0],
    dtype=np.int32,
)

# Distance codes 0..29 -> (base, extra bits)
DIST_BASE = np.array(
    [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385,
     513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385, 24577],
    dtype=np.int32,
)
DIST_EXTRA = np.array(
    [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10,
     10, 11, 11, 12, 12, 13, 13],
    dtype=np.int32,
)

# Order in which code-length-code lengths are stored in a dynamic header
CLC_ORDER = np.array(
    [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15],
    dtype=np.int32,
)

# Fixed (static) Huffman tree code lengths per RFC 1951 §3.2.6
FIXED_LITLEN_LENGTHS = np.concatenate(
    [
        np.full(144, 8, dtype=np.int32),  # 0..143
        np.full(112, 9, dtype=np.int32),  # 144..255
        np.full(24, 7, dtype=np.int32),  # 256..279
        np.full(8, 8, dtype=np.int32),  # 280..287
    ]
)
# all 32 distance codes participate in the fixed tree; 30-31 are invalid
# if they ever appear in the stream (RFC 1951 §3.2.6)
FIXED_DIST_LENGTHS = np.full(32, 5, dtype=np.int32)


def length_to_code(length: np.ndarray) -> np.ndarray:
    """Match length (3..258) -> length code (257..285), vectorized."""
    return _LENGTH_CODE_LUT[np.asarray(length) - MIN_MATCH] + 257


def dist_to_code(dist: np.ndarray) -> np.ndarray:
    """Match distance (1..32768) -> distance code (0..29), vectorized."""
    d = np.asarray(dist)
    small = _DIST_CODE_LUT[np.minimum(d - 1, 255)]
    large = _DIST_CODE_LUT[256 + np.minimum((d - 1) >> 7, 255)]
    return np.where(d <= 256, small, large)


def _build_length_code_lut() -> np.ndarray:
    lut = np.zeros(256, dtype=np.int32)
    for code in range(29):
        base = LENGTH_BASE[code] - MIN_MATCH
        span = 1 << LENGTH_EXTRA[code]
        lut[base : base + span] = code
    lut[255] = 28  # length 258 -> code 285
    return lut


def _build_dist_code_lut() -> np.ndarray:
    # first 256 entries: dist-1 for dist 1..256; next 256: (dist-1)>>7 for larger
    lut = np.zeros(512, dtype=np.int32)
    for code in range(16):
        base = DIST_BASE[code] - 1
        span = 1 << DIST_EXTRA[code]
        lut[base : base + span] = code
    for code in range(16, 30):
        lo = (DIST_BASE[code] - 1) >> 7
        hi = (DIST_BASE[code] - 1 + (1 << DIST_EXTRA[code]) - 1) >> 7
        lut[256 + lo : 256 + hi + 1] = code
    return lut


_LENGTH_CODE_LUT = _build_length_code_lut()
_DIST_CODE_LUT = _build_dist_code_lut()
