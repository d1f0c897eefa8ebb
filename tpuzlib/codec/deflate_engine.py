"""Streaming deflate engine: chunking, window carry, block splitting.

Parity with reference src/deflate.ts drive loop (:1218-1327) and the
16K-symbol block flush policy (lit_bufsize, deflate.ts:90-95,
_tr_tally flush :488-524) — redesigned around large vectorized chunks:
each chunk is match-searched in one data-parallel pass with the previous
32 KiB as halo context, then split into <=16K-symbol blocks for Huffman
adaptivity.
"""

from __future__ import annotations

import numpy as np

from .bitsink import BitSink
from .deflate_blocks import emit_block
from .lz77 import tokenize_chunk
from .tables import WINDOW_SIZE

BLOCK_SYMBOLS = 1 << 14  # symbols per Huffman block, like zlib lit_bufsize
CHUNK = 1 << 19  # input bytes compressed per vectorized pass
HOLDBACK = 320  # bytes withheld during streaming so matches never lose
#                 lookahead at a chunk boundary (MAX_MATCH + hash margin)


class DeflateEngine:
    """Raw-DEFLATE compressor over appended chunks."""

    def __init__(self, level: int = 6, dictionary: np.ndarray | None = None):
        self.level = level
        self.sink = BitSink()
        self.window = (
            dictionary[-(WINDOW_SIZE - 262) :].astype(np.uint8)
            if dictionary is not None and len(dictionary)
            else np.empty(0, dtype=np.uint8)
        )
        self.pending = np.empty(0, dtype=np.uint8)
        self.finished = False

    def push(self, data: np.ndarray) -> np.ndarray:
        """Add input; returns whatever compressed bytes are ready."""
        if len(data):
            self.pending = (
                np.concatenate([self.pending, data])
                if len(self.pending)
                else data.copy()
            )
        outs = []
        while len(self.pending) >= CHUNK + HOLDBACK:
            outs.append(self._compress(self.pending[:CHUNK], last=False))
            self.pending = self.pending[CHUNK:]
        return (
            np.concatenate(outs) if outs else np.empty(0, dtype=np.uint8)
        )

    def finish(self) -> np.ndarray:
        outs = []
        while len(self.pending) > CHUNK:
            outs.append(self._compress(self.pending[:CHUNK], last=False))
            self.pending = self.pending[CHUNK:]
        outs.append(self._compress(self.pending, last=True))
        self.pending = np.empty(0, dtype=np.uint8)
        self.finished = True
        return np.concatenate(outs)

    def _compress(self, chunk: np.ndarray, last: bool) -> np.ndarray:
        ctx = self.window
        data = np.concatenate([ctx, chunk]) if len(ctx) else chunk
        litlen, dist = tokenize_chunk(data, len(ctx), self.level)

        if len(litlen) == 0:
            # empty input: still must emit a (last) block
            if last:
                emit_block(
                    self.sink,
                    np.empty(0, np.int32),
                    np.empty(0, np.int32),
                    np.empty(0, np.uint8),
                    True,
                )
        else:
            out_lens = np.where(dist > 0, litlen, 1).astype(np.int64)
            ends = np.cumsum(out_lens)
            nblocks = -(-len(litlen) // BLOCK_SYMBOLS)
            for b in range(nblocks):
                lo = b * BLOCK_SYMBOLS
                hi = min(lo + BLOCK_SYMBOLS, len(litlen))
                raw_lo = 0 if lo == 0 else int(ends[lo - 1])
                raw_hi = int(ends[hi - 1])
                emit_block(
                    self.sink,
                    litlen[lo:hi],
                    dist[lo:hi],
                    chunk[raw_lo:raw_hi],
                    last and hi == len(litlen),
                )

        self.window = (
            np.concatenate([self.window, chunk])[-WINDOW_SIZE:]
            if len(chunk) < WINDOW_SIZE
            else chunk[-WINDOW_SIZE:].copy()
        )
        out, _, _ = self.sink.flush(final=last)
        return out
