"""Streaming deflate engine: chunking, window carry, block splitting.

Parity with reference src/deflate.ts drive loop (:1218-1327) and the
16K-symbol block flush policy (lit_bufsize, deflate.ts:90-95,
_tr_tally flush :488-524) — redesigned around large vectorized chunks:
each chunk is match-searched in one data-parallel pass with the previous
32 KiB as halo context, then split into <=16K-symbol blocks for Huffman
adaptivity.
"""

from __future__ import annotations

import os
import threading

import numpy as np

from .bitsink import BitSink
from .deflate_blocks import emit_block, emit_block_adaptive, emit_stored
from .lz77 import tokenize_chunk
from .tables import WINDOW_SIZE


def _ncores() -> int:
    try:
        return len(os.sched_getaffinity(0))
    except AttributeError:  # pragma: no cover
        return os.cpu_count() or 1


_executor = None
_executor_lock = threading.Lock()


def get_executor():
    """Process-wide persistent thread pool for chunk compression.

    One pool sized to the available cores: threads (and therefore the
    native layer's per-thread match tables) are reused across pushes —
    a per-call pool re-paid the table alloc every call and leaked its
    thread-local storage at every thread exit."""
    global _executor
    if _executor is None:
        with _executor_lock:
            if _executor is None:
                from concurrent.futures import ThreadPoolExecutor

                _executor = ThreadPoolExecutor(max_workers=_ncores())
    return _executor

# Symbols per Huffman block.  The reference flushes every 16K symbols
# (lit_bufsize, deflate.ts:90-95); with optimal package-merge trees,
# larger blocks amortize the header better AND compress smaller.
BLOCK_SYMBOLS = 1 << 16
CHUNK = 1 << 19  # input bytes compressed per vectorized pass
MIN_PARALLEL_CHUNK = 1 << 16  # smallest chunk worth a thread
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
        if len(self.pending) < CHUNK + HOLDBACK:
            return np.empty(0, dtype=np.uint8)
        n_process = ((len(self.pending) - HOLDBACK) // CHUNK) * CHUNK
        if n_process >= 2 * CHUNK:
            out = self._compress_parallel(self.pending[:n_process], last=False)
            self.pending = self.pending[n_process:]
            return out
        outs = []
        while len(self.pending) >= CHUNK + HOLDBACK:
            outs.append(self._compress(self.pending[:CHUNK], last=False))
            self.pending = self.pending[CHUNK:]
        return (
            np.concatenate(outs) if outs else np.empty(0, dtype=np.uint8)
        )

    def finish(self) -> np.ndarray:
        ncores = _ncores()
        if ncores > 1 and len(self.pending) > 4 * MIN_PARALLEL_CHUNK:
            # split across available cores (halo costs 32K per extra chunk,
            # so don't over-shard small inputs)
            chunk = min(CHUNK, max(MIN_PARALLEL_CHUNK * 2, -(-len(self.pending) // ncores)))
            out = self._compress_parallel(self.pending, last=True, chunk=chunk)
            self.pending = np.empty(0, dtype=np.uint8)
            self.finished = True
            return out
        outs = []
        while len(self.pending) > CHUNK:
            outs.append(self._compress(self.pending[:CHUNK], last=False))
            self.pending = self.pending[CHUNK:]
        outs.append(self._compress(self.pending, last=True))
        self.pending = np.empty(0, dtype=np.uint8)
        self.finished = True
        return np.concatenate(outs)

    def _compress_parallel(
        self, data: np.ndarray, last: bool, chunk: int = CHUNK
    ) -> np.ndarray:
        """Thread-parallel chunk compression (one-shot / large appends).

        The native tokenizer releases the GIL, so chunks tokenize on all
        cores with their 32 KiB halo context; token tapes are then
        Huffman-coded per chunk into separate BitSinks and joined at the
        bit level in stream order — the host mirror of the mesh pipeline
        in parallel/pipeline.py."""
        from .bitsink import BitSink
        from .lz77 import tokenize_chunk
        from .tables import WINDOW_SIZE as W

        nchunks = -(-len(data) // chunk)
        spans = [
            (ci * chunk, min((ci + 1) * chunk, len(data))) for ci in range(nchunks)
        ]

        try:
            from ..native.bindings import native_available

            use_native = native_available()
        except Exception:
            use_native = False
        if use_native:
            from .emit_native import emit_chunk_c, tokenize_full

            def process_span(idx):
                """Tokenize + emit one chunk entirely in C (GIL-free), so
                chunks run truly parallel across threads (persistent pool, so
                per-thread native tables are reused); each result is
                byte-aligned (sync flush / final padding) and concatenates
                directly."""
                lo, hi = spans[idx]
                ctx = self.window if lo == 0 else data[max(0, lo - W) : lo]
                buf = (
                    np.concatenate([ctx, data[lo:hi]])
                    if len(ctx)
                    else data[lo:hi]
                )
                is_last = last and idx == nchunks - 1
                litlen, dist, lf, df, soe = tokenize_full(
                    buf, len(ctx), self.level
                )
                return emit_chunk_c(
                    litlen, dist, lf, df, soe, data[lo:hi], is_last,
                    not is_last,
                )

            if nchunks == 1:
                pieces = [process_span(0)]
            else:
                # run the first span on THIS thread: the caller would
                # otherwise idle while the pool works, wasting one of
                # the few cores and paying dispatch+wake latency
                futs = [
                    get_executor().submit(process_span, i)
                    for i in range(1, nchunks)
                ]
                pieces = [process_span(0)] + [f.result() for f in futs]
            self.window = (
                data[-WINDOW_SIZE:].copy() if len(data) else self.window
            )
            return np.concatenate(pieces)

        def tokenize_span(span):
            lo, hi = span
            if lo == 0:
                ctx = self.window
            else:
                ctx = data[max(0, lo - W) : lo]
            buf = (
                np.concatenate([ctx, data[lo:hi]]) if len(ctx) else data[lo:hi]
            )
            return tokenize_chunk(buf, len(ctx), self.level)

        def emit_span(args):
            """Emit one chunk's blocks into its own byte-aligned bitstream.

            Every non-final chunk ends with an empty stored block (the
            Z_SYNC_FLUSH pattern) so the next chunk starts on a byte
            boundary: stored-block alignment inside any chunk is then
            globally correct, and chunk boundaries become byte-aligned
            resume points for parallel inflate."""
            (lo, hi), tape, is_last = args
            sink = BitSink()
            litlen, dist = tape
            if len(litlen) == 0:
                if is_last:
                    emit_block(
                        sink,
                        np.empty(0, np.int32),
                        np.empty(0, np.int32),
                        np.empty(0, np.uint8),
                        True,
                    )
            else:
                out_lens = np.where(dist > 0, litlen, 1).astype(np.int64)
                ends = np.cumsum(out_lens)
                nb = -(-len(litlen) // BLOCK_SYMBOLS)
                for b in range(nb):
                    blo = b * BLOCK_SYMBOLS
                    bhi = min(blo + BLOCK_SYMBOLS, len(litlen))
                    raw_lo = 0 if blo == 0 else int(ends[blo - 1])
                    raw_hi = int(ends[bhi - 1])
                    emit_block_adaptive(
                        sink,
                        litlen[blo:bhi],
                        dist[blo:bhi],
                        data[lo + raw_lo : lo + raw_hi],
                        is_last and bhi == len(litlen),
                    )
            if not is_last:
                emit_stored(sink, np.empty(0, np.uint8), False)  # sync flush
            return sink.flush(final=is_last)

        ex = get_executor()
        tapes = list(ex.map(tokenize_span, spans))
        jobs = [
            (spans[i], tapes[i], last and i == nchunks - 1)
            for i in range(nchunks)
        ]
        flushed = list(ex.map(emit_span, jobs))

        # join chunk bitstreams in order through the engine's sink
        outs = []
        for body, rem_val, rem_bits in flushed:
            if len(body):
                self.sink.push_bytes(body)
            if rem_bits:
                self.sink.push_scalar(rem_val, rem_bits)
            piece, _, _ = self.sink.flush(final=False)
            if len(piece):
                outs.append(piece)
        final_piece, _, _ = self.sink.flush(final=last)
        if len(final_piece):
            outs.append(final_piece)
        self.window = data[-WINDOW_SIZE:].copy() if len(data) else self.window
        return (
            np.concatenate(outs) if outs else np.empty(0, dtype=np.uint8)
        )

    def _compress(self, chunk: np.ndarray, last: bool) -> np.ndarray:
        ctx = self.window
        data = np.concatenate([ctx, chunk]) if len(ctx) else chunk
        try:
            from ..native.bindings import native_available

            use_native = native_available()
        except Exception:
            use_native = False
        if use_native:
            from .emit_native import emit_chunk_c, tokenize_full

            litlen, dist, lf, df, soe = tokenize_full(data, len(ctx), self.level)
            # sync flush on non-last chunks byte-aligns the boundary so a
            # following parallel batch can assume aligned starts
            out = emit_chunk_c(litlen, dist, lf, df, soe, chunk, last, not last)
            self.window = (
                np.concatenate([self.window, chunk])[-WINDOW_SIZE:]
                if len(chunk) < WINDOW_SIZE
                else chunk[-WINDOW_SIZE:].copy()
            )
            return out
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
                emit_block_adaptive(
                    self.sink,
                    litlen[lo:hi],
                    dist[lo:hi],
                    chunk[raw_lo:raw_hi],
                    last and hi == len(litlen),
                )
        if not last:
            emit_stored(self.sink, np.empty(0, np.uint8), False)  # sync flush

        self.window = (
            np.concatenate([self.window, chunk])[-WINDOW_SIZE:]
            if len(chunk) < WINDOW_SIZE
            else chunk[-WINDOW_SIZE:].copy()
        )
        out, _, _ = self.sink.flush(final=last)
        return out
