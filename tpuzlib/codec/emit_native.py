"""Native-accelerated block emission.

Couples the C tokenizer's per-stripe symbol histograms with the C bit
emitter: Python only builds trees (package-merge over 286-entry
histograms) and writes small headers; all O(tokens) work stays in C.
Adaptive block splitting works on stripe prefix sums, so split decisions
cost O(symbols), not O(tokens).
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import huffman_encode as he
from .bitsink import BitSink
from .deflate_blocks import (
    MAX_STORED,
    _body_cost,
    build_dynamic_trees,
    emit_stored,
)
from .tables import FIXED_DIST_LENGTHS, FIXED_LITLEN_LENGTHS

STRIPE_TOKENS = 8192


def tokenize_full(data: np.ndarray, ctx_len: int, level: int):
    """Native tokenize returning tape + stripe histograms + out offsets."""
    from ..native.api import NATIVE_LEVELS, _p32, _p8
    from ..native.bindings import get_lib

    lib = get_lib()
    data = np.ascontiguousarray(data)
    n_new = len(data) - ctx_len
    if n_new <= 0:
        z = np.zeros((1, 286), np.int32)
        return (
            np.empty(0, np.int32),
            np.empty(0, np.int32),
            z,
            np.zeros((1, 30), np.int32),
            np.zeros(1, np.int64),
        )
    nstripes = (n_new + 1 + STRIPE_TOKENS - 1) // STRIPE_TOKENS
    litlen = np.empty(n_new + 1, dtype=np.int32)
    dist = np.empty(n_new + 1, dtype=np.int32)
    lit_freq = np.zeros((nstripes, 286), dtype=np.int32)
    dist_freq = np.zeros((nstripes, 30), dtype=np.int32)
    stripe_out_end = np.zeros(nstripes, dtype=np.int64)
    chain, lazy_thresh, nice, lazy = NATIVE_LEVELS[level]
    ntok = lib.tz_deflate_tokenize(
        _p8(data), np.int64(len(data)), np.int64(ctx_len),
        chain, lazy_thresh, nice, lazy,
        _p32(litlen), _p32(dist),
        _p32(lit_freq.reshape(-1)), _p32(dist_freq.reshape(-1)),
        stripe_out_end.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.int64(STRIPE_TOKENS),
    )
    used = max(1, -(-int(ntok) // STRIPE_TOKENS))
    # stripes with no tokens keep out_end 0; make the prefix monotone
    soe = stripe_out_end[:used]
    np.maximum.accumulate(soe, out=soe)
    return litlen[:ntok], dist[:ntok], lit_freq[:used], dist_freq[:used], soe


def emit_chunk_c(
    litlen: np.ndarray,
    dist: np.ndarray,
    lf: np.ndarray,
    df: np.ndarray,
    soe: np.ndarray,
    raw: np.ndarray,
    last: bool,
    sync_flush: bool,
) -> np.ndarray:
    """Whole-chunk emit in one GIL-free native call (tz_emit_chunk): trees,
    headers, adaptive splitting and bit packing all happen in C; the result
    is byte-aligned (sync flush or final padding), so chunks concatenate
    directly.  Mirrors emit_chunk_native (the numpy reference path)."""
    from ..native.api import _p8, _p32
    from ..native.bindings import get_lib

    lib = get_lib()
    litlen = np.ascontiguousarray(litlen, np.int32)
    dist = np.ascontiguousarray(dist, np.int32)
    lf = np.ascontiguousarray(lf, np.int32)
    df = np.ascontiguousarray(df, np.int32)
    soe = np.ascontiguousarray(soe, np.int64)
    raw = np.ascontiguousarray(raw, np.uint8)
    cap = len(raw) + (len(raw) >> 8) + 4096
    while True:
        out = np.empty(cap, dtype=np.uint8)
        end_bit = lib.tz_emit_chunk(
            _p32(litlen), _p32(dist), np.int64(len(litlen)),
            _p32(lf.reshape(-1)), _p32(df.reshape(-1)),
            soe.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            np.int64(len(lf)), np.int64(STRIPE_TOKENS),
            _p8(raw), np.int64(len(raw)),
            1 if last else 0, 1 if sync_flush else 0,
            _p8(out), np.int64(cap),
        )
        if end_bit < 0:
            cap *= 2
            continue
        assert end_bit % 8 == 0, "chunk emit must end byte-aligned"
        return out[: end_bit >> 3]


def _emit_leaf(sink: BitSink, litlen, dist, lf, df, raw, last, lib):
    """Emit one block: choose format, write headers (python) + body (C)."""
    from ..native.api import _p32, _p8

    lf = lf.astype(np.int64)
    df = df.astype(np.int64)
    ll, dl, push_header = build_dynamic_trees(lf, df)
    dyn_body = _body_cost(lf, df, ll, dl)
    static_body = _body_cost(
        lf, df, FIXED_LITLEN_LENGTHS, FIXED_DIST_LENGTHS[:30]
    )
    align_pad = (-(sink.total_bits + 3)) % 8
    nstored = max(1, -(-len(raw) // MAX_STORED))
    stored_total = 3 * nstored + align_pad + 32 * nstored + 8 * len(raw) + 5 * (
        nstored - 1
    )
    # dynamic header cost via a probe sink
    probe = BitSink()
    push_header(probe)
    dyn_total = 3 + probe.total_bits + dyn_body
    static_total = 3 + static_body

    if len(raw) and stored_total < min(dyn_total, static_total):
        emit_stored(sink, raw, last)
        return

    sink.push_scalar(1 if last else 0, 1)
    if static_total <= dyn_total:
        sink.push_scalar(1, 2)
        use_ll = FIXED_LITLEN_LENGTHS.astype(np.int32)
        use_dl = FIXED_DIST_LENGTHS[:30].astype(np.int32)
        use_lc = he.canonical_codes_lsb(FIXED_LITLEN_LENGTHS).astype(np.uint32)
        use_dc = he.canonical_codes_lsb(FIXED_DIST_LENGTHS)[:30].astype(np.uint32)
        body_bits = static_body
    else:
        sink.push_scalar(2, 2)
        push_header(sink)
        use_ll = ll.astype(np.int32)
        use_dl = dl.astype(np.int32)
        use_lc = he.canonical_codes_lsb(ll).astype(np.uint32)
        use_dc = he.canonical_codes_lsb(dl).astype(np.uint32)
        body_bits = dyn_body

    cap = (body_bits >> 3) + 16
    buf = np.zeros(cap, dtype=np.uint8)
    dl_pad = np.zeros(30, np.int32)
    dl_pad[: len(use_dl)] = use_dl
    dc_pad = np.zeros(30, np.uint32)
    dc_pad[: len(use_dc)] = use_dc
    ll_pad = np.zeros(288, np.int32)
    ll_pad[: len(use_ll)] = use_ll
    lc_pad = np.zeros(288, np.uint32)
    lc_pad[: len(use_lc)] = use_lc
    end_bit = lib.tz_emit_tokens(
        _p32(np.ascontiguousarray(litlen)),
        _p32(np.ascontiguousarray(dist)),
        np.int64(len(litlen)),
        _p32(ll_pad),
        lc_pad.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _p32(dl_pad),
        dc_pad.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _p8(buf),
        np.int64(cap),
        np.int64(0),
    )
    if end_bit < 0:
        raise RuntimeError("native emit overflow (cost model bug)")
    nfull = int(end_bit) >> 3
    if nfull:
        sink.push_bytes(buf[:nfull])
    rem = int(end_bit) & 7
    if rem:
        sink.push_scalar(int(buf[nfull]) & ((1 << rem) - 1), rem)


def emit_chunk_native(
    sink: BitSink,
    litlen: np.ndarray,
    dist: np.ndarray,
    lf: np.ndarray,
    df: np.ndarray,
    soe: np.ndarray,
    raw: np.ndarray,
    last: bool,
    max_stripes_per_block: int = 8,
) -> None:
    """Emit a chunk's tokens as adaptively-split blocks (stripe granular)."""
    from ..native.bindings import get_lib

    lib = get_lib()
    lf_prefix = np.zeros((len(lf) + 1, 286), np.int64)
    np.cumsum(lf, axis=0, out=lf_prefix[1:])
    df_prefix = np.zeros((len(df) + 1, 30), np.int64)
    np.cumsum(df, axis=0, out=df_prefix[1:])

    def seg_freqs(s0, s1):
        lfx = lf_prefix[s1] - lf_prefix[s0]
        lfx = lfx.copy()
        lfx[256] += 1  # EOB
        return lfx, df_prefix[s1] - df_prefix[s0]

    def seg_cost(s0, s1):
        """Entropy-based cost estimate (split decisions only; the final
        emit still builds exact package-merge trees)."""
        from .tables import DIST_EXTRA, LENGTH_EXTRA

        lfx, dfx = seg_freqs(s0, s1)
        bits = 0.0
        for freq in (lfx, dfx):
            tot = freq.sum()
            if tot:
                nz = freq[freq > 0].astype(np.float64)
                bits += float((nz * np.log2(tot / nz)).sum())
        bits += float((lfx[257:286] * LENGTH_EXTRA).sum())
        bits += float((dfx * DIST_EXTRA).sum())
        nraw = int(soe[s1 - 1]) - (int(soe[s0 - 1]) if s0 else 0)
        stored = 40 + 8 * nraw
        return min(int(bits) + 250, stored)  # +tree header estimate

    def emit_range(s0, s1, seg_last, known=None):
        if s1 - s0 > 1:
            if s1 - s0 > max_stripes_per_block:
                mid = (s0 + s1) // 2
                emit_range(s0, mid, False)
                emit_range(mid, s1, seg_last)
                return
            if known is None:
                known = seg_cost(s0, s1)
            mid = (s0 + s1) // 2
            ca = seg_cost(s0, mid)
            cb = seg_cost(mid, s1)
            if ca + cb + 1024 < known:
                emit_range(s0, mid, False, ca)
                emit_range(mid, s1, seg_last, cb)
                return
        t0 = s0 * STRIPE_TOKENS
        t1 = min(s1 * STRIPE_TOKENS, len(litlen))
        r0 = int(soe[s0 - 1]) if s0 else 0
        r1 = int(soe[s1 - 1])
        lfx, dfx = seg_freqs(s0, s1)
        _emit_leaf(
            sink, litlen[t0:t1], dist[t0:t1], lfx, dfx, raw[r0:r1], seg_last, lib
        )

    if len(litlen) == 0:
        if last:
            from .deflate_blocks import emit_block

            emit_block(sink, np.empty(0, np.int32), np.empty(0, np.int32),
                       np.empty(0, np.uint8), True)
        return
    emit_range(0, len(lf), last)
