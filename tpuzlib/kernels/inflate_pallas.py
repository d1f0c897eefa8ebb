"""Pallas TPU cursor tokenizer (round-4 device inflate rebuild).

The round-3 device inflate ran at 0.24 MB/s: its XLA while_loop paid
~25 us/iteration for the LUT gathers plus ~180 us/iteration for the
big-tape scatters (measured, tools/probe_gather.py) across ~3600
sequential iterations.  This kernel moves the whole K-cursor symbol
decode into ONE Pallas program where the same work is VMEM-resident
vector ops:

  * 128 cursors per grid step, cursors on LANES; each cursor owns a
    per-cursor slice of the compressed stream on SUBLANES.  ALL dynamic
    indexing is WHERE-CHAIN selects over (8,128) vreg tiles — Mosaic's
    tpu.dynamic_gather is not only limited to one vreg tile
    (probe_gather.py) but costs ~microseconds per op on the chip
    (measured: the gather-based first cut of this kernel ran 1000x
    slower than its op count predicted), while masked selects are
    single-cycle VPU work;
  * Huffman decode is CANONICAL COUNT-BASED, not LUT-based: one
    bit-reversal of the 16-bit window, then all 15 candidate code
    lengths are tested simultaneously on a (16,128) tile against
    per-cursor first/count tables (the zlib counting decode,
    vectorized across lengths instead of iterated);
  * rank -> entry payload is a 36-tile masked select over a (288,128)
    per-cursor canonical-order entry table (entries reuse the flat-LUT
    payload format, codec/huffman.py header);
  * the token tape is ITERATION-indexed — an active cursor emits
    exactly one token per iteration until it terminates, so tape rows
    are written at static row `it` (no scatters), valid entries are a
    prefix, and the tail keeps the +inf bit-position sentinel the
    splice's searchsorted expects.

The output contract is identical to inflate_device2.cursor_tokenize_body
(tok_pack/tok_bp/cnt/end_pos/status), so the existing splice validation,
stored-gap walking, and expansion all compose unchanged.

Capability parity: reference src/infcodes.ts inflate_fast (:62-301) and
the count-based table walk of src/inftree.ts huft_build (:95-299).
"""

from __future__ import annotations

import functools

import numpy as np

from ..codec import huffman
from ..codec.tables import FIXED_DIST_LENGTHS, FIXED_LITLEN_LENGTHS
from .inflate_device2 import (
    ST_EOB,
    ST_ERR,
    ST_OOB,
    ST_RUN,
    ST_STRIDE_END,
)

KG = 128          # cursors per grid step (one lane each)
LE = 288          # lit entry-table rows (286 syms, canonical rank order)
DE = 32           # dist entry-table rows
TB = 104          # metadata rows (see _TAB_* row map)
SENT_BP = 1 << 30  # tail sentinel for unused tape slots

# tabs row map
_T_LC, _T_LF, _T_LO = 0, 16, 32      # lit count/first/offset [L=0..15]
_T_DC, _T_DF, _T_DO = 48, 64, 80     # dist count/first/offset
_T_START, _T_STOP, _T_AVAIL, _T_ACT = 96, 97, 98, 99
_T_EXP = 100  # expect_eob: stop at EOB (block-last); else continue past it


# ---------------------------------------------------------------------------
# host: canonical decode tables per block
# ---------------------------------------------------------------------------


def canon_tables(lengths: np.ndarray, kind: str):
    """(ents, cnt16, first16, off16) for a code-length set.

    ents[rank] = LUT-format payload (codec/huffman.py header) of the
    rank-th symbol in canonical order (length asc, symbol asc);
    cnt16[L]/first16[L]/off16[L] drive the counting decode:
    a window whose L-bit MSB-first prefix c satisfies
    first16[L] <= c < first16[L]+cnt16[L] decodes to rank
    off16[L] + c - first16[L]."""
    lengths = np.asarray(lengths, dtype=np.int64)
    nsym = LE if kind == "litlen" else DE
    cnt = np.bincount(
        lengths[lengths > 0], minlength=huffman.MAX_BITS + 1
    ).astype(np.int32)
    cnt16 = np.zeros(16, np.int32)
    cnt16[1 : huffman.MAX_BITS + 1] = cnt[1:]
    first16 = np.zeros(16, np.int32)
    code = 0
    for b in range(1, 16):
        code = (code + int(cnt16[b - 1])) << 1
        first16[b] = code
    # exclusive prefix: off16[L] = number of symbols shorter than L
    off16 = (np.cumsum(cnt16) - cnt16).astype(np.int32)
    # canonical order: stable sort symbols by length (zero-lengths sink)
    syms = np.flatnonzero(lengths > 0)
    order = syms[np.argsort(lengths[syms], kind="stable")]
    ents = np.zeros(nsym, np.uint32)
    if len(order):
        ents[: len(order)] = huffman._entry_fields(order, kind) | (
            lengths[order].astype(np.uint32) << huffman.NB_SHIFT
        )
    return ents, cnt16, first16, off16


@functools.lru_cache()
def stored_canon_tables():
    """Transparent 8-bit tables: a stored block's byte-aligned data
    decodes as literals with the SAME kernel (cf. inflate_device2
    stored_lut)."""
    b = np.arange(256, dtype=np.uint32)
    rev8 = np.zeros(256, np.int64)
    for i in range(8):
        rev8 |= ((b >> i) & 1).astype(np.int64) << (7 - i)
    ents = np.zeros(LE, np.uint32)
    ents[rev8] = b | (np.uint32(8) << huffman.NB_SHIFT)
    cnt16 = np.zeros(16, np.int32)
    cnt16[8] = 256
    first16 = np.zeros(16, np.int32)
    off16 = np.zeros(16, np.int32)
    dents = np.zeros(DE, np.uint32)
    dzero = np.zeros(16, np.int32)
    return (ents, cnt16, first16, off16), (dents, dzero, dzero, dzero)


@functools.lru_cache()
def fixed_canon_tables():
    return (
        canon_tables(np.asarray(FIXED_LITLEN_LENGTHS), "litlen"),
        canon_tables(np.asarray(FIXED_DIST_LENGTHS), "dist"),
    )


def tables_for_block(lens_info):
    """Canonical tables from a _plan_blocks lens_info tag."""
    if lens_info[0] == "stored":
        return stored_canon_tables()
    if lens_info[0] == "fixed":
        return fixed_canon_tables()
    _, litlens, distlens = lens_info
    return (
        canon_tables(litlens, "litlen"),
        canon_tables(distlens, "dist"),
    )


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


@functools.lru_cache()
def _decode_kernel(G: int, NWp: int, CAPR: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NV = NWp // 8
    # numpy scalars (NOT jnp): jnp constants would be captured device
    # arrays, which pallas_call rejects
    VAL_MASK = np.uint32(0x7FFF)
    EB_SHIFT = np.uint32(19)
    F_LEN = np.uint32(1 << 23)
    F_EOB = np.uint32(1 << 24)

    def rev16(w):
        """Bit-reverse the low 16 bits of u32 w (per lane)."""
        r = w & jnp.uint32(0xFFFF)
        r = ((r & jnp.uint32(0x5555)) << 1) | ((r >> 1) & jnp.uint32(0x5555))
        r = ((r & jnp.uint32(0x3333)) << 2) | ((r >> 2) & jnp.uint32(0x3333))
        r = ((r & jnp.uint32(0x0F0F)) << 4) | ((r >> 4) & jnp.uint32(0x0F0F))
        r = ((r & jnp.uint32(0x00FF)) << 8) | ((r >> 8) & jnp.uint32(0x00FF))
        return r

    def kernel(words_ref, tabs_ref, lents_ref, dents_ref,
               tok_ref, bp_ref, fin_ref):
        tabs = tabs_ref[:]
        lc = tabs[_T_LC : _T_LC + 16]
        lf = tabs[_T_LF : _T_LF + 16]
        lo_ = tabs[_T_LO : _T_LO + 16]
        dc = tabs[_T_DC : _T_DC + 16]
        dfi = tabs[_T_DF : _T_DF + 16]
        do_ = tabs[_T_DO : _T_DO + 16]
        pos0 = tabs[_T_START : _T_START + 1]
        stop = tabs[_T_STOP : _T_STOP + 1]
        avail = tabs[_T_AVAIL : _T_AVAIL + 1]
        act0 = tabs[_T_ACT : _T_ACT + 1]
        exp = tabs[_T_EXP : _T_EXP + 1]

        Lrow = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        # tape init: sentinels everywhere (valid rows overwrite below)
        tok_ref[:] = jnp.zeros((CAPR, 128), jnp.uint32)
        bp_ref[:] = jnp.full((CAPR, 128), SENT_BP, jnp.int32)

        def ext8(tile, s):
            """Row s (per-lane dynamic, 0..7) of an (8,128) tile via a
            where-chain — single-vreg selects, no dynamic_gather."""
            out = tile[0:1]
            for r in range(1, 8):
                out = jnp.where(s == r, tile[r : r + 1], out)
            return out

        def fetch3(j):
            """words[j], words[j+1], words[j+2] per cursor lane
            (j: (1,128) clipped word index).  One masked-select pass
            keeps tiles v and v+1; rows come out via where-chains."""
            j = jnp.clip(j, 0, NWp - 3)
            v = j >> 3
            s = j & 7
            acc = jnp.zeros((8, 128), jnp.uint32)
            acc2 = jnp.zeros((8, 128), jnp.uint32)
            for t in range(NV):
                tile = words_ref[t * 8 : (t + 1) * 8, :]
                acc = jnp.where(v == t, tile, acc)
                acc2 = jnp.where(v == t - 1, tile, acc2)
            w_a = ext8(acc, s)
            w_b = jnp.where(s < 7, ext8(acc, s + 1), acc2[0:1])
            w_c = jnp.where(
                s < 6, ext8(acc, s + 2),
                jnp.where(s == 6, acc2[0:1], acc2[1:2]),
            )
            return w_a, w_b, w_c

        def lookup(ents_ref, rows, rank):
            """ents[rank] per cursor lane over a (rows,128) table:
            masked tile select + where-chain row extract."""
            r = jnp.clip(rank, 0, rows - 1)
            v = r >> 3
            acc = jnp.zeros((8, 128), jnp.uint32)
            for t in range(rows // 8):
                tile = ents_ref[t * 8 : (t + 1) * 8, :]
                acc = jnp.where(v == t, tile, acc)
            return ext8(acc, r & 7)

        def tree_decode(w, cnt, first, off):
            """Counting decode of one symbol from 32-bit window w.
            Returns (rank (1,128) i32, L (1,128) i32, ok bool)."""
            rv = rev16(w).astype(jnp.int32)
            code = jnp.broadcast_to(rv, (16, 128)) >> (16 - Lrow)
            match = (code >= first) & (code - first < cnt) & (Lrow >= 1)
            Lsel = jnp.min(jnp.where(match, Lrow, 99), axis=0, keepdims=True)
            ok = Lsel < 99
            Lc = jnp.clip(Lsel, 0, 15)
            pick = Lrow == Lc
            rank = jnp.sum(
                jnp.where(pick, off + code - first, 0), axis=0, keepdims=True
            )
            return rank, Lc, ok

        def cond(state):
            pos, cnt, status, eob_first, it = state
            return jnp.logical_and(jnp.any(status == ST_RUN), it < CAPR)

        def body(state):
            pos, cnt, status, eob_first, it = state
            run = status == ST_RUN
            j = pos >> 5
            sh = (pos & 31).astype(jnp.uint32)
            w_a, w_b, w_c = fetch3(j)
            nsh = (jnp.uint32(32) - sh) & jnp.uint32(31)
            hi_b = jnp.where(sh == 0, jnp.uint32(0), w_b << nsh)
            hi_c = jnp.where(sh == 0, jnp.uint32(0), w_c << nsh)
            w64_lo = (w_a >> sh) | hi_b
            w64_hi = (w_b >> sh) | hi_c

            # --- literal/length symbol ---------------------------------
            rank, L, okl = tree_decode(w64_lo, lc, lf, lo_)
            ent = lookup(lents_ref, LE, rank)
            base = (ent & VAL_MASK).astype(jnp.int32)
            eb = ((ent >> EB_SHIFT) & jnp.uint32(0xF)).astype(jnp.int32)
            Lu = L.astype(jnp.uint32)
            extra = (
                (w64_lo >> Lu) & ((jnp.uint32(1) << eb.astype(jnp.uint32)) - 1)
            ).astype(jnp.int32)
            val = base + extra
            is_len = (ent & F_LEN) != 0
            is_eob = (ent & F_EOB) != 0
            jump1 = L + eb
            # okl: no code length matched; INVALID bit: a real code for a
            # reserved symbol (fixed tree 286/287, inftree.ts parity)
            bad = run & (~okl | ((ent >> 31) != 0))

            # --- distance symbol (masked for non-matches) --------------
            o = jnp.clip(jump1, 0, 31).astype(jnp.uint32)
            no = (jnp.uint32(32) - o) & jnp.uint32(31)
            w2 = jnp.where(
                o == 0, w64_lo, (w64_lo >> o) | (w64_hi << no)
            )
            w2hi = jnp.where(o == 0, w64_hi, w64_hi >> o)
            drank, dL, okd = tree_decode(w2, dc, dfi, do_)
            dent = lookup(dents_ref, DE, drank)
            dbase = (dent & VAL_MASK).astype(jnp.int32)
            deb = ((dent >> EB_SHIFT) & jnp.uint32(0xF)).astype(jnp.int32)
            dLu = dL.astype(jnp.uint32)
            dex_w = jnp.where(
                dLu == 0, w2, (w2 >> dLu) | (w2hi << (jnp.uint32(32) - dLu))
            )
            dextra = (
                dex_w & ((jnp.uint32(1) << deb.astype(jnp.uint32)) - 1)
            ).astype(jnp.int32)
            dval = dbase + dextra
            # okd: no dist code length matched; dent INVALID bit: a real
            # canonical code for a reserved distance symbol (fixed tree
            # 30/31) — mirror inflate_device2 line ~112 / inftree.ts parity
            bad = bad | (run & is_len & (~okd | ((dent >> 31) != 0)))

            jump = jnp.where(is_len, jump1 + dL + deb, jump1)
            nxt = pos + jump
            oob = nxt > avail

            # spurious-EOB continuation (round 5): a non-block-last
            # cursor decoding an EOB is in its speculation garbage (or a
            # hidden-stored-run block, which the repair bridges) — it
            # records a FLAGGED tape token (bit 26) and keeps decoding,
            # so it can still self-sync and the boundary never breaks.
            # Only expect_eob (block-last) cursors stop at EOB.
            real_eob = is_eob & (exp != 0)
            is_data = run & ~bad & ~real_eob & ~oob
            pack = (
                val.astype(jnp.uint32)
                | (jnp.where(is_len, dval, 0).astype(jnp.uint32) << 9)
                | (is_len.astype(jnp.uint32) << 25)
            )
            pack = jnp.where(is_eob, jnp.uint32(1 << 26), pack)
            tok_ref[pl.ds(it, 1), :] = jnp.where(is_data, pack, 0)
            bp_ref[pl.ds(it, 1), :] = jnp.where(is_data, pos, SENT_BP)

            eob_first = jnp.where(
                is_data & is_eob & (eob_first < 0), cnt, eob_first
            )
            cnt = cnt + is_data.astype(jnp.int32)
            pos = jnp.where(is_data, nxt, pos)
            status = jnp.where(
                run & bad, ST_ERR,
                jnp.where(
                    run & ~bad & oob, ST_OOB,
                    jnp.where(run & real_eob & ~bad & ~oob, ST_EOB, status),
                ),
            )
            pos = jnp.where(run & real_eob & ~bad & ~oob, pos + jump, pos)
            status = jnp.where(
                (status == ST_RUN) & (pos >= stop), ST_STRIDE_END, status
            )
            return pos, cnt, status, eob_first, it + 1

        status0 = jnp.where(act0 != 0, ST_RUN, ST_STRIDE_END)
        status0 = jnp.where(
            (act0 != 0) & (pos0 >= stop), ST_STRIDE_END, status0
        )
        pos, cnt, status, eob_first, it = jax.lax.while_loop(
            cond,
            body,
            (pos0, jnp.zeros((1, 128), jnp.int32), status0,
             jnp.full((1, 128), -1, jnp.int32), jnp.int32(0)),
        )
        # cursors still running at CAPR overflowed the tape
        status = jnp.where(status == ST_RUN, ST_ERR, status)
        fin_ref[:] = jnp.concatenate(
            [pos, cnt, status, eob_first, jnp.zeros((4, 128), jnp.int32)],
            axis=0,
        )

    def run(words, tabs, lents, dents):
        blk = lambda R: pl.BlockSpec((R, 128), lambda g: (g, 0))
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((G * CAPR, 128), jnp.uint32),
                jax.ShapeDtypeStruct((G * CAPR, 128), jnp.int32),
                jax.ShapeDtypeStruct((G * 8, 128), jnp.int32),
            ),
            grid=(G,),
            in_specs=[blk(NWp), blk(TB), blk(LE), blk(DE)],
            out_specs=(blk(CAPR), blk(CAPR), blk(8)),
            interpret=interpret,
        )(words, tabs, lents, dents)

    return run


# ---------------------------------------------------------------------------
# host wrapper: plan arrays -> kernel layout -> cursor_tokenize contract
# ---------------------------------------------------------------------------


@functools.lru_cache()
def _prep_and_decode(G: int, NWp: int, CAPR: int, nblkp: int, nwpad: int,
                     interpret: bool):
    """ONE jit program: device-side slice gather + per-cursor table
    gather + group transposes + the Pallas decode + contract reshape.

    Round 4 built the (K, NWp) slices and per-cursor entry tables on the
    HOST and uploaded ~12 MB per 8 MB stream (slices 5.4 + lit entries
    4.7 + tabs 1.7 MB) through the ~45 MB/s tunnel; now only the raw
    stream words (~wire size) and ~200 KB of per-BLOCK tables go up, and
    the expansion to per-cursor layout is two device gathers (round-5
    verdict #1a: shrink the host floor)."""
    import jax
    import jax.numpy as jnp

    runk = _decode_kernel(G, NWp, CAPR, interpret)
    K = G * KG

    def to_groups(x):
        R = x.shape[1]
        return x.reshape(G, KG, R).transpose(0, 2, 1).reshape(G * R, KG)

    @jax.jit
    def run(words, swstart, blk_c, start_rel, stop_rel, avail_rel, active,
            expect, tab_blk, lit_e, dist_e):
        slices = words[swstart[:, None] + jnp.arange(NWp)[None, :]]
        base = tab_blk[blk_c]  # (K, TB)
        tabs = jnp.concatenate(
            [
                base[:, :_T_START],
                jnp.stack(
                    [start_rel, stop_rel, avail_rel,
                     active.astype(jnp.int32),
                     expect.astype(jnp.int32)], axis=1,
                ),
                base[:, _T_EXP + 1 :],
            ],
            axis=1,
        )
        tok, bp, fin = runk(
            to_groups(slices), to_groups(tabs),
            to_groups(lit_e[blk_c]), to_groups(dist_e[blk_c]),
        )
        off = (swstart << 5).astype(jnp.int32)
        tok_pack = (
            tok.reshape(G, CAPR, KG).transpose(0, 2, 1).reshape(K * CAPR)
        )
        bp2 = bp.reshape(G, CAPR, KG).transpose(0, 2, 1)
        bp_abs = jnp.where(
            bp2 < (SENT_BP >> 1), bp2 + off.reshape(G, KG, 1), bp2
        ).reshape(K * CAPR)
        fin2 = fin.reshape(G, 8, KG)
        end_pos = (fin2[:, 0, :].reshape(K) + off).astype(jnp.int32)
        cnt = fin2[:, 1, :].reshape(K)
        status = fin2[:, 2, :].reshape(K)
        eob_idx = fin2[:, 3, :].reshape(K)
        end_pos = jnp.where(active, end_pos, 0)
        return tok_pack, bp_abs, cnt, end_pos, status, eob_idx

    return run


def _words_shape(buf_len: int, stride_bits: int, overlap_bits: int):
    NWp = -(-(stride_bits // 32 + overlap_bits // 32 + 8) // 8) * 8
    nw_total = (buf_len + 3) // 4
    nwpad = 1 << max(12, (nw_total + NWp - 1).bit_length())
    return NWp, nwpad


def preload_words(buf: np.ndarray, stride_bits: int, overlap_bits: int):
    """Start the (async) device upload of the padded stream words NOW —
    called BEFORE host block planning so the ~4 MB tunnel transfer
    overlaps the ~0.17 s native header scan instead of serializing
    after it (round 5)."""
    import jax.numpy as jnp

    NWp, nwpad = _words_shape(len(buf), stride_bits, overlap_bits)
    wbuf = np.zeros(nwpad * 4, np.uint8)
    wbuf[: len(buf)] = buf
    return jnp.asarray(wbuf.view("<u4"))


def pallas_cursor_tokenize(
    buf: np.ndarray,
    starts: np.ndarray,
    stops_dec: np.ndarray,
    block_of: np.ndarray,
    plan,
    stride_bits: int,
    overlap_bits: int,
    cap: int,
    words_dev=None,
    expect_eob=None,
):
    """Run the Pallas cursor decode; returns the cursor_tokenize_body
    contract (tok_pack u32[K*CAP], tok_bp i32[K*CAP], cnt, end_pos,
    status, eob_idx) with ABSOLUTE bit positions (CAP = `cap`, multiple
    of 8).  expect_eob: bool[K] — cursors that stop at EOB (block-last);
    others record flagged tokens and continue (EOB-continuation)."""
    import jax
    import jax.numpy as jnp

    K = len(starts)
    assert K % KG == 0 and cap % 8 == 0
    G = K // KG
    NWp, nwpad = _words_shape(len(buf), stride_bits, overlap_bits)
    CAPR = cap

    # stream as u32 words (little-endian), padded to a pow2 bucket so
    # the prep program compiles once per (G, NWp, CAPR, nblkp, nwpad)
    if words_dev is None:
        words_dev = preload_words(buf, stride_bits, overlap_bits)
    assert words_dev.shape[0] == nwpad

    active = starts >= 0
    swstart = np.where(active, starts, 0) >> 5
    swstart = np.minimum(swstart, nwpad - NWp).astype(np.int32)
    start_rel = (np.where(active, starts, 0) - (swstart << 5)).astype(
        np.int32
    )
    stop_rel = np.where(active, stops_dec - (swstart << 5), 0).astype(
        np.int32
    )
    avail_rel = np.minimum(len(buf) * 8 - (swstart << 5), NWp * 32).astype(
        np.int32
    )

    # per-BLOCK tables (tiny; expanded per-cursor ON DEVICE)
    nblk = len(plan)
    nblkp = 1 << max(3, (nblk - 1).bit_length())
    lit_e = np.zeros((nblkp, LE), np.uint32)
    dist_e = np.zeros((nblkp, DE), np.uint32)
    tab_blk = np.zeros((nblkp, TB), np.int32)
    for b, p in enumerate(plan):
        (le, lcnt, lfst, loff), (de, dcnt, dfst, doff) = tables_for_block(
            p[7]
        )
        lit_e[b] = le
        dist_e[b] = de
        tab_blk[b, _T_LC : _T_LC + 16] = lcnt
        tab_blk[b, _T_LF : _T_LF + 16] = lfst
        tab_blk[b, _T_LO : _T_LO + 16] = loff
        tab_blk[b, _T_DC : _T_DC + 16] = dcnt
        tab_blk[b, _T_DF : _T_DF + 16] = dfst
        tab_blk[b, _T_DO : _T_DO + 16] = doff
    blk_c = np.clip(block_of, 0, nblk - 1).astype(np.int32)

    if expect_eob is None:
        expect_np = np.ones(K, bool)
    else:
        expect_np = np.asarray(expect_eob, bool)[:K]

    interpret = jax.default_backend() != "tpu"
    run = _prep_and_decode(G, NWp, CAPR, nblkp, nwpad, interpret)
    return run(
        words_dev, jnp.asarray(swstart), jnp.asarray(blk_c),
        jnp.asarray(start_rel), jnp.asarray(stop_rel),
        jnp.asarray(avail_rel), jnp.asarray(active),
        jnp.asarray(expect_np), jnp.asarray(tab_blk),
        jnp.asarray(lit_e), jnp.asarray(dist_e),
    )
