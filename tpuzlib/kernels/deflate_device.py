"""Device (TPU) deflate pipeline: one jit-compiled SPMD program per chunk.

The jax.numpy mirror of codec/lz77.py + codec/deflate_blocks.py with
static shapes throughout:

  data[CTX + N] --hash/sort/screen--> best match per position
               --local lazy rule----> effective lengths
               --pointer doubling---> token-start mask (no compaction!)
               --masked cumsum------> per-token bit offsets
               --scatter-add--------> packed static-Huffman block words

Everything stays int32/uint32 (no x64 emulation on TPU); bit windows are
read through per-byte uint32 views.  A static-tree token is at most
9+5+5+13 = 32 bits, so each token contributes to exactly two packed
words.  The host assembles chunk blocks into a stream with BitSink and
adds container framing.

Capability parity: the device analog of reference src/deflate.ts
longest_match/deflate_slow + src/deftree.ts static trees + bit packer
(deflate.ts:827-946, :1054-1182, :352-374).
"""

from __future__ import annotations

import functools

import numpy as np

from ..codec import huffman_encode as he
from ..codec.lz77 import LEVELS, TOO_FAR
from ..codec.tables import (
    DIST_BASE,
    DIST_EXTRA,
    FIXED_DIST_LENGTHS,
    FIXED_LITLEN_LENGTHS,
    LENGTH_BASE,
    LENGTH_EXTRA,
    MAX_MATCH,
    MIN_MATCH,
    WINDOW_SIZE,
    dist_to_code,
    length_to_code,
)

CTX = WINDOW_SIZE  # fixed-size history prefix carried between chunks


@functools.lru_cache()
def _static_tables():
    """Fixed-tree encode tables as numpy constants."""
    ll = FIXED_LITLEN_LENGTHS.astype(np.int32)
    lcodes = he.canonical_codes_lsb(ll).astype(np.uint32)
    dl = FIXED_DIST_LENGTHS[:30].astype(np.int32)
    dcodes = he.canonical_codes_lsb(FIXED_DIST_LENGTHS)[:30].astype(np.uint32)
    len2code = length_to_code(np.arange(3, 259)).astype(np.int32)
    dist2code = dist_to_code(np.arange(1, WINDOW_SIZE + 1)).astype(np.int32)
    return ll, lcodes, dl, dcodes, len2code, dist2code


def _jnp():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _build_w32(jnp, data):
    """Per-byte uint32 little-endian windows (bits 8k..8k+31)."""
    n = data.shape[0]
    padded = jnp.concatenate([data, jnp.zeros(8, dtype=jnp.uint8)]).astype(jnp.uint32)
    w = padded[:n]
    w = w | (padded[1 : 1 + n] << jnp.uint32(8))
    w = w | (padded[2 : 2 + n] << jnp.uint32(16))
    w = w | (padded[3 : 3 + n] << jnp.uint32(24))
    return w


def _hash(jnp, w32lo, w32hi, nbytes, bits):
    C1 = jnp.uint32(0x9E3779B1)
    C2 = jnp.uint32(0x85EBCA77)
    if nbytes <= 4:
        if nbytes < 4:
            v = (w32lo & jnp.uint32((1 << (8 * nbytes)) - 1)) * C1
        else:
            v = w32lo * C1
    else:
        if nbytes < 8:
            hi = w32hi & jnp.uint32((1 << (8 * (nbytes - 4))) - 1)
        else:
            hi = w32hi
        v = w32lo * C1 + hi * C2
    return (v * C1) >> jnp.uint32(32 - bits)


def _prefix_len8(jnp, lo_a, hi_a, lo_b, hi_b):
    """Common prefix bytes (0..8) from two (lo,hi) u32 window pairs."""
    vlo = lo_a ^ lo_b
    vhi = hi_a ^ hi_b
    plen = jnp.zeros(lo_a.shape, dtype=jnp.int32)
    alive = jnp.ones(lo_a.shape, dtype=bool)
    for j in range(4):
        alive = alive & (((vlo >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)) == 0)
        plen = plen + alive
    for j in range(4):
        alive = alive & (((vhi >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)) == 0)
        plen = plen + alive
    return plen


def match_and_parse(jax, jnp, data, ctx_valid, n_valid, level, ctx=CTX):
    """data: (ctx+N,) uint8; first ctx bytes are history (ctx_valid of
    them real).  Returns (is_token, litlen, dist) masked tape over the N
    new byte positions."""
    params = LEVELS[level]
    total = data.shape[0]
    n = total - ctx
    w32 = _build_w32(jnp, data)
    w32hi = jnp.concatenate([w32[4:], jnp.zeros(4, dtype=jnp.uint32)])

    pos = jnp.arange(ctx, total, dtype=jnp.int32)
    end_valid = ctx + n_valid
    limit = jnp.clip(end_valid - pos, 0, MAX_MATCH)

    best_screen = jnp.zeros(n, dtype=jnp.int32)
    best_cand = jnp.full(n, -1, dtype=jnp.int32)
    second_cand = jnp.full(n, -1, dtype=jnp.int32)

    min_cand = ctx - ctx_valid

    # Sorted-domain screening: after the stable sort by (hash, position),
    # the k most recent same-bucket predecessors are the k previous ROWS,
    # so candidate windows come from contiguous shifts — no gathers in the
    # k-deep inner loop, and only 2 gathers + 3 scatters per probe.
    for hash_bytes, k in params.probes:
        bits = 16 if hash_bytes <= 4 else 18
        h = _hash(jnp, w32, w32hi, hash_bytes, bits)
        order = jnp.argsort(h).astype(jnp.int32)  # stable
        sh = h[order]
        so_lo = w32[order]
        so_hi = w32hi[order]
        sp = order
        lim_sorted = jnp.clip(end_valid - sp, 0, MAX_MATCH)
        sb_screen = jnp.zeros(total, dtype=jnp.int32)
        sb_cand = jnp.full(total, -1, dtype=jnp.int32)
        sb_second = jnp.full(total, -1, dtype=jnp.int32)
        for j in range(1, k + 1):
            padi = jnp.full(j, -1, jnp.int32)
            same = jnp.concatenate([jnp.zeros(j, bool), sh[j:] == sh[:-j]])
            cand_j = jnp.concatenate([padi, sp[:-j]])
            ok = same & (sp - cand_j <= WINDOW_SIZE) & (cand_j >= min_cand)
            padw = jnp.zeros(j, jnp.uint32)
            sc = _prefix_len8(
                jnp,
                so_lo,
                so_hi,
                jnp.concatenate([padw, so_lo[:-j]]),
                jnp.concatenate([padw, so_hi[:-j]]),
            )
            sc = jnp.where(ok, jnp.minimum(sc, lim_sorted), -1)
            better = sc > sb_screen
            sb_second = jnp.where(better, sb_cand, sb_second)
            sb_cand = jnp.where(better, cand_j, sb_cand)
            sb_screen = jnp.where(better, sc, sb_screen)
        zero_full = jnp.zeros(total, jnp.int32)
        scr_full = zero_full.at[order].set(sb_screen)[ctx:]
        cand_full = zero_full.at[order].set(sb_cand)[ctx:]
        sec_full = zero_full.at[order].set(sb_second)[ctx:]
        better = scr_full > best_screen
        second_cand = jnp.where(better, best_cand, second_cand)
        best_cand = jnp.where(better, cand_full, best_cand)
        best_screen = jnp.where(better, scr_full, best_screen)
        second_cand = jnp.where(
            (~better) & (sec_full >= 0) & (second_cand < 0), sec_full, second_cand
        )
    best_cand = jnp.where(best_cand >= 0, best_cand, -1)
    second_cand = jnp.where(second_cand >= 0, second_cand, -1)

    def extend(cand):
        valid = cand >= 0
        candc = jnp.where(valid, cand, 0)

        def cond(state):
            _, done, _ = state
            return jnp.logical_not(jnp.all(done))

        def body(state):
            off, done, length = state
            p = jnp.minimum(pos + off, total - 1)
            c = jnp.minimum(candc + off, total - 1)
            pl = _prefix_len8(jnp, w32[p], w32hi[p], w32[c], w32hi[c])
            pl = jnp.clip(pl, 0, limit - off)
            length = jnp.where(done, length, off + pl)
            done = done | (pl < 8) | (off + 8 >= limit)
            return off + 8, done, length

        # init carries with zeros_like(cand) so their sharding variance
        # matches the loop outputs under shard_map
        _, _, length = jax.lax.while_loop(
            cond, body, (jnp.int32(0), ~valid, jnp.zeros_like(cand))
        )
        return jnp.where(valid, jnp.minimum(length, limit), 0)

    len1 = extend(best_cand)
    len2 = extend(second_cand)
    use2 = len2 > len1
    cand = jnp.where(use2, second_cand, best_cand)
    length = jnp.where(use2, len2, len1)
    dist = jnp.where(cand >= 0, pos - cand, 0)

    length = jnp.where(length >= MIN_MATCH, length, 0)
    length = jnp.where((length == MIN_MATCH) & (dist > TOO_FAR), 0, length)
    length = jnp.where(dist > 0, length, 0)

    eff = length
    if params.lazy:
        nxt_len = jnp.concatenate([length[1:], jnp.zeros(1, jnp.int32)])
        defer = (eff >= MIN_MATCH) & (eff < params.max_lazy) & (nxt_len > eff)
        eff = jnp.where(defer, 0, eff)
    step = jnp.where(eff >= MIN_MATCH, eff, 1)
    nxt = jnp.minimum(jnp.arange(n, dtype=jnp.int32) + step, n)
    nxt = jnp.where(jnp.arange(n) >= n_valid, n, nxt)

    rounds = max(1, int(np.ceil(np.log2(n + 1))))
    J = jnp.concatenate([nxt, jnp.array([n], jnp.int32)])
    reach = (J * 0).at[0].set(1)  # zeros with J's sharding variance

    def dbl(_, state):
        reach, Jk = state
        return reach.at[Jk].max(reach[: Jk.shape[0]]), Jk[Jk]

    reach, _ = jax.lax.fori_loop(0, rounds, dbl, (reach, J))
    starts = reach[:n].astype(bool) & (jnp.arange(n) < n_valid)
    take = starts & (eff >= MIN_MATCH)
    litlen = jnp.where(take, eff, data[ctx:].astype(jnp.int32))
    dists = jnp.where(take, dist, 0)
    return starts, litlen, dists


# ---------------------------------------------------------------------------
# v2 matcher: sort-carried screening, gather-light (round 2)
# ---------------------------------------------------------------------------
#
# The round-1 matcher was correct but gather-bound: extension walked
# whole-array window gathers and the parse did 18 scatter+gather
# doubling rounds (measured ~246 ms per 256 KiB on a v5e).  v2 applies
# the measured primitive costs (sort 0.2 ms / 256K, gather 7.4 ns/elem,
# scatter 4.3 ns/elem, elementwise ~1 ns/byte):
#
#   * window words ride the probe sort as extra lax.sort operands, so
#     screening needs NO gathers at all;
#   * probes merge through ONE packed scatter-max per probe
#     (screen<<16 | closeness) instead of three scatter .at[].set;
#   * match extension beyond the 8-byte screen runs on a sort-compacted
#     candidate list (~n/8 gathers instead of n per round);
#   * token extraction forces a token break every SEG bytes (+0.18%
#     compressed size at SEG=1024 on text), which caps parse chains at
#     SEG and keeps pointer-doubling segment-local.
#
# Capability parity: same reference semantics as v1 (deflate.ts:827-946
# longest_match, :1054-1182 deflate_slow lazy rule); the parse deviation
# (forced breaks) is a documented ratio/throughput trade.

SEG = 1024  # forced token-break period (parse segment length)


def _pack_key(jnp, screen, dist):
    """Packed best-match key: longer screen wins, then closer distance."""
    return (
        screen.astype(jnp.uint32) << jnp.uint32(16)
    ) | (jnp.uint32(0xFFFF) - dist.astype(jnp.uint32))


def _ctz_bytes(jax, jnp, x):
    """Count of trailing zero BYTES of a u32 (4 when x == 0)."""
    lsb = x & (jnp.uint32(0) - x)
    f = lsb.astype(jnp.float32)
    e = (jax.lax.bitcast_convert_type(f, jnp.uint32) >> jnp.uint32(23)).astype(
        jnp.int32
    ) - 127
    return jnp.where(x == 0, 4, e >> 3)


def near_match_dense(jax, jnp, w32, w32hi, min_cand, end_valid, nd=128):
    """Exhaustive near-window search: best match among distances 1..nd.

    Pure shifted compares — no sort, no gather, no scatter.  Finds every
    >=3-byte match in the TOO_FAR window exactly (the reference reaches
    these via its 3-byte hash chains, deflate.ts:1079-1085); screen is
    capped at 8 like the probe path.  Returns packed best keys."""
    total = w32.shape[0]
    pos = jnp.arange(total, dtype=jnp.int32)
    lim = jnp.clip(end_valid - pos, 0, 8)
    best = jnp.zeros(total, dtype=jnp.uint32)
    zpad = jnp.zeros(nd, dtype=jnp.uint32)
    w32p = jnp.concatenate([zpad, w32])
    w32hp = jnp.concatenate([zpad, w32hi])
    for d in range(1, nd + 1):
        lo = jax.lax.dynamic_slice(w32p, (nd - d,), (total,))
        hi = jax.lax.dynamic_slice(w32hp, (nd - d,), (total,))
        xl = w32 ^ lo
        xh = w32hi ^ hi
        sc = jnp.where(xl == 0, 4 + _ctz_bytes(jax, jnp, xh), _ctz_bytes(jax, jnp, xl))
        sc = jnp.minimum(sc, lim)
        ok = pos - d >= min_cand
        pk = jnp.where(ok & (sc >= MIN_MATCH), _pack_key(jnp, sc, jnp.full_like(pos, d)), jnp.uint32(0))
        best = jnp.maximum(best, pk)
    return best


# v2 probe schedule: the dense near pass replaces 3-byte probes (and
# short-distance 4-byte work), so the sorted probes keep only the far
# search.  (hash_bytes, k) per level; near_nd is the dense window.
LEVELS_V2 = {
    1: dict(near=32, probes=((4, 4),)),
    2: dict(near=64, probes=((4, 6),)),
    3: dict(near=64, probes=((4, 10),)),
    4: dict(near=128, probes=((4, 8), (6, 4))),
    5: dict(near=128, probes=((4, 10), (6, 6))),
    6: dict(near=128, probes=((4, 12), (6, 8))),
    7: dict(near=128, probes=((4, 20), (6, 12))),
    8: dict(near=128, probes=((4, 32), (6, 24), (8, 12))),
    9: dict(near=128, probes=((4, 64), (6, 48), (8, 24))),
}


def match_candidates_v2(jax, jnp, data, ctx_valid, n_valid, level, ctx=CTX):
    """Sort-carried candidate search.

    Returns (screen, dist) over ALL positions (ctx + new): verified
    common-prefix length capped at 8 and the matched distance."""
    params = LEVELS_V2[level]
    total = data.shape[0]
    w32 = _build_w32(jnp, data)
    w32hi = jnp.concatenate([w32[4:], jnp.zeros(4, dtype=jnp.uint32)])
    pos_all = jnp.arange(total, dtype=jnp.int32)
    end_valid = ctx + n_valid
    min_cand = ctx - ctx_valid

    best = near_match_dense(
        jax, jnp, w32, w32hi, min_cand, end_valid, nd=params["near"]
    )
    for hash_bytes, k in params["probes"]:
        bits = 16 if hash_bytes <= 4 else 18
        h = _hash(jnp, w32, w32hi, hash_bytes, bits).astype(jnp.int32)
        sh, sp, slo, shi = jax.lax.sort(
            (h, pos_all, w32, w32hi), num_keys=1, is_stable=True
        )
        lim_sorted = jnp.clip(end_valid - sp, 0, 8)
        probe_best = jnp.zeros(total, dtype=jnp.uint32)
        for j in range(1, k + 1):
            padi = jnp.full(j, -1, jnp.int32)
            same = jnp.concatenate([jnp.zeros(j, bool), sh[j:] == sh[:-j]])
            cand_j = jnp.concatenate([padi, sp[:-j]])
            d = sp - cand_j
            ok = same & (d >= 1) & (d <= WINDOW_SIZE) & (cand_j >= min_cand)
            padw = jnp.zeros(j, jnp.uint32)
            sc = _prefix_len8(
                jnp,
                slo,
                shi,
                jnp.concatenate([padw, slo[:-j]]),
                jnp.concatenate([padw, shi[:-j]]),
            )
            sc = jnp.minimum(sc, lim_sorted)
            pk = jnp.where(
                ok & (sc >= MIN_MATCH), _pack_key(jnp, sc, d), jnp.uint32(0)
            )
            probe_best = jnp.maximum(probe_best, pk)
        best = best.at[sp].max(probe_best)

    screen = (best >> jnp.uint32(16)).astype(jnp.int32)
    dist = jnp.where(
        best > 0, (jnp.uint32(0xFFFF) - (best & jnp.uint32(0xFFFF))).astype(jnp.int32), 0
    )
    return screen, dist


def extend_compacted_v2(jax, jnp, w32, w32hi, screen, dist, limit, ext_cap):
    """Extend full-screen candidates past 8 bytes on a compacted list.

    screen/dist/limit are position-domain over `total`; only positions
    with screen == 8 and limit > 8 extend (at most ext_cap of them —
    overflow candidates keep length 8, a ratio-only fallback)."""
    total = screen.shape[0]
    need = (screen >= 8) & (limit > 8) & (dist > 0)
    key = jnp.where(need, jnp.arange(total, dtype=jnp.int32), total)
    skey = jax.lax.sort(key)
    epos = skey[:ext_cap]
    valid = epos < total
    epos_c = jnp.where(valid, epos, 0)
    edist = dist[epos_c]
    elim = jnp.where(valid, limit[epos_c], 0)

    def cond(state):
        off, done, _ = state
        return jnp.logical_not(jnp.all(done))

    def body(state):
        off, done, elen = state
        p = jnp.minimum(epos_c + off, total - 1)
        c = jnp.minimum(epos_c - edist + off, total - 1)
        pl8 = _prefix_len8(jnp, w32[p], w32hi[p], w32[c], w32hi[c])
        pl8 = jnp.clip(pl8, 0, elim - off)
        elen = jnp.where(done, elen, off + pl8)
        done = done | (pl8 < 8) | (off + 8 >= elim)
        return off + 8, done, elen

    _, _, elen = jax.lax.while_loop(
        cond, body, (jnp.int32(8), ~valid, jnp.zeros_like(epos_c) + 8)
    )
    elen = jnp.where(valid, jnp.minimum(elen, elim), 8)
    return screen.at[epos_c].max(jnp.where(valid, elen, 0))


def segment_parse_xla(jax, jnp, step, n_valid, seg=SEG):
    """Token starts from a step tape with forced breaks every `seg`.

    step[i] >= 1 never crosses a segment boundary (caller enforces), so
    chains are segment-local and ceil(log2(seg)) scatter+gather doubling
    rounds suffice.  Returns bool[n] token-start mask."""
    n = step.shape[0]
    t = jnp.arange(n, dtype=jnp.int32) % seg
    base = jnp.arange(n, dtype=jnp.int32) - t
    nxt = base + jnp.minimum(t + step, seg)
    nxt = jnp.where(jnp.arange(n) >= n_valid, n, jnp.minimum(nxt, n))
    J = jnp.concatenate([nxt, jnp.array([n], jnp.int32)])
    nseg = -(-n // seg)
    seeds = jnp.arange(nseg, dtype=jnp.int32) * seg
    reach = (J * 0).at[jnp.minimum(seeds, n)].set(1)
    rounds = max(1, int(np.ceil(np.log2(seg + 1))))

    def dbl(_, state):
        reach, Jk = state
        return reach.at[Jk].max(reach[: Jk.shape[0]]), Jk[Jk]

    reach, _ = jax.lax.fori_loop(0, rounds, dbl, (reach, J))
    return reach[:n].astype(bool) & (jnp.arange(n) < n_valid)


def match_and_parse_v2(
    jax, jnp, data, ctx_valid, n_valid, level, ctx=CTX, seg=SEG, parse=None
):
    """v2 pipeline: candidates -> extension -> lazy rule -> segment parse.

    Same output contract as match_and_parse: masked (is_token, litlen,
    dist) tapes over the N new positions."""
    params = LEVELS[level]
    total = data.shape[0]
    n = total - ctx
    w32 = _build_w32(jnp, data)
    w32hi = jnp.concatenate([w32[4:], jnp.zeros(4, dtype=jnp.uint32)])
    end_valid = ctx + n_valid

    screen, dist = match_candidates_v2(
        jax, jnp, data, ctx_valid, n_valid, level, ctx=ctx
    )
    limit = jnp.clip(end_valid - jnp.arange(total, dtype=jnp.int32), 0, MAX_MATCH)
    length = extend_compacted_v2(
        jax, jnp, w32, w32hi, screen, dist, limit, ext_cap=max(128, total // 8)
    )
    length = jnp.minimum(length, limit)

    # position-domain rules over the new bytes only
    length = length[ctx:]
    dist = dist[ctx:]
    length = jnp.where(length >= MIN_MATCH, length, 0)
    length = jnp.where((length == MIN_MATCH) & (dist > TOO_FAR), 0, length)
    length = jnp.where(dist > 0, length, 0)

    eff = length
    if params.lazy:
        nxt_len = jnp.concatenate([length[1:], jnp.zeros(1, jnp.int32)])
        defer = (eff >= MIN_MATCH) & (eff < params.max_lazy) & (nxt_len > eff)
        eff = jnp.where(defer, 0, eff)

    # forced token breaks at segment boundaries: truncate, drop if < 3
    t = jnp.arange(n, dtype=jnp.int32) % seg
    room = seg - t
    effT = jnp.minimum(eff, room)
    eff = jnp.where(effT >= MIN_MATCH, effT, 0)

    step = jnp.where(eff >= MIN_MATCH, eff, 1)
    if parse is None:
        if jax.default_backend() == "tpu" and seg == SEG:
            from .parse_pallas import segment_parse_pallas as parse
        else:
            parse = segment_parse_xla
    parse_fn = parse
    starts = parse_fn(jax, jnp, step, n_valid, seg=seg)
    take = starts & (eff >= MIN_MATCH)
    litlen = jnp.where(take, eff, data[ctx:].astype(jnp.int32))
    dists = jnp.where(take, dist, 0)
    return starts, litlen, dists


def pack_static_block(jax, jnp, is_token, litlen, dist, last):
    """Masked token tape -> packed static-Huffman DEFLATE block.

    Returns (words u32, total_bits scalar): 3-bit header (BFINAL=last,
    BTYPE=01), token codes, EOB."""
    ll_np, lcodes_np, dl_np, dcodes_np, len2code_np, dist2code_np = _static_tables()
    ll = jnp.asarray(ll_np)
    lcodes = jnp.asarray(lcodes_np)
    dl = jnp.asarray(dl_np)
    dcodes = jnp.asarray(dcodes_np)
    len2code = jnp.asarray(len2code_np)
    dist2code = jnp.asarray(dist2code_np)
    LB, LE = jnp.asarray(LENGTH_BASE), jnp.asarray(LENGTH_EXTRA)
    DB, DE = jnp.asarray(DIST_BASE), jnp.asarray(DIST_EXTRA)

    n = litlen.shape[0]
    is_match = dist > 0
    lsym = jnp.where(is_match, len2code[jnp.clip(litlen - 3, 0, 255)], litlen)
    lidx = jnp.clip(lsym - 257, 0, 28)
    lext_bits = jnp.where(is_match, LE[lidx], 0)
    lext_val = jnp.where(is_match, litlen - LB[lidx], 0).astype(jnp.uint32)
    dsym = dist2code[jnp.clip(dist - 1, 0, WINDOW_SIZE - 1)]
    dext_bits = jnp.where(is_match, DE[dsym], 0)
    dext_val = jnp.where(is_match, dist - DB[dsym], 0).astype(jnp.uint32)

    # assemble each token's <=32 bits LSB-first
    a = lcodes[lsym]
    nb = ll[lsym]
    a = a | (lext_val << nb.astype(jnp.uint32))
    nb = nb + lext_bits
    a = a | (jnp.where(is_match, dcodes[dsym], 0).astype(jnp.uint32) << nb.astype(jnp.uint32))
    nb = nb + jnp.where(is_match, dl[dsym], 0)
    a = a | (dext_val << nb.astype(jnp.uint32))
    nb = nb + jnp.where(is_match, dext_bits, 0)

    nb = jnp.where(is_token, nb, 0)
    a = jnp.where(is_token, a, jnp.uint32(0))

    offsets = 3 + jnp.cumsum(nb) - nb
    body_end = 3 + jnp.sum(nb)

    nwords = n + 4
    words = jnp.zeros(nwords, dtype=jnp.uint32)
    last_bit = jnp.asarray(last, jnp.uint32) & jnp.uint32(1)
    words = words.at[0].set(jnp.uint32(2) | last_bit)  # BFINAL | BTYPE=01

    idx = offsets >> 5
    sh = (offsets & 31).astype(jnp.uint32)
    w0 = (a << sh).astype(jnp.uint32)
    w1 = jnp.where(sh > 0, a >> (jnp.uint32(32) - sh), jnp.uint32(0))
    words = words.at[idx].add(w0)
    words = words.at[idx + 1].add(w1)

    # EOB (static code for symbol 256 is 7 zero bits; OR-in kept general)
    eidx = body_end >> 5
    esh = (body_end & 31).astype(jnp.uint32)
    ecode = lcodes[256]
    words = words.at[eidx].add((ecode << esh).astype(jnp.uint32))
    words = words.at[eidx + 1].add(
        jnp.where(esh > 0, ecode >> (jnp.uint32(32) - esh), jnp.uint32(0))
    )
    total_bits = body_end + ll[256]
    return words, total_bits


def pack_block_tables(jax, jnp, is_token, litlen, dist, tables):
    """Like pack_static_block but with caller-provided code tables
    (dynamic Huffman): tokens may reach 15+5+15+13 = 48 bits, carried as
    a (lo32, hi16) pair contributing to three packed words.

    tables = (ll, lcodes, dl, dcodes) device arrays; the 3-bit block
    header and the tree-description header bits are NOT included (the
    host prepends them via BitSink)."""
    ll, lcodes, dl, dcodes = tables
    _, _, _, _, len2code_np, dist2code_np = _static_tables()
    len2code = jnp.asarray(len2code_np)
    dist2code = jnp.asarray(dist2code_np)
    LB, LE = jnp.asarray(LENGTH_BASE), jnp.asarray(LENGTH_EXTRA)
    DB, DE = jnp.asarray(DIST_BASE), jnp.asarray(DIST_EXTRA)

    n = litlen.shape[0]
    is_match = dist > 0
    lsym = jnp.where(is_match, len2code[jnp.clip(litlen - 3, 0, 255)], litlen)
    lidx = jnp.clip(lsym - 257, 0, 28)
    lext_bits = jnp.where(is_match, LE[lidx], 0)
    lext_val = jnp.where(is_match, litlen - LB[lidx], 0).astype(jnp.uint32)
    dsym = dist2code[jnp.clip(dist - 1, 0, WINDOW_SIZE - 1)]
    dext_bits = jnp.where(is_match, DE[dsym], 0)
    dext_val = jnp.where(is_match, dist - DB[dsym], 0).astype(jnp.uint32)

    # field start offsets: 0, <=15, <=20, <=35 — the last field can start
    # past bit 31, so emit2 must handle sh in [0, 35].
    def emit2(lo, hi, nb, val, bits):
        val = val.astype(jnp.uint32)
        sh = nb
        shc = jnp.clip(sh, 0, 31).astype(jnp.uint32)
        in_lo = (jnp.where(sh < 32, val, 0) << shc).astype(jnp.uint32)
        spill = jnp.where(
            (sh > 0) & (sh < 32), val >> (jnp.uint32(32) - shc), 0
        )
        in_hi = jnp.where(sh >= 32, val << jnp.clip(sh - 32, 0, 31).astype(jnp.uint32), spill)
        return lo | in_lo, (hi | in_hi).astype(jnp.uint32), nb + bits

    lo = lcodes[lsym].astype(jnp.uint32)
    hi = jnp.zeros(n, dtype=jnp.uint32)
    nb = ll[lsym]
    lo, hi, nb = emit2(lo, hi, nb, lext_val, lext_bits)
    lo, hi, nb = emit2(lo, hi, nb, jnp.where(is_match, dcodes[dsym], 0), jnp.where(is_match, dl[dsym], 0))
    lo, hi, nb = emit2(lo, hi, nb, dext_val, jnp.where(is_match, dext_bits, 0))

    nb = jnp.where(is_token, nb, 0)
    lo = jnp.where(is_token, lo, jnp.uint32(0))
    hi = jnp.where(is_token, hi, jnp.uint32(0))

    offsets = jnp.cumsum(nb) - nb
    body_end = jnp.sum(nb)

    nwords = -(-(n * 48) // 32) + 4
    words = jnp.zeros(nwords, dtype=jnp.uint32)
    idx = offsets >> 5
    sh = (offsets & 31).astype(jnp.uint32)
    w0 = (lo << sh).astype(jnp.uint32)
    w1 = (jnp.where(sh > 0, lo >> (jnp.uint32(32) - sh), 0) | (hi << sh)).astype(
        jnp.uint32
    )
    w2 = jnp.where(sh > 0, hi >> (jnp.uint32(32) - sh), jnp.uint32(0))
    words = words.at[idx].add(w0)
    words = words.at[idx + 1].add(w1)
    words = words.at[idx + 2].add(w2)

    # EOB
    eidx = body_end >> 5
    esh = (body_end & 31).astype(jnp.uint32)
    ecode = lcodes[256]
    words = words.at[eidx].add((ecode << esh).astype(jnp.uint32))
    words = words.at[eidx + 1].add(
        jnp.where(esh > 0, ecode >> (jnp.uint32(32) - esh), jnp.uint32(0))
    )
    total_bits = body_end + ll[256]
    return words, total_bits


def _floor_log2(jax, jnp, v):
    """floor(log2(v)) for int32 v >= 1 (exact for v < 2^24)."""
    f = v.astype(jnp.float32)
    return (
        jax.lax.bitcast_convert_type(f, jnp.uint32) >> jnp.uint32(23)
    ).astype(jnp.int32) - 127


def sym_fields_v2(jax, jnp, litlen, dist, is_match):
    """Arithmetic litlen/dist symbol mapping (no 32K-table gathers).

    Returns (lsym, lext_bits, lext_val, dsym, dext_bits, dext_val) —
    the RFC 1951 code-point decomposition computed elementwise via the
    float-exponent trick (exact: all operands < 2^16)."""
    l = jnp.clip(litlen - 3, 0, 255)
    e = _floor_log2(jax, jnp, jnp.maximum(l, 1))
    sub = (l >> jnp.maximum(e - 2, 0)) & 3
    lsym_m = jnp.where(
        l < 8, 257 + l, jnp.where(l == 255, 285, 253 + 4 * e + sub)
    )
    lsym = jnp.where(is_match, lsym_m, litlen)
    lext = jnp.where((l < 8) | (l == 255), 0, jnp.maximum(e - 2, 0))
    lext = jnp.where(is_match, lext, 0)
    lext_val = jnp.where(is_match, l & ((1 << lext) - 1), 0)

    v = jnp.clip(dist - 1, 0, WINDOW_SIZE - 1)
    ed = _floor_log2(jax, jnp, jnp.maximum(v, 1))
    dsym = jnp.where(v < 4, v, 2 * ed + ((v >> jnp.maximum(ed - 1, 0)) & 1))
    dext = jnp.where((v < 4) | ~is_match, 0, jnp.maximum(ed - 1, 0))
    dext_val = jnp.where(is_match, v & ((1 << dext) - 1), 0)
    return lsym, lext, lext_val, dsym, dext, dext_val


def pack_block_tables_v2(jax, jnp, is_token, litlen, dist, tables):
    """pack_block_tables with arithmetic symbol mapping and combined
    (code | bits<<24) tables: two gathers per position instead of six.

    tables = (ll i32[288], lcodes u32[288], dl i32[30], dcodes u32[30])."""
    ll, lcodes, dl, dcodes = tables
    lct = lcodes | (ll.astype(jnp.uint32) << jnp.uint32(24))
    dct = dcodes | (dl.astype(jnp.uint32) << jnp.uint32(24))

    n = litlen.shape[0]
    is_match = dist > 0
    lsym, lext, lext_val, dsym, dext, dext_val = sym_fields_v2(
        jax, jnp, litlen, dist, is_match
    )

    le = lct[jnp.clip(lsym, 0, 287)]
    de = jnp.where(is_match, dct[dsym], jnp.uint32(0))
    lcode = le & jnp.uint32(0xFFFFFF)
    lbits = (le >> jnp.uint32(24)).astype(jnp.int32)
    dcode = de & jnp.uint32(0xFFFFFF)
    dbits = (de >> jnp.uint32(24)).astype(jnp.int32)

    def emit2(lo, hi, nb, val, bits):
        val = val.astype(jnp.uint32)
        sh = nb
        shc = jnp.clip(sh, 0, 31).astype(jnp.uint32)
        in_lo = (jnp.where(sh < 32, val, 0) << shc).astype(jnp.uint32)
        spill = jnp.where((sh > 0) & (sh < 32), val >> (jnp.uint32(32) - shc), 0)
        in_hi = jnp.where(
            sh >= 32, val << jnp.clip(sh - 32, 0, 31).astype(jnp.uint32), spill
        )
        return lo | in_lo, (hi | in_hi).astype(jnp.uint32), nb + bits

    lo = lcode
    hi = jnp.zeros(n, dtype=jnp.uint32)
    nb = lbits
    lo, hi, nb = emit2(lo, hi, nb, lext_val, lext)
    lo, hi, nb = emit2(lo, hi, nb, dcode, dbits)
    lo, hi, nb = emit2(lo, hi, nb, dext_val, dext)

    nb = jnp.where(is_token, nb, 0)
    lo = jnp.where(is_token, lo, jnp.uint32(0))
    hi = jnp.where(is_token, hi, jnp.uint32(0))

    offsets = jnp.cumsum(nb) - nb
    body_end = jnp.sum(nb)

    nwords = -(-(n * 48) // 32) + 4
    words = jnp.zeros(nwords, dtype=jnp.uint32)
    idx = offsets >> 5
    sh = (offsets & 31).astype(jnp.uint32)
    w0 = (lo << sh).astype(jnp.uint32)
    w1 = (jnp.where(sh > 0, lo >> (jnp.uint32(32) - sh), 0) | (hi << sh)).astype(
        jnp.uint32
    )
    w2 = jnp.where(sh > 0, hi >> (jnp.uint32(32) - sh), jnp.uint32(0))
    words = words.at[idx].add(w0)
    words = words.at[idx + 1].add(w1)
    words = words.at[idx + 2].add(w2)

    eidx = body_end >> 5
    esh = (body_end & 31).astype(jnp.uint32)
    ecode = lcodes[256]
    words = words.at[eidx].add((ecode << esh).astype(jnp.uint32))
    words = words.at[eidx + 1].add(
        jnp.where(esh > 0, ecode >> (jnp.uint32(32) - esh), jnp.uint32(0))
    )
    total_bits = body_end + ll[256]
    return words, total_bits


def histograms_v2(jax, jnp, is_token, litlen, dist):
    """(lit_freq[286], dist_freq[30]) from a masked tape via the same
    arithmetic symbol mapping as pack_block_tables_v2."""
    is_match = dist > 0
    lsym, _, _, dsym, _, _ = sym_fields_v2(jax, jnp, litlen, dist, is_match)
    w = is_token.astype(jnp.int32)
    lit_freq = jnp.zeros(286, jnp.int32).at[jnp.clip(lsym, 0, 285)].add(w)
    dist_freq = jnp.zeros(30, jnp.int32).at[dsym].add(
        (is_token & is_match).astype(jnp.int32)
    )
    return lit_freq, dist_freq


def _bit_concat(jnp, segments, out_words: int):
    """Concatenate (words u32[], nbits scalar) segments at the bit level
    on device.  Segment word arrays have static length; nbits is traced."""
    out = jnp.zeros(out_words, jnp.uint32)
    pos = jnp.int32(0)
    for w, nb in segments:
        k = w.shape[0]
        s = (pos & 31).astype(jnp.uint32)
        base = pos >> 5
        prev = jnp.concatenate([jnp.zeros(1, jnp.uint32), w[:-1]])
        lo = (w << s).astype(jnp.uint32)
        carry = jnp.where(s > 0, prev >> (jnp.uint32(32) - s), jnp.uint32(0))
        shifted = lo | carry
        tail = jnp.where(
            s > 0, w[-1:] >> (jnp.uint32(32) - s), jnp.zeros(1, jnp.uint32)
        )
        idx = base + jnp.arange(k + 1, dtype=jnp.int32)
        out = out.at[idx].add(jnp.concatenate([shifted, tail]))
        pos = pos + nb
    return out, pos


def _push_words(sink, words, total_bits):
    words = np.asarray(words)
    total_bits = int(total_bits)
    nfull = total_bits >> 5
    if nfull:
        sink.push(words[:nfull].astype(np.uint64), np.full(nfull, 32, dtype=np.int64))
    rem = total_bits & 31
    if rem:
        sink.push_scalar(int(words[nfull]) & ((1 << rem) - 1), rem)


