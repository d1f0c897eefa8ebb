"""Pallas TPU kernels for LZ77 match screening (round-3 v3 matcher).

The round-2 matcher burned its time in XLA elementwise storms: the
128-pass near_match_dense and the k-deep shifted compares inside the
sorted probes cost ~250 ms per 256 KiB chunk.  Measured on the v5e
(tools/probe_primitives.py): a Pallas global-shift compare step costs
~0.012 ns/elem — ~100x cheaper than the same step as unfused XLA ops —
while XLA sorts are cheap (0.13-0.6 ms) and XLA gather/scatter are the
expensive primitives (7-14 ns/elem).  So v3 keeps sorts in XLA and moves
every shifted-compare loop in here, with a 16-byte verified screen so
most matches never need the gather-based extension at all.

Both kernels share the layout: flat position arrays viewed as (R, 128)
VMEM tiles; global shift-by-1 is two pltpu.rolls plus a lane select.
Per-position validity (min candidate position, remaining-length cap)
rides in as arrays, which lets one kernel invocation cover a whole flat
BATCH of chunks (chunk ids are folded into the sort keys upstream).

Capability parity: the screening half of reference longest_match
(src/deflate.ts:827-946); candidate generation differs by design (sorted
hash neighborhoods + dense near band instead of hash chains).
"""

from __future__ import annotations

import functools

MIN_MATCH = 3


def _ops(jax, jnp, interpret):
    from jax.experimental.pallas import tpu as pltpu

    if interpret:
        def roll(x, shift, axis):
            return jnp.roll(x, shift, axis=axis)
    else:
        def roll(x, shift, axis):
            return pltpu.roll(x, shift, axis=axis)

    def gshift1(x, lane, row, fill):
        """y[f] = x[f-1] over the flattened (R, 128) order; y[0] = fill."""
        a = roll(x, 1, 1)
        b = roll(a, 1, 0)
        y = jnp.where(lane == 0, b, a)
        return jnp.where((lane == 0) & (row == 0), fill, y)

    def ctz_bytes(x):
        """Trailing zero BYTES of u32 (4 when x == 0), integer byte tests
        (Mosaic has no uint32->float casts)."""
        b0 = (x & jnp.uint32(0xFF)) != 0
        b1 = (x & jnp.uint32(0xFF00)) != 0
        b2 = (x & jnp.uint32(0xFF0000)) != 0
        return jnp.where(
            b0, 0, jnp.where(b1, 1, jnp.where(b2, 2, jnp.where(x != 0, 3, 4)))
        )

    def prefix16(a0, a1, a2, a3, b0, b1, b2, b3):
        """Common prefix bytes (0..16) of two 16-byte windows."""
        x0 = a0 ^ b0
        x1 = a1 ^ b1
        x2 = a2 ^ b2
        x3 = a3 ^ b3
        return jnp.where(
            x0 != 0,
            ctz_bytes(x0),
            jnp.where(
                x1 != 0,
                4 + ctz_bytes(x1),
                jnp.where(x2 != 0, 8 + ctz_bytes(x2), 12 + ctz_bytes(x3)),
            ),
        )

    return gshift1, ctz_bytes, prefix16


def _pack_key(jnp, screen, dist):
    """i32 best-match key: longer screen wins, then closer distance.
    Max value 16<<16 | 0xFFFF < 2^21 — int32 so Mosaic's signed max
    applies (arith.maxui does not legalize)."""
    return (screen.astype(jnp.int32) << 16) | (
        jnp.int32(0xFFFF) - dist.astype(jnp.int32)
    )


@functools.lru_cache()
def _near_kernel(rows: int, nd: int, interpret: bool):
    """Best 16-byte-screened match among distances 1..nd, per position.

    in: w0..w3 (R,128) u32 window words (+0,+4,+8,+12 bytes);
        mincand (R,128) i32 lowest valid candidate position;
        lim (R,128) i32 per-position screen cap (0..16)
    out: packed key (R,128) u32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gshift1, _, prefix16 = _ops(jax, jnp, interpret)

    def kernel(w0_ref, w1_ref, w2_ref, w3_ref, mc_ref, lim_ref, out_ref):
        w0, w1, w2, w3 = w0_ref[:], w1_ref[:], w2_ref[:], w3_ref[:]
        mincand = mc_ref[:]
        lim = lim_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, w0.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, w0.shape, 0)
        pos = row * 128 + lane
        zero = jnp.uint32(0)
        s0, s1, s2, s3 = w0, w1, w2, w3
        best = jnp.zeros(w0.shape, jnp.int32)
        for d in range(1, nd + 1):
            s0 = gshift1(s0, lane, row, zero)
            s1 = gshift1(s1, lane, row, zero)
            s2 = gshift1(s2, lane, row, zero)
            s3 = gshift1(s3, lane, row, zero)
            sc = prefix16(w0, w1, w2, w3, s0, s1, s2, s3)
            sc = jnp.minimum(sc, lim)
            ok = (pos - d >= mincand) & (sc >= MIN_MATCH)
            key = jnp.where(ok, _pack_key(jnp, sc, jnp.int32(d)), 0)
            best = jnp.maximum(best, key)
        out_ref[:] = best

    def run(w0, w1, w2, w3, mc, lim):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(w0, w1, w2, w3, mc, lim)

    return run


def near_screen(jax, jnp, w0, w1, w2, w3, mincand, lim16, nd):
    """Position-domain near-band screen over flat (total,) arrays
    (total % 128 == 0).  Returns flat packed keys."""
    total = w0.shape[0]
    rows = total // 128
    interpret = jax.default_backend() != "tpu"
    r = lambda x: x.reshape(rows, 128)
    out = _near_kernel(rows, nd, interpret)(
        r(w0), r(w1), r(w2), r(w3), r(mincand), r(lim16)
    )
    return out.reshape(total)


@functools.lru_cache()
def _far_kernel(rows: int, k: int, interpret: bool):
    """Sorted-domain probe screen: for each row of the stable
    (hash, pos, window) sort, check the k previous rows (the k most
    recent same-hash predecessors — the sorted-domain image of a
    hash-chain walk, reference deflate.ts:860-941).  Candidate validity
    is encoded upstream as sentinel hashes, and screens are length-
    clipped afterwards in the position domain, so the kernel needs no
    per-position metadata.

    in: sh (R,128) i32 sorted composite hashes (chunk id folded in);
        sp (R,128) i32 sorted global positions;
        s0..s3 (R,128) u32 sorted window words
    out: packed key (R,128) i32 (sorted domain)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gshift1, _, prefix16 = _ops(jax, jnp, interpret)
    WINDOW = 1 << 15

    def kernel(sh_ref, sp_ref, s0_ref, s1_ref, s2_ref, s3_ref, out_ref):
        sh, sp = sh_ref[:], sp_ref[:]
        w0, w1, w2, w3 = s0_ref[:], s1_ref[:], s2_ref[:], s3_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, sh.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, sh.shape, 0)
        zero = jnp.uint32(0)
        mone = jnp.int32(-1)
        ch, cp = sh, sp
        c0, c1, c2, c3 = w0, w1, w2, w3
        best = jnp.zeros(w0.shape, jnp.int32)
        for _ in range(k):
            ch = gshift1(ch, lane, row, mone)
            cp = gshift1(cp, lane, row, mone)
            c0 = gshift1(c0, lane, row, zero)
            c1 = gshift1(c1, lane, row, zero)
            c2 = gshift1(c2, lane, row, zero)
            c3 = gshift1(c3, lane, row, zero)
            d = sp - cp
            ok = (ch == sh) & (d >= 1) & (d <= WINDOW)
            sc = prefix16(w0, w1, w2, w3, c0, c1, c2, c3)
            key = jnp.where(ok & (sc >= MIN_MATCH), _pack_key(jnp, sc, d), 0)
            best = jnp.maximum(best, key)
        out_ref[:] = best

    def run(sh, sp, s0, s1, s2, s3):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(sh, sp, s0, s1, s2, s3)

    return run


def far_screen(jax, jnp, sh, sp, s0, s1, s2, s3, k):
    """Sorted-domain k-deep probe screen.  Flat (total,) inputs from a
    stable lax.sort by composite hash; returns flat packed keys."""
    total = sh.shape[0]
    rows = total // 128
    interpret = jax.default_backend() != "tpu"
    r = lambda x: x.reshape(rows, 128)
    out = _far_kernel(rows, k, interpret)(
        r(sh), r(sp), r(s0), r(s1), r(s2), r(s3)
    )
    return out.reshape(total)
