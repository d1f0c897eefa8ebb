"""Pallas TPU kernels for LZ77 match screening (v3 matcher, gridded).

The round-2 matcher burned its time in XLA elementwise storms: the 128
-pass near_match_dense and the k-deep shifted compares inside the sorted
probes cost ~250 ms per 256 KiB chunk.  Measured on the v5e
(tools/probe_primitives.py): a Pallas global-shift compare step costs
~0.012 ns/elem — ~100x cheaper than the same step as unfused XLA ops —
while XLA sorts are cheap (0.13-0.6 ms) and XLA gather/scatter are the
expensive primitives (7-14 ns/elem).  So v3 keeps sorts in XLA and moves
every shifted-compare loop in here, with a 16-byte verified screen so
most matches never need the gather-based extension at all.

Round 4: the kernels are GRIDDED.  The round-3 versions loaded the whole
flat batch into VMEM with no grid — at the bench shape (batch 4 x
256 KiB) that is an 80 MB VMEM ask against the 16 MB limit, verified
OOM on the chip.  Now each grid step owns a (TR, 128) tile plus a one-
row halo from the previous tile: the shift-register recurrences need at
most `depth` flattened predecessors and depth <= 48 < 128, so a single
(1, 128) halo row per shifted operand carries the entire cross-tile
dependency.  Tile-0 halos hold the old global fill values (zero window
words, -1 hash/pos sentinels), so semantics are bit-identical to the
ungridded kernels.

Both kernels share the layout: flat position arrays viewed as (R, 128)
VMEM tiles; global shift-by-1 is two pltpu.rolls plus a lane select.
Per-position validity (max candidate distance, remaining-length cap)
rides in as arrays, which lets one kernel invocation cover a whole flat
BATCH of chunks (chunk ids are folded into the sort keys upstream).

Capability parity: the screening half of reference longest_match
(src/deflate.ts:827-946); candidate generation differs by design (sorted
hash neighborhoods + dense near band instead of hash chains).
"""

from __future__ import annotations

import functools

MIN_MATCH = 3

# rows per grid step.  VMEM per step: ~6 double-buffered (TR,128) i32
# inputs + ~12 live (TR+1,128) intermediates ~= 7 MB at TR=512, well
# under the 16 MB budget; TR=1024 would not leave room for the pipeline.
TR = 512


def _ops(jax, jnp, interpret):
    from jax.experimental.pallas import tpu as pltpu

    if interpret:
        def roll(x, shift, axis):
            return jnp.roll(x, shift, axis=axis)
    else:
        def roll(x, shift, axis):
            return pltpu.roll(x, shift, axis=axis)

    def gshift1(x, lane):
        """y[f] = x[f-1] over the flattened (R, 128) order.  Row 0 is the
        halo row: after d applications its first d lanes hold roll
        wrap-around garbage, which never reaches row 1+ while d < 128."""
        a = roll(x, 1, 1)
        b = roll(a, 1, 0)
        return jnp.where(lane == 0, b, a)

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


def _halo_rows(jnp, rows, tiles, fill):
    """(tiles, 128) halo rows for a (tiles*TR, 128) view: tile t's halo
    = last row of tile t-1; tile 0's halo = fill."""
    lasts = rows[TR - 1 :: TR]  # last row of each tile
    return jnp.concatenate(
        [jnp.full((1, 128), fill, rows.dtype), lasts[:-1]], axis=0
    )


def _pack_halos(jnp, halos, dtype):
    """Stack per-operand (tiles, 128) halo rows into ONE (tiles, 8, 128)
    operand (TPU blocks need sublane dims divisible by 8; rows past
    len(halos) are zero padding)."""
    tiles = halos[0].shape[0]
    stack = jnp.stack(halos, axis=1).astype(dtype)  # (tiles, n, 128)
    pad = 8 - len(halos)
    if pad:
        stack = jnp.concatenate(
            [stack, jnp.zeros((tiles, pad, 128), dtype)], axis=1
        )
    return stack


def _pad_flat(jnp, arrs_fills):
    """Pad flat arrays to a multiple of TR*128 with per-array fills.
    Returns (padded_list, total_padded, tiles)."""
    total = arrs_fills[0][0].shape[0]
    span = TR * 128
    padded_total = -(-total // span) * span
    pad = padded_total - total
    out = []
    for a, fill in arrs_fills:
        if pad:
            a = jnp.concatenate([a, jnp.full(pad, fill, a.dtype)])
        out.append(a)
    return out, padded_total, padded_total // span


@functools.lru_cache()
def _near_kernel(tiles: int, nd: int, interpret: bool):
    """Best 16-byte-screened match among distances 1..nd, per position.

    Gridded over `tiles` steps of (TR, 128) positions.  Inputs per step:
      w0..w3   (TR, 128) u32 window words (+0,+4,+8,+12 bytes)
      halos    (1, 8, 128) u32 — rows 0..3 = previous tile's last row of
               w0..w3 (8-row padded: TPU blocks need sublane dims % 8)
      maxd     (TR, 128) i32 max valid candidate distance (pos - mincand)
      lim      (TR, 128) i32 per-position screen cap (0..16)
    out: packed key (TR, 128) i32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gshift1, _, prefix16 = _ops(jax, jnp, interpret)

    def kernel(w0_ref, w1_ref, w2_ref, w3_ref, halo_ref,
               maxd_ref, lim_ref, out_ref):
        # full (TR+1, 128) tiles: halo row 0 + TR data rows
        h = halo_ref[0]
        w0 = jnp.concatenate([h[0:1], w0_ref[:]], axis=0)
        w1 = jnp.concatenate([h[1:2], w1_ref[:]], axis=0)
        w2 = jnp.concatenate([h[2:3], w2_ref[:]], axis=0)
        w3 = jnp.concatenate([h[3:4], w3_ref[:]], axis=0)
        maxd = maxd_ref[:]
        lim = lim_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, w0.shape, 1)
        s0, s1, s2, s3 = w0, w1, w2, w3
        best = jnp.zeros((TR, 128), jnp.int32)
        for d in range(1, nd + 1):
            s0 = gshift1(s0, lane)
            s1 = gshift1(s1, lane)
            s2 = gshift1(s2, lane)
            s3 = gshift1(s3, lane)
            sc = prefix16(w0, w1, w2, w3, s0, s1, s2, s3)[1:]
            sc = jnp.minimum(sc, lim)
            ok = (d <= maxd) & (sc >= MIN_MATCH)
            key = jnp.where(ok, _pack_key(jnp, sc, jnp.int32(d)), 0)
            best = jnp.maximum(best, key)
        out_ref[:] = best

    def run(w0, w1, w2, w3, halos, maxd, lim):
        main = pl.BlockSpec((TR, 128), lambda t: (t, 0))
        halo = pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((tiles * TR, 128), jnp.int32),
            grid=(tiles,),
            in_specs=[main] * 4 + [halo] + [main] * 2,
            out_specs=main,
            interpret=interpret,
        )(w0, w1, w2, w3, halos, maxd, lim)

    return run


def near_screen(jax, jnp, w0, w1, w2, w3, mincand, lim16, nd):
    """Position-domain near-band screen over flat (total,) arrays
    (total % 128 == 0).  Returns flat packed keys."""
    total = w0.shape[0]
    pos = jnp.arange(total, dtype=jnp.int32)
    maxd = pos - mincand  # d <= maxd  <=>  pos - d >= mincand
    interpret = jax.default_backend() != "tpu"
    (w0, w1, w2, w3, maxd, lim16), _, tiles = _pad_flat(
        jnp,
        [(w0, 0), (w1, 0), (w2, 0), (w3, 0), (maxd, 0), (lim16, 0)],
    )
    mains = [x.reshape(tiles * TR, 128) for x in (w0, w1, w2, w3)]
    halos = _pack_halos(
        jnp, [_halo_rows(jnp, m, tiles, 0) for m in mains], jnp.uint32
    )
    out = _near_kernel(tiles, nd, interpret)(
        *mains, halos,
        maxd.reshape(tiles * TR, 128), lim16.reshape(tiles * TR, 128),
    )
    return out.reshape(tiles * TR * 128)[:total]


@functools.lru_cache()
def _far_kernel(tiles: int, k: int, interpret: bool):
    """Sorted-domain probe screen: for each row of the stable
    (hash, pos, window) sort, check the k previous rows (the k most
    recent same-hash predecessors — the sorted-domain image of a
    hash-chain walk, reference deflate.ts:860-941).  Candidate validity
    is encoded upstream as sentinel hashes, and screens are length-
    clipped afterwards in the position domain, so the kernel needs no
    per-position metadata.

    Gridded like _near_kernel: per step, main (TR, 128) tiles of
    sh/sp/s0..s3 plus packed (1, 8, 128) halo arrays (i32: sh/sp rows;
    u32: s0..s3 rows).
    out: packed key (TR, 128) i32 (sorted domain)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gshift1, _, prefix16 = _ops(jax, jnp, interpret)
    WINDOW = 1 << 15

    def kernel(sh_ref, sp_ref, s0_ref, s1_ref, s2_ref, s3_ref,
               hi_ref, hu_ref, out_ref):
        hi = hi_ref[0]
        hu = hu_ref[0]
        sh = jnp.concatenate([hi[0:1], sh_ref[:]], axis=0)
        sp = jnp.concatenate([hi[1:2], sp_ref[:]], axis=0)
        w0 = jnp.concatenate([hu[0:1], s0_ref[:]], axis=0)
        w1 = jnp.concatenate([hu[1:2], s1_ref[:]], axis=0)
        w2 = jnp.concatenate([hu[2:3], s2_ref[:]], axis=0)
        w3 = jnp.concatenate([hu[3:4], s3_ref[:]], axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, sh.shape, 1)
        zero = jnp.uint32(0)
        ch, cp = sh, sp
        c0, c1, c2, c3 = w0, w1, w2, w3
        best = jnp.zeros((TR, 128), jnp.int32)
        for _ in range(k):
            ch = gshift1(ch, lane)
            cp = gshift1(cp, lane)
            c0 = gshift1(c0, lane)
            c1 = gshift1(c1, lane)
            c2 = gshift1(c2, lane)
            c3 = gshift1(c3, lane)
            d = (sp - cp)[1:]
            ok = (ch[1:] == sh[1:]) & (d >= 1) & (d <= WINDOW)
            sc = prefix16(w0, w1, w2, w3, c0, c1, c2, c3)[1:]
            key = jnp.where(ok & (sc >= MIN_MATCH), _pack_key(jnp, sc, d), 0)
            best = jnp.maximum(best, key)
        out_ref[:] = best

    def run(sh, sp, s0, s1, s2, s3, halos_i, halos_u):
        main = pl.BlockSpec((TR, 128), lambda t: (t, 0))
        halo = pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((tiles * TR, 128), jnp.int32),
            grid=(tiles,),
            in_specs=[main] * 6 + [halo] * 2,
            out_specs=main,
            interpret=interpret,
        )(sh, sp, s0, s1, s2, s3, halos_i, halos_u)

    return run


def far_screen(jax, jnp, sh, sp, s0, s1, s2, s3, k):
    """Sorted-domain k-deep probe screen.  Flat (total,) inputs from a
    stable lax.sort by composite hash; returns flat packed keys.

    Pad rows (if total is not a tile multiple) take hash -2 / pos 0 so
    adjacent pads yield d == 0 and can never form a match."""
    total = sh.shape[0]
    interpret = jax.default_backend() != "tpu"
    (sh, sp, s0, s1, s2, s3), _, tiles = _pad_flat(
        jnp, [(sh, -2), (sp, 0), (s0, 0), (s1, 0), (s2, 0), (s3, 0)]
    )
    mains_i = [x.reshape(tiles * TR, 128) for x in (sh, sp)]
    mains_u = [x.reshape(tiles * TR, 128) for x in (s0, s1, s2, s3)]
    halos_i = _pack_halos(
        jnp, [_halo_rows(jnp, m, tiles, -1) for m in mains_i], jnp.int32
    )
    halos_u = _pack_halos(
        jnp, [_halo_rows(jnp, m, tiles, 0) for m in mains_u], jnp.uint32
    )
    out = _far_kernel(tiles, k, interpret)(
        *mains_i, *mains_u, halos_i, halos_u
    )
    return out.reshape(tiles * TR * 128)[:total]
