"""Pallas TPU kernel for Adler-32: fused nibble-split + MXU matmul.

The jnp device path (kernels/adler32.py) materializes x * weights in
int32 (4 bytes of HBM traffic per input byte plus the weighted product
array).  This kernel keeps everything in VMEM: each grid step DMAs a
tile of raw bytes, splits them into 4-bit planes on-core, and multiplies
against a resident (B, 8) weight matrix on the MXU — all products stay
exactly representable (bf16 operands <= 15, f32 partials < 2^24), and
only 8 bytes per 2 KiB block leave the core.

Capability parity: device analog of reference src/adler32.ts:26-105
(computeAdler32 NMAX loop); the per-block (S, W) decomposition matches
kernels/adler32.py which is the algorithmic reference.
"""

from __future__ import annotations

import functools

import numpy as np

from .adler32 import MOD, _split, _MASK32

BLOCK = 2048  # bytes per block; W_block <= 255*B*(B+1)/2 < 2^31
TILE = 256  # blocks per grid step (512 KiB of input per step)


@functools.lru_cache()
def _rhs(block: int) -> np.ndarray:
    """(B, 8) weight matrix: col 0 = ones (S), cols 1..3 = the three
    4-bit nibble planes of the descending weights w = B..1 (W)."""
    w = np.arange(block, 0, -1, dtype=np.int64)
    rhs = np.zeros((block, 8), dtype=np.float32)
    rhs[:, 0] = 1.0
    rhs[:, 1] = (w & 15).astype(np.float32)
    rhs[:, 2] = ((w >> 4) & 15).astype(np.float32)
    rhs[:, 3] = ((w >> 8) & 15).astype(np.float32)
    return rhs


@functools.lru_cache()
def _kernel_fn(block: int, tile: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted

    def kernel(mix_ref, blocks_ref, rhs_ref, out_ref):
        raw = blocks_ref[:].astype(jnp.int32)  # (tile, block)
        xh = (raw >> 4).astype(jnp.bfloat16)
        xl = (raw & 15).astype(jnp.bfloat16)
        rhs = rhs_ref[:].astype(jnp.bfloat16)  # (block, 8)
        ah = jnp.dot(xh, rhs, preferred_element_type=jnp.float32)
        al = jnp.dot(xl, rhs, preferred_element_type=jnp.float32)
        # every partial < 2^24 -> exact in f32; assemble in int32
        ah = ah.astype(jnp.int32)
        al = al.astype(jnp.int32)
        s = 16 * ah[:, 0] + al[:, 0]
        w = (
            (16 * ah[:, 1] + al[:, 1])
            + 16 * (16 * ah[:, 2] + al[:, 2])
            + 256 * (16 * ah[:, 3] + al[:, 3])
        )
        out_ref[:] = jnp.pad(jnp.stack([s, w], axis=1), ((0, 0), (0, 6))) + (
            mix_ref[0, 0] & 0
        )

    rhs_np = _rhs(block)

    @jax.jit
    def run(blocks, mix=None):
        # mix: optional (8,128) i32 consumed value-neutrally — timing
        # loops feed their carry through it so XLA cannot hoist the call
        # (round-5 methodology fix; see tools/probe_crc3.py)
        if mix is None:
            mix = jnp.zeros((8, 128), jnp.int32)
        nb = blocks.shape[0]
        grid = nb // tile
        sw = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb, 8), jnp.int32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (0, 0)),
                pl.BlockSpec((tile, block), lambda i: (i, 0)),
                pl.BlockSpec((block, 8), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0)),
            interpret=interpret,
        )(mix, blocks, jnp.asarray(rhs_np))
        s_b = sw[:, 0] % MOD
        w_b = sw[:, 1] % MOD

        # cross-block combine: W += B * (nb-1-b) * S_b  (mod-safe multiply)
        coef = (nb - 1 - jnp.arange(nb, dtype=jnp.int32)) % MOD

        def modmul(a, b):
            hi, lo = b >> 8, b & 0xFF
            return ((a * hi) % MOD * 256 + a * lo) % MOD

        term = modmul(modmul(coef, s_b), jnp.int32(block % MOD))

        def mod_reduce(v):
            while v.shape[0] > 1:
                pad = (-v.shape[0]) % 128
                v = jnp.pad(v, (0, pad))
                v = jnp.sum(v.reshape(-1, 128), axis=1) % MOD
            return v[0]

        return mod_reduce(s_b), mod_reduce((w_b + term) % MOD)

    return run


_scalar_cache = {}


def adler32_device_jit(data, mix=None):
    """Fully-on-device Adler-32 (seed 1) of a u8 device array.

    One jit program (Pallas per-block (S, W) + in-jit mod combine)
    returning a u32 device scalar; the in-jit/pipeline form of
    adler32_device_pallas.  Parity target: src/adler32.ts:26-105.
    `mix`: optional hoist-guard input for timing loops (see
    crc32_pallas.crc32_device_jit)."""
    import jax
    import jax.numpy as jnp

    n = int(data.shape[0])
    fn = _scalar_cache.get(n)
    if fn is None:
        span = BLOCK * TILE
        pad = (-n) % span
        inner = _kernel_fn(BLOCK, TILE)

        @jax.jit
        def run(d, mx):
            padded = jnp.pad(d, (pad, 0))
            s_total, w_total = inner(padded.reshape(-1, BLOCK), mx)
            s1 = (1 + s_total) % MOD
            s2 = ((n % MOD) * 1 + w_total) % MOD
            return (s2.astype(jnp.uint32) << jnp.uint32(16)) | s1.astype(
                jnp.uint32
            )

        fn = _scalar_cache[n] = run
    if mix is None:
        import jax.numpy as jnp

        mix = jnp.zeros((8, 128), jnp.int32)
    return fn(data, mix)


def adler32_device_pallas(data, seed: int = 1) -> int:
    """Adler-32 with the fused Pallas per-block kernel."""
    import jax.numpy as jnp

    n = int(data.shape[0])
    s1_0, s2_0 = _split(seed)
    if n == 0:
        return ((s2_0 << 16) | s1_0) & _MASK32
    span = BLOCK * TILE
    pad = (-n) % span
    if isinstance(data, np.ndarray):
        padded = np.concatenate([np.zeros(pad, dtype=np.uint8), data])
    else:
        padded = jnp.pad(data, (pad, 0))
    blocks = padded.reshape(-1, BLOCK)
    s_total, w_total = _kernel_fn(BLOCK, TILE)(blocks)
    s_total = int(s_total)
    w_total = int(w_total)
    s1 = (s1_0 + s_total) % MOD
    s2 = (s2_0 + (n % MOD) * s1_0 + w_total) % MOD
    return ((s2 << 16) | s1) & _MASK32
