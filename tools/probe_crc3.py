#!/usr/bin/env python
"""CRC probe round 3: COPY-FREE loop timing.

probe_crc2 exposed a measurement artifact: the `d.at[0].set(...)` carry
mutation in the r4 loop-timing method costs ~22.5 ms/iteration (a full
64 MB copy XLA fails to elide), dominating every checksum 'device-time'
number recorded in round 4.  Here the loop carry feeds the KERNEL as a
tiny (8,128) mix input instead — XLA cannot hoist the pallas_call
because its input changes, and no big array is ever copied.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuzlib.utils.jaxcache import enable_compile_cache
from tpuzlib.kernels import crc32 as crc_k

enable_compile_cache()

N = 64 << 20


def floor_time():
    tiny = jax.jit(lambda x: x + 1)
    tz = jnp.zeros(8, jnp.int32)
    np.asarray(tiny(tz))
    fl = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny(tz))
        fl = min(fl, time.perf_counter() - t0)
    return fl


def loop_time_seeded(fn, floor, k=256, reps=3):
    """fn(seed_scalar) -> scalar; loop carries only the scalar."""
    f = jax.jit(lambda s, n: lax.fori_loop(0, n, lambda i, a: fn(a), s))

    def run(n):
        t0 = time.perf_counter()
        r = f(jnp.int32(1), n)
        np.asarray(r)
        return time.perf_counter() - t0

    run(1)
    t = min(run(k) for _ in range(reps))
    return (t - floor) / k


def report(name, per, nbytes=N):
    print(f"{name:34s} {per*1e3:8.3f} ms/pass  {nbytes/per/1e9:8.2f} GB/s",
          flush=True)


def make_forms_seeded(block, tile):
    """Current per-plane bf16 forms kernel + a (8,128) mix input that the
    kernel folds into its output (loop-hoist guard, no data copy)."""
    interp = jax.default_backend() != "tpu"
    m_raw = crc_k.block_matrix_bits(block)
    m_bits = np.concatenate([m_raw[i::8] for i in range(8)])

    def kernel(mix_ref, blocks_ref, m_ref, out_ref):
        raw = blocks_ref[:].astype(jnp.int32)
        acc = jnp.zeros((tile, 32), jnp.float32)
        for i in range(8):
            bits_i = ((raw >> i) & 1).astype(jnp.bfloat16)
            m_i = m_ref[i * block : (i + 1) * block, :].astype(jnp.bfloat16)
            acc = acc + jnp.dot(bits_i, m_i, preferred_element_type=jnp.float32)
        g = acc.astype(jnp.int32) & 1
        out_ref[:] = g ^ (mix_ref[0, 0] & 0)  # consume mix, value-neutral

    @jax.jit
    def run(blocks, mix):
        nb = blocks.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb, 32), jnp.int32),
            grid=(nb // tile,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (0, 0)),
                pl.BlockSpec((tile, block), lambda i: (i, 0)),
                pl.BlockSpec((block * 8, 32), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tile, 32), lambda i: (i, 0)),
            interpret=interp,
        )(mix, blocks, jnp.asarray(m_bits))

    return run


def main():
    floor = floor_time()
    print(f"dispatch floor {floor*1e3:.2f} ms", flush=True)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, N, np.uint8)
    d = jax.device_put(jnp.asarray(data))
    jax.block_until_ready(d)

    # forms alone, copy-free
    for block, tile in ((1024, 256), (4096, 256), (1024, 1024)):
        try:
            fk = make_forms_seeded(block, tile)
            blocks = d.reshape(-1, block)

            def body(a, fk=fk, blocks=blocks):
                mix = jnp.full((8, 128), a, jnp.int32)
                g = fk(blocks, mix)
                return jnp.sum(g, dtype=jnp.int32)

            per = loop_time_seeded(body, floor, k=256)
            report(f"forms(copy-free) B{block} T{tile}", per)
        except Exception as e:
            print(f"B{block} T{tile}: {type(e).__name__} {str(e)[:100]}",
                  flush=True)

    # full crc (forms + in-jit combine tree), copy-free: seed via mix
    from tpuzlib.kernels import crc32_pallas as cp

    fk = make_forms_seeded(cp.BLOCK, cp.TILE)
    mats_np = [
        jnp.asarray(cp._combine_matbits(cp.BLOCK, lvl)) for lvl in range(17)
    ]
    nb = N // cp.BLOCK
    size = 1 << (nb - 1).bit_length()

    def full_body(a):
        mix = jnp.full((8, 128), a, jnp.int32)
        g = fk(d.reshape(-1, cp.BLOCK), mix)
        weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
        v = jnp.sum(g.astype(jnp.uint32) * weights[None, :], axis=1,
                    dtype=jnp.uint32)
        if size != nb:
            v = jnp.concatenate([jnp.zeros(size - nb, jnp.uint32), v])
        for lvl in range(size.bit_length() - 1):
            v = cp._gf2_apply_device(jnp, mats_np[lvl], v[0::2]) ^ v[1::2]
        return v[0].astype(jnp.int32)

    per = loop_time_seeded(full_body, floor, k=256)
    report("full crc (copy-free)", per)

    # adler for comparison, copy-free via its seed argument if possible
    from tpuzlib.kernels.adler32_pallas import adler32_device_jit
    import inspect

    sig = inspect.signature(adler32_device_jit)
    print("adler sig:", sig, flush=True)

    def adl_body(a):
        return adler32_device_jit(d).astype(jnp.int32) ^ a

    # NOTE: hoistable (d constant)! reported only as an upper bound
    per = loop_time_seeded(adl_body, floor, k=256)
    report("adler HOISTABLE lower-bound", per)


if __name__ == "__main__":
    main()
