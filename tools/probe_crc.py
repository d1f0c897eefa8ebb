#!/usr/bin/env python
"""CRC-32 device kernel decomposition + restructure probe (round 5).

BENCH_r04 recorded tpu_crc32_dev = 2.48 GB/s vs the >=5 GB/s bar.  The
MXU-ideal for the GF(2) formulation is ~385 GB/s (512 FLOP/byte at 197
TFLOP/s bf16), so the 2.5 GB/s number is structural, not fundamental.
This probe times, on the real chip, with the bench's one-big-loop-minus-
floor method:

  read   — HBM read upper bound (sum of bytes)
  forms  — the per-block Pallas linear-forms kernel alone (current)
  comb   — the log-depth GF(2) combine tree alone
  v_i8   — per-plane matmuls in int8 (MXU int8 path, 2x bf16 rate)
  v_cat  — ONE matmul with K=8*block (planes concatenated on lanes)
  v_big  — bigger block/tile variants

Run:  python tools/probe_crc.py
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


def loop_time(fn, init, floor, k=64, reps=3):
    f = jax.jit(lambda x, n: lax.fori_loop(0, n, fn, x))

    def run(n):
        t0 = time.perf_counter()
        r = f(init, n)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
        return time.perf_counter() - t0

    run(1)
    t = min(run(k) for _ in range(reps))
    per = (t - floor) / k
    return per


def report(name, per):
    print(f"{name:28s} {per*1e3:8.3f} ms/pass  {N/per/1e9:8.2f} GB/s", flush=True)


def make_forms_kernel(block, tile, mode):
    """mode: 'plane_bf16' (current), 'plane_i8', 'cat_bf16', 'cat_i8'."""
    interpret = jax.default_backend() != "tpu"

    m_raw = crc_k.block_matrix_bits(block)  # (8B, 32) int8, row j*8+i
    m_bits = np.concatenate([m_raw[i::8] for i in range(8)])

    if mode.startswith("plane"):
        def kernel(blocks_ref, m_ref, out_ref):
            raw = blocks_ref[:].astype(jnp.int32)
            if mode.endswith("i8"):
                acc = jnp.zeros((tile, 32), jnp.int32)
                for i in range(8):
                    bits_i = ((raw >> i) & 1).astype(jnp.int8)
                    m_i = m_ref[i * block : (i + 1) * block, :]
                    acc = acc + jnp.dot(
                        bits_i, m_i, preferred_element_type=jnp.int32
                    )
                out_ref[:] = acc & 1
            else:
                acc = jnp.zeros((tile, 32), jnp.float32)
                for i in range(8):
                    bits_i = ((raw >> i) & 1).astype(jnp.bfloat16)
                    m_i = m_ref[i * block : (i + 1) * block, :].astype(
                        jnp.bfloat16
                    )
                    acc = acc + jnp.dot(
                        bits_i, m_i, preferred_element_type=jnp.float32
                    )
                out_ref[:] = acc.astype(jnp.int32) & 1
    else:
        def kernel(blocks_ref, m_ref, out_ref):
            raw = blocks_ref[:].astype(jnp.int32)
            planes = [(raw >> i) & 1 for i in range(8)]
            cat = jnp.concatenate(planes, axis=1)  # (tile, 8*block)
            if mode.endswith("i8"):
                out_ref[:] = (
                    jnp.dot(
                        cat.astype(jnp.int8), m_ref[:],
                        preferred_element_type=jnp.int32,
                    )
                    & 1
                )
            else:
                out_ref[:] = (
                    jnp.dot(
                        cat.astype(jnp.bfloat16),
                        m_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32)
                    & 1
                )

    @jax.jit
    def run(blocks):
        nb = blocks.shape[0]
        g = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb, 32), jnp.int32),
            grid=(nb // tile,),
            in_specs=[
                pl.BlockSpec((tile, block), lambda i: (i, 0)),
                pl.BlockSpec((block * 8, 32), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tile, 32), lambda i: (i, 0)),
            interpret=interpret,
        )(blocks, jnp.asarray(m_bits))
        return g

    return run


def main():
    floor = floor_time()
    print(f"dispatch floor {floor*1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, N, np.uint8)
    d = jax.device_put(jnp.asarray(data))
    jax.block_until_ready(d)
    import zlib
    want = np.uint32(zlib.crc32(data.tobytes()))

    # --- HBM read upper bound ------------------------------------------
    def read_body(i, st):
        dd, acc = st
        dd = dd.at[0].set((acc & 127).astype(jnp.uint8))
        return dd, acc + jnp.sum(dd, dtype=jnp.int32)

    per = loop_time(read_body, (d, jnp.int32(0)), floor, k=64)
    report("read+sum", per)

    # --- current full jit ----------------------------------------------
    from tpuzlib.kernels.crc32_pallas import crc32_device_jit

    v = crc32_device_jit(d)
    assert np.uint32(v) == want, (hex(int(v)), hex(int(want)))

    def full_body(i, st):
        dd, acc = st
        dd = dd.at[0].set((acc & 127).astype(jnp.uint8))
        return dd, acc ^ crc32_device_jit(dd)

    per = loop_time(full_body, (d, jnp.uint32(0)), floor, k=64)
    report("full (r4 baseline)", per)

    # --- forms alone / combine alone (current shapes) -------------------
    from tpuzlib.kernels import crc32_pallas as cp

    for mode in ("plane_bf16", "plane_i8", "cat_bf16", "cat_i8"):
        for block, tile in ((1024, 256), (4096, 256), (4096, 512)):
            try:
                fk = make_forms_kernel(block, tile, mode)
                blocks = d.reshape(-1, block)
                g0 = np.asarray(fk(blocks))
                # correctness of forms: combine on host must give the crc
                l_data = crc_k._combine_blocks(
                    np.sum(
                        g0.astype(np.uint32)
                        << np.arange(32, dtype=np.uint32)[None, :],
                        axis=1, dtype=np.uint32,
                    )
                    if g0.ndim == 2 and g0.shape[1] == 32
                    else g0,
                    block,
                )
                got = crc_k._finish(l_data, N, 0)
                ok = np.uint32(got) == want

                def body(i, st, fk=fk, block=block):
                    dd, acc = st
                    dd = dd.at[0].set((acc & 127).astype(jnp.uint8))
                    g = fk(dd.reshape(-1, block))
                    return dd, acc ^ jnp.sum(g, dtype=jnp.int32).astype(
                        jnp.uint32
                    )

                per = loop_time(body, (d, jnp.uint32(0)), floor, k=64)
                report(
                    f"forms {mode} B{block} T{tile}"
                    + ("" if ok else " [BAD]"),
                    per,
                )
            except Exception as e:
                print(f"forms {mode} B{block} T{tile}: {type(e).__name__} "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
