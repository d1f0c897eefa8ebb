#!/usr/bin/env python
"""CRC probe round 2: isolate WHERE the 22.7 ms/64MB goes.

probe_crc.py showed forms==read+sum==~22.7ms while adler does 6.6ms on
the same data — so the cost is not the MXU and not the grid; suspects:
the loop body's at[0].set copy, the 1-D u8 reduce, the u8->i32 unpack,
or the bf16 conversion/packing.
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
    return (t - floor) / k


def report(name, per, nbytes=N):
    print(f"{name:30s} {per*1e3:8.3f} ms/pass  {nbytes/per/1e9:8.2f} GB/s",
          flush=True)


def main():
    floor = floor_time()
    print(f"dispatch floor {floor*1e3:.2f} ms", flush=True)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, N, np.uint8)
    d = jax.device_put(jnp.asarray(data))
    jax.block_until_ready(d)

    # 1. copy-only: is the at[0].set carry mutation the cost?
    def copy_body(i, st):
        dd, acc = st
        dd = dd.at[0].set((acc & 127).astype(jnp.uint8))
        return dd, acc + dd[0].astype(jnp.int32)

    report("copyonly", loop_time(copy_body, (d, jnp.int32(0)), floor))

    # 2. 2-D staged reduce instead of flat 1-D
    def read2d_body(i, st):
        dd, acc = st
        dd = dd.at[0].set((acc & 127).astype(jnp.uint8))
        s = jnp.sum(
            jnp.sum(dd.reshape(65536, 1024), axis=1, dtype=jnp.int32),
            dtype=jnp.int32,
        )
        return dd, acc + s

    report("read2d", loop_time(read2d_body, (d, jnp.int32(0)), floor))

    # 3. Pallas read-only kernel (sum per tile) — DMA + VPU reduce only
    def mk_sum_kernel(tile, block):
        interp = jax.default_backend() != "tpu"

        def kernel(b_ref, o_ref):
            o_ref[:] = jnp.sum(
                b_ref[:].astype(jnp.int32), axis=1, keepdims=True
            ) * jnp.ones((1, 128), jnp.int32)

        @jax.jit
        def run(blocks):
            nb = blocks.shape[0]
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((nb, 128), jnp.int32),
                grid=(nb // tile,),
                in_specs=[pl.BlockSpec((tile, block), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0)),
                interpret=interp,
            )(blocks)

        return run

    sk = mk_sum_kernel(256, 1024)

    def psum_body(i, st):
        dd, acc = st
        dd = dd.at[0].set((acc & 127).astype(jnp.uint8))
        g = sk(dd.reshape(-1, 1024))
        return dd, acc + jnp.sum(g[:, 0], dtype=jnp.int32)

    report("pallas read+rowsum", loop_time(psum_body, (d, jnp.int32(0)), floor))

    # 4. Pallas unpack-only: 8 planes extracted in u8, summed, no matmul
    def mk_unpack_kernel(tile, block, mode):
        interp = jax.default_backend() != "tpu"

        def kernel(b_ref, o_ref):
            if mode == "u8":
                raw = b_ref[:]
                acc = jnp.zeros((tile, block), jnp.uint8)
                for i in range(8):
                    acc = acc + ((raw >> i) & 1)
                acc32 = acc.astype(jnp.int32)
            elif mode == "i32":
                raw = b_ref[:].astype(jnp.int32)
                acc32 = jnp.zeros((tile, block), jnp.int32)
                for i in range(8):
                    acc32 = acc32 + ((raw >> i) & 1)
            else:  # bf16: includes the conversion the matmul needs
                raw = b_ref[:].astype(jnp.int32)
                accb = jnp.zeros((tile, block), jnp.bfloat16)
                for i in range(8):
                    accb = accb + ((raw >> i) & 1).astype(jnp.bfloat16)
                acc32 = accb.astype(jnp.int32)
            o_ref[:] = jnp.sum(acc32, axis=1, keepdims=True) * jnp.ones(
                (1, 128), jnp.int32
            )

        @jax.jit
        def run(blocks):
            nb = blocks.shape[0]
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((nb, 128), jnp.int32),
                grid=(nb // tile,),
                in_specs=[pl.BlockSpec((tile, block), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0)),
                interpret=interp,
            )(blocks)

        return run

    for mode in ("u8", "i32", "bf16"):
        uk = mk_unpack_kernel(256, 1024, mode)

        def ub(i, st, uk=uk):
            dd, acc = st
            dd = dd.at[0].set((acc & 127).astype(jnp.uint8))
            g = uk(dd.reshape(-1, 1024))
            return dd, acc + jnp.sum(g[:, 0], dtype=jnp.int32)

        report(f"pallas unpack {mode}", loop_time(ub, (d, jnp.int32(0)), floor))

    # 5. matmul-only: pre-unpacked bf16 bits (512 MB resident), same
    #    matmul shapes as the forms kernel — pure DMA+MXU cost at 8x data
    tile, block = 256, 1024
    m_raw = crc_k.block_matrix_bits(block)
    m_bits = np.concatenate([m_raw[i::8] for i in range(8)])
    interp = jax.default_backend() != "tpu"

    def mm_kernel(bits_ref, m_ref, o_ref):
        acc = jnp.zeros((tile, 32), jnp.float32)
        for i in range(8):
            acc = acc + jnp.dot(
                bits_ref[:, i * block : (i + 1) * block],
                m_ref[i * block : (i + 1) * block, :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        o_ref[:] = acc.astype(jnp.int32) & 1

    @jax.jit
    def mm_run(bits):
        nb = bits.shape[0]
        return pl.pallas_call(
            mm_kernel,
            out_shape=jax.ShapeDtypeStruct((nb, 32), jnp.int32),
            grid=(nb // tile,),
            in_specs=[
                pl.BlockSpec((tile, 8 * block), lambda i: (i, 0)),
                pl.BlockSpec((block * 8, 32), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tile, 32), lambda i: (i, 0)),
            interpret=interp,
        )(bits, jnp.asarray(m_bits))

    # 8 MB worth of blocks pre-unpacked (64 MB bf16) to keep HBM modest
    small = data[: 8 << 20]
    bits_np = np.zeros((small.size // block, 8 * block), np.float32)
    arr = small.reshape(-1, block)
    for i in range(8):
        bits_np[:, i * block : (i + 1) * block] = (arr >> i) & 1
    bits_d = jax.device_put(jnp.asarray(bits_np, jnp.bfloat16))
    jax.block_until_ready(bits_d)

    def mm_body(i, st):
        bb, acc = st
        bb = bb.at[0, 0].set((acc & 1).astype(jnp.bfloat16))
        g = mm_run(bb)
        return bb, acc + jnp.sum(g, dtype=jnp.int32)

    per = loop_time(mm_body, (bits_d, jnp.int32(0)), floor, k=64)
    report("matmul-only (8MB data)", per, nbytes=8 << 20)


if __name__ == "__main__":
    main()
