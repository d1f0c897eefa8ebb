#!/usr/bin/env python
"""Round-5 v3 deflate experiments on the real chip.

1. level-6 baseline after the split-width tree change (vs 39.6 ms r5
   decomposition baseline)
2. k6=0 variant: time saved vs size margins on paradiselost + vertices
3. batch=16 (4 MiB) amortization: ms/MiB vs the 4x256KiB shape
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuzlib.utils.jaxcache import enable_compile_cache

enable_compile_cache()

from tpuzlib.kernels import deflate_device as dd
import tpuzlib.kernels.deflate_device3 as d3


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


def scalar_reduced(fn):
    return jax.jit(
        lambda *a: jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)),
            fn(*a),
            jnp.float32(0),
        )
    )


def timeit(red, args, floor, reps=5):
    np.asarray(red(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(red(*args))
        best = min(best, time.perf_counter() - t0)
    return best - floor


def main():
    floor = floor_time()
    print(f"floor {floor*1e3:.2f} ms", flush=True)
    txt = open("/root/reference/test/paradiselost.txt", "rb").read()
    import zlib

    vert = zlib.decompress(
        open("/root/reference/test/vertices.deflate", "rb").read()
    )

    def args_for(chunk, batch):
        big = np.frombuffer((txt * 80)[: batch * (dd.CTX + chunk)], np.uint8)
        bufs = jnp.asarray(big.reshape(batch, dd.CTX + chunk))
        return (
            bufs,
            jnp.zeros(batch, jnp.int32),
            jnp.full(batch, chunk, jnp.int32),
            jnp.zeros(batch, jnp.int32),
        )

    chunk = 1 << 18
    out_words = min(chunk + 4, (chunk * 10) // 32 + 64)

    # 1. baseline shape with split-width trees
    enc = d3.make_encode_batch_v3(6, chunk, 4, out_words)
    red = scalar_reduced(enc)
    dev = timeit(red, args_for(chunk, 4), floor)
    print(f"b4 split-trees: {dev*1e3:6.1f} ms  {4*chunk/1e6/dev:6.1f} MB/s",
          flush=True)

    # correctness + sizes at this config
    w = d3.deflate_device_v3(
        np.frombuffer(txt, np.uint8), level=6, chunk=chunk, batch=4
    )
    assert zlib.decompress(bytes(w), -15) == txt
    zl = len(zlib.compress(txt, 6)) - 6
    print(f"  para size {len(w)} vs zlib-raw {zl} ({len(w)-zl:+d})",
          flush=True)
    wv = d3.deflate_device_v3(
        np.frombuffer(vert, np.uint8), level=6, chunk=chunk, batch=4
    )
    zv = len(zlib.compress(vert, 6)) - 6
    print(f"  vert size {len(wv)} vs zlib-raw {zv} ({len(wv)-zv:+d})",
          flush=True)

    # 2. k6 = 0
    saved = dict(d3.LEVELS_V3[6])
    d3.LEVELS_V3[6] = dict(saved, k6=0)
    d3._cache.clear()
    try:
        enc0 = d3.make_encode_batch_v3(6, chunk, 4, out_words)
        red0 = scalar_reduced(enc0)
        dev0 = timeit(red0, args_for(chunk, 4), floor)
        print(f"b4 k6=0:        {dev0*1e3:6.1f} ms  "
              f"{4*chunk/1e6/dev0:6.1f} MB/s", flush=True)
        w0 = d3.deflate_device_v3(
            np.frombuffer(txt, np.uint8), level=6, chunk=chunk, batch=4
        )
        assert zlib.decompress(bytes(w0), -15) == txt
        print(f"  para size {len(w0)} ({len(w0)-zl:+d} vs zlib)", flush=True)
        wv0 = d3.deflate_device_v3(
            np.frombuffer(vert, np.uint8), level=6, chunk=chunk, batch=4
        )
        assert zlib.decompress(bytes(wv0), -15) == vert
        print(f"  vert size {len(wv0)} ({len(wv0)-zv:+d} vs zlib)",
              flush=True)
    finally:
        d3.LEVELS_V3[6] = saved
        d3._cache.clear()

    # 3. batch 16 (4 MiB)
    enc16 = d3.make_encode_batch_v3(6, chunk, 16, out_words)
    red16 = scalar_reduced(enc16)
    dev16 = timeit(red16, args_for(chunk, 16), floor, reps=3)
    print(f"b16:            {dev16*1e3:6.1f} ms  "
          f"{16*chunk/1e6/dev16:6.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
