#!/usr/bin/env python
"""v3 deflate post-token stage decomposition on the real chip (round 5).

PROFILE_r04 established A(match)=25.2 ms, B(tokens)=28.8, C(full)=39.3
per 4x256KiB batch; this splits the ~10.5 ms post-token tail into
compact / hist+trees / header / pack-fields / bucketed-OR by compiling
truncated programs (deflate_device3 make_encode_batch_v3 stage knob)
and timing each copy-free (scalar-reduced outputs, e2e minus floor —
the inputs are freshly-uploaded constants so no carry copy is
involved).
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
from tpuzlib.kernels.deflate_device3 import make_encode_batch_v3


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


def main():
    chunk, batch = 1 << 18, 4
    out_words = min(chunk + 4, (chunk * 10) // 32 + 64)
    txt = open("/root/reference/test/paradiselost.txt", "rb").read()
    big = np.frombuffer((txt * 40)[: batch * (dd.CTX + chunk)], np.uint8)
    bufs = jnp.asarray(big.reshape(batch, dd.CTX + chunk))
    cv = jnp.zeros(batch, jnp.int32)
    nv = jnp.full(batch, chunk, jnp.int32)
    lv = jnp.zeros(batch, jnp.int32)
    mb = batch * chunk / 1e6

    floor = floor_time()
    print(f"floor {floor*1e3:.2f} ms; batch {mb:.2f} MB", flush=True)

    prev = 0.0
    for stage in ("tokens", "compact", "trees", "header", "fields", "full"):
        enc = make_encode_batch_v3(6, chunk, batch, out_words, stage=stage)
        red = scalar_reduced(enc)
        np.asarray(red(bufs, cv, nv, lv))  # compile+warm
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(red(bufs, cv, nv, lv))
            best = min(best, time.perf_counter() - t0)
        dev = best - floor
        print(
            f"{stage:8s} {dev*1e3:7.1f} ms  (+{(dev-prev)*1e3:6.1f})  "
            f"{mb/dev:6.1f} MB/s",
            flush=True,
        )
        prev = dev


if __name__ == "__main__":
    main()
