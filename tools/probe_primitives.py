#!/usr/bin/env python
"""TPU primitive cost probe (round 3): measures the building blocks the
v3 deflate/inflate kernels choose between.

Run from the repo root: `python tools/probe_primitives.py`.
Loop-differenced device times (the tunnel adds ~24 ms per dispatch).
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import tpuzlib.kernels  # noqa: F401  (enables the persistent compile cache)
import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend(), jax.devices(), flush=True)


def loop_time(name, body, init, k1=4, k2=24, units=None, unit="elem"):
    f = jax.jit(lambda x, k: lax.fori_loop(0, k, body, x))

    def run(k):
        t0 = time.perf_counter()
        r = f(init, k)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
        return time.perf_counter() - t0

    try:
        run(2)
        t1 = min(run(k1) for _ in range(4))
        t2 = min(run(k2) for _ in range(4))
        per = (t2 - t1) / (k2 - k1)
        msg = f"{name:52s} {per*1e3:9.4f} ms/iter"
        if units:
            msg += f"  -> {per/units*1e9:8.3f} ns/{unit}"
        print(msg, flush=True)
        return per
    except Exception as e:
        print(f"{name:52s} FAILED: {repr(e)[:180]}", flush=True)
        return None


rng = np.random.default_rng(0)
N = 288 * 1024  # CTX + 256K chunk
kd = jnp.asarray(rng.integers(0, 1 << 16, N, dtype=np.int32))
v1d = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))
v2d = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))
v3d = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))
v4d = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))
v5d = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))
idxd = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
idx60k = jnp.asarray(rng.integers(0, N, 60 * 1024, dtype=np.int32))

# --- sorts ----------------------------------------------------------------
def mk_sort(nops):
    ops = [kd, v1d, v2d, v3d, v4d, v5d][:nops]

    def body(i, s):
        out = lax.sort(tuple(s), num_keys=1, is_stable=True)
        return (out[0] ^ 1,) + tuple(out[1:])

    return body, tuple(ops)


for nops in (2, 4, 6):
    body, init = mk_sort(nops)
    loop_time(f"lax.sort {nops}-op stable {N//1024}K", body, init, units=N)

# --- scatter / gather in XLA ---------------------------------------------
def scat_max(i, s):
    out, idx, val = s
    return out.at[idx].max(val.astype(jnp.uint32)), idx ^ 1, val


loop_time("XLA scatter-max 288K->288K", scat_max,
          (jnp.zeros(N, jnp.uint32), idxd, v1d), units=N)


def scat_add60(i, s):
    out, idx, val = s
    return out.at[idx].add(val), idx ^ 1, val


loop_time("XLA scatter-add 60K->288K", scat_add60,
          (jnp.zeros(N, jnp.int32), idx60k,
           jnp.asarray(rng.integers(0, 100, 60 * 1024, dtype=np.int32))),
          units=60 * 1024)


def gath(i, s):
    src, idx = s
    return src + src[idx], idx ^ 1


loop_time("XLA gather 288K from 288K", gath, (v1d, idxd), units=N)


def gath37(i, s):
    src, idx = s
    return src.at[:1].set(jnp.sum(src[idx])), idx ^ 1


loop_time("XLA gather 37K from 288K", gath37,
          (v1d, idxd[: 37 * 1024]), units=37 * 1024)

# --- elementwise chain (fusion sanity) ------------------------------------
def elem(i, x):
    for _ in range(16):
        x = (x ^ (x >> 3)) * 5 + 7
    return x


loop_time("XLA elementwise x16 288K", elem, v1d, units=N * 16)

# --- cumsum ---------------------------------------------------------------
loop_time("XLA cumsum 288K", lambda i, x: jnp.cumsum(x) ^ 1, v1d, units=N)

# --- package merge device (level-6 tree build cost) ----------------------
from tpuzlib.kernels.huffman_device import package_merge_device

freq = jnp.asarray(rng.integers(0, 1000, 286, dtype=np.int32))


def pm(i, f):
    return package_merge_device(jax, jnp, f, 15) + f[:286] * 0


loop_time("package_merge_device 286 syms", pm, freq)

# --- Pallas capability probes --------------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = N // 128  # rows of the (R, 128) layout


def probe_pallas(name, kernel, inputs, out_shape):
    try:
        f = jax.jit(
            lambda *a: pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*a)
        )
        r = f(*inputs)
        np.asarray(r).ravel()[:1]
        print(f"pallas {name:45s} COMPILES", flush=True)
        return f
    except Exception as e:
        print(f"pallas {name:45s} FAILED: {repr(e)[:180]}", flush=True)
        return None


x2d = jnp.asarray(rng.integers(0, 1 << 31, (R, 128), dtype=np.int32))
tbl2d = jnp.asarray(rng.integers(0, 1 << 31, (256, 128), dtype=np.int32))
idx2d = jnp.asarray(rng.integers(0, 32768, (R, 128), dtype=np.int32))
idx_lane = jnp.asarray(rng.integers(0, 128, (R, 128), dtype=np.int32))


# (a) lane-local take_along_axis — known good (parse kernel uses it)
def k_tala(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)


f_tala = probe_pallas("take_along_axis lanes (R,128)", k_tala,
                      (x2d, idx_lane),
                      jax.ShapeDtypeStruct((R, 128), jnp.int32))

# (b) arbitrary flat gather from a 32K-entry table
def k_flatgather(t_ref, i_ref, o_ref):
    flat = t_ref[:].reshape(-1)
    o_ref[:] = flat[i_ref[:]]


probe_pallas("flat gather 32K table (R,128) idx", k_flatgather,
             (tbl2d, idx2d), jax.ShapeDtypeStruct((R, 128), jnp.int32))

# (c) take_along_axis along sublanes (axis=0)
idx_row = jnp.asarray(rng.integers(0, 256, (256, 128), dtype=np.int32))


def k_tala0(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)


probe_pallas("take_along_axis sublanes (256,128)", k_tala0,
             (tbl2d, idx_row), jax.ShapeDtypeStruct((256, 128), jnp.int32))

# (d) in-kernel scatter: out[idx] = val within a row? (dynamic vector store)
def k_scatter(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    vals = x_ref[:]
    o_ref[:] = o_ref[:].at[i_ref[:], jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1), (256, 128))].max(
        jnp.zeros((256, 128), jnp.int32))


probe_pallas("in-kernel 2D scatter-max", k_scatter,
             (tbl2d, idx_row), jax.ShapeDtypeStruct((256, 128), jnp.int32))

# (e) pltpu.roll both axes + timing of a band-screen inner step
def k_roll(x_ref, o_ref):
    x = x_ref[:]
    acc = jnp.zeros_like(x)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    cur = x
    for _ in range(16):
        a = pltpu.roll(cur, 1, axis=1)
        b = pltpu.roll(a, 1, axis=0)
        cur = jnp.where(lane == 0, b, a)
        acc = jnp.maximum(acc, cur ^ x)
    o_ref[:] = acc


f_roll = probe_pallas("16x global shift-by-1 (roll)", k_roll, (x2d,),
                      jax.ShapeDtypeStruct((R, 128), jnp.int32))
if f_roll is not None:
    loop_time("pallas 16-step shift screen (R,128)",
              lambda i, x: f_roll(x) ^ 1, x2d, units=N * 16)

if f_tala is not None:
    loop_time("pallas take_along_axis lanes",
              lambda i, s: (f_tala(s[0], s[1]), s[1]),
              (x2d, idx_lane), units=N)

print("probe done", flush=True)
