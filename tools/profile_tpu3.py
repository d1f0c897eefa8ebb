#!/usr/bin/env python
"""TPU profiler v3: Pallas scalar-loop rates + sort variants + small-table
gathers.  These numbers pick the round-2 kernel designs."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), jax.devices(), flush=True)


def loop_time(name, body, init, k1=4, k2=24, per_iter_units=None, unit="elem"):
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
        msg = f"{name:46s} {per*1e3:9.4f} ms/iter"
        if per_iter_units:
            msg += f"  -> {per/per_iter_units*1e9:8.3f} ns/{unit}"
        print(msg, flush=True)
        return per
    except Exception as e:
        print(f"{name:46s} FAILED: {repr(e)[:240]}", flush=True)
        return None


rng = np.random.default_rng(0)

# --- 1. Pallas serial pointer-chase in VMEM ---------------------------------
CH = 16384  # iterations per kernel call


def chase_kernel(t_ref, o_ref):
    def body(i, pos):
        row = pos >> 7
        lane = pos & 127
        return t_ref[row, lane]

    p = lax.fori_loop(0, CH, body, 0)
    o_ref[0, 0] = p


perm = rng.permutation(32768).astype(np.int32)
t_np = perm.reshape(256, 128)


def run_chase(t):
    return pl.pallas_call(
        chase_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(t)


t_dev = jnp.asarray(t_np)
per = loop_time(
    "pallas serial chase 64K deps loads (VMEM)",
    lambda i, s: (s[0], run_chase(s[0]) + s[1] * 0),
    (t_dev, jnp.zeros((1, 1), jnp.int32)),
    k1=2, k2=8, per_iter_units=CH, unit="load",
)

# --- 2. Pallas serial store loop --------------------------------------------
def store_kernel(s_ref, o_ref):
    def body(i, pos):
        o_ref[pos >> 7, pos & 127] = i
        return pos + s_ref[pos >> 7, pos & 127]

    lax.fori_loop(0, CH, body, 0)


steps = np.maximum(1, rng.integers(1, 4, 32768)).astype(np.int32)


def run_store(s):
    return pl.pallas_call(
        store_kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s)


s_dev = jnp.asarray(steps.reshape(256, 128) % 3 + 1)
per = loop_time(
    "pallas serial load+store loop 64K iters",
    lambda i, s: (run_store(s[0]) % 3 + 1, s[1]),
    (s_dev, 0),
    k1=2, k2=8, per_iter_units=CH, unit="iter",
)

# --- 3. Pallas serial decode-ish loop (realistic inflate symbol step) -------
def dec_kernel(w_ref, l_ref, o_ref):
    def body(i, carry):
        bitpos, acc = carry
        w = w_ref[(bitpos >> 10) & 2047, (bitpos >> 3) & 127]
        w = (w >> (bitpos & 7)).astype(jnp.uint32)
        ent = l_ref[(w & 255).astype(jnp.int32), (w >> 8 & 127).astype(jnp.int32)]
        nb = (ent >> 15) & 15
        return bitpos + nb.astype(jnp.int32) + 1, acc ^ ent

    _, acc = lax.fori_loop(0, CH, body, (0, jnp.uint32(0)))
    o_ref[0, 0] = acc.astype(jnp.int32)


w_dev = jnp.asarray(rng.integers(0, 1 << 31, (2048, 128), dtype=np.int32))
l_dev = jnp.asarray(rng.integers(0, 1 << 20, (256, 128), dtype=np.uint32))


def run_dec(w, l):
    return pl.pallas_call(
        dec_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(w, l)


per = loop_time(
    "pallas serial sym-decode-ish 64K iters",
    lambda i, s: (s[0], s[1] ^ run_dec(s[0], s[1]).astype(jnp.uint32)[0, 0]),
    (w_dev, l_dev),
    k1=2, k2=8, per_iter_units=CH, unit="sym",
)

# --- 4. multi-operand sort ---------------------------------------------------
N = 1 << 18
k_np = rng.integers(0, 1 << 31, N, dtype=np.int32)
v1 = rng.integers(0, 1 << 31, N, dtype=np.int32)
v2 = rng.integers(0, 1 << 31, N, dtype=np.int32)
kd, v1d, v2d = jnp.asarray(k_np), jnp.asarray(v1), jnp.asarray(v2)


def sort3(i, s):
    k, a, b = lax.sort((s[0], s[1], s[2]), num_keys=1)
    return (k ^ 1, a, b)


loop_time("lax.sort 3-operand 256K", sort3, (kd, v1d, v2d), per_iter_units=N)


def sort4(i, s):
    k, a, b, c = lax.sort((s[0], s[1], s[2], s[3]), num_keys=1)
    return (k ^ 1, a, b, c)


loop_time("lax.sort 4-operand 256K", sort4, (kd, v1d, v2d, jnp.asarray(v2)), per_iter_units=N)

# --- 5. small-table gather ----------------------------------------------------
tbl = jnp.asarray(rng.integers(0, 1 << 30, 288, dtype=np.int32))
sidx = jnp.asarray(rng.integers(0, 288, N, dtype=np.int32))
loop_time(
    "gather 256K from 288-entry table",
    lambda i, s: (s[0], (s[1][s[0]] ^ 1)[:288]),
    (sidx, tbl),
    per_iter_units=N,
)

tbl2 = jnp.asarray(rng.integers(0, 1 << 30, 32768, dtype=np.int32))
sidx2 = jnp.asarray(rng.integers(0, 32768, N, dtype=np.int32))
loop_time(
    "gather 256K from 32K-entry table",
    lambda i, s: (s[0], jnp.concatenate([(s[1][s[0]] ^ 1)[:32768]])),
    (sidx2, tbl2),
    per_iter_units=N,
)

# take_along_axis batched rows (XLA, not pallas): (2048,128) rows gather
rows = jnp.asarray(rng.integers(0, 1 << 30, (2048, 128), dtype=np.int32))
ridx = jnp.asarray(rng.integers(0, 128, (2048, 128), dtype=np.int32))
loop_time(
    "XLA take_along_axis lanes (2048,128)",
    lambda i, s: (jnp.take_along_axis(s[0], s[1], axis=1), s[1]),
    (rows, ridx),
    per_iter_units=N,
)

# --- 6. while_loop overhead ---------------------------------------------------
def wl(i, x):
    def cond(c):
        return c[0] < 1000

    def body(c):
        return (c[0] + 1, c[1] + c[0])

    return x + lax.while_loop(cond, body, (i * 0, 0))[1]


loop_time("while_loop 1000 trivial iters", wl, 0, per_iter_units=1000, unit="step")

# --- 7. scatter-max packed (matcher merge) ------------------------------------
val = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))
tgt = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
loop_time(
    "scatter-max 256K",
    lambda i, s: (jnp.zeros(N, jnp.int32).at[s[1]].max(s[0]), s[1]),
    (val, tgt),
    per_iter_units=N,
)

# --- 8. VMEM size probe -------------------------------------------------------
for mb in (8, 16, 32, 64, 100):
    try:
        sz = mb * 1024 * 1024 // 4

        def big_kernel(x_ref, o_ref):
            o_ref[:] = x_ref[: 8, :128]

        x = jnp.zeros((sz // 128, 128), jnp.int32)
        r = pl.pallas_call(
            big_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        np.asarray(r)
        print(f"VMEM {mb} MB input: OK", flush=True)
    except Exception as e:
        print(f"VMEM {mb} MB input: FAIL {repr(e)[:120]}", flush=True)
        break

print("done", flush=True)
