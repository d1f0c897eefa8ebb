#!/usr/bin/env python
"""TPU profiler v4: multi-operand sorts, take_along_axis, and the Pallas
segment-local parse-doubling prototype (the round-2 parse kernel)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

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
        print(f"{name:46s} FAILED: {repr(e)[:200]}", flush=True)
        return None


rng = np.random.default_rng(0)
N = 1 << 18
kd = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))
v1d = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))
v2d = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))
v3d = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))


def sort2(i, s):
    k, a = lax.sort((s[0], s[1]), num_keys=1, is_stable=True)
    return (k ^ 1, a)


loop_time("lax.sort 2-op stable 256K", sort2, (kd, v1d), per_iter_units=N)


def sort4(i, s):
    k, a, b, c = lax.sort((s[0], s[1], s[2], s[3]), num_keys=1, is_stable=True)
    return (k ^ 1, a, b, c)


loop_time("lax.sort 4-op stable 256K", sort4, (kd, v1d, v2d, v3d), per_iter_units=N)

tbl = jnp.asarray(rng.integers(0, 1 << 30, 288, dtype=np.int32))
sidx = jnp.asarray(rng.integers(0, 288, N, dtype=np.int32))
loop_time(
    "gather 256K from 288-entry table",
    lambda i, s: (s[0], jnp.pad((s[1][s[0]] ^ 1)[:287], (0, 1))),
    (sidx, tbl),
    per_iter_units=N,
)

rows = jnp.asarray(rng.integers(0, 1 << 30, (2048, 128), dtype=np.int32))
ridx = jnp.asarray(rng.integers(0, 128, (2048, 128), dtype=np.int32))
loop_time(
    "XLA take_along_axis lanes (2048,128)",
    lambda i, s: (jnp.take_along_axis(s[0], s[1], axis=1), s[1]),
    (rows, ridx),
    per_iter_units=N,
)

val = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))
tgt = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
loop_time(
    "scatter-max 256K",
    lambda i, s: (jnp.zeros(N, jnp.int32).at[s[1]].max(s[0]), s[1]),
    (val, tgt),
    per_iter_units=N,
)


def wl(i, x):
    def cond(c):
        return c[0] < 1000

    def body(c):
        return (c[0] + 1, c[1] + c[0])

    return x + lax.while_loop(cond, body, (i * 0, 0))[1]


loop_time("while_loop 1000 trivial iters", wl, 0, per_iter_units=1000, unit="step")

# --- Pallas segment parse kernel prototype -----------------------------------
# layout: sub-major (sub*nseg + seg, lane); values are segment-local
# offsets t in [0, S]; steps >= 1.  10 doubling rounds with rank carry,
# then 10 rank-replay rounds -> membership.
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSEG = 256
S = 1024
ROWS = 8 * NSEG


def seg_gather(A, t):
    """B[i,l] = A[row(seg(i), t>>7), t&127] — segment-local gather."""
    sub = t >> 7
    lane = t & 127
    out = jnp.zeros_like(A)
    for q in range(8):
        blk = A[q * NSEG : (q + 1) * NSEG, :]
        Vq = jnp.concatenate([blk] * 8, axis=0)
        vq = jnp.take_along_axis(Vq, lane, axis=1)
        out = jnp.where(sub == q, vq, out)
    return out


def parse_kernel(j_ref, o_ref):
    J = j_ref[:]  # (ROWS,128) next-offset within segment, clipped to S-1... S
    Jc = jnp.minimum(J, S - 1)
    A = Jc
    C = jnp.ones_like(A)  # jumps accounted
    As = [A]
    Cs = [C]
    for r in range(9):
        A2 = seg_gather(jnp.minimum(A, S - 1), jnp.minimum(A, S - 1))
        C2 = C + seg_gather(C, jnp.minimum(A, S - 1))
        A, C = jnp.minimum(A2, S - 1), C2
        As.append(A)
        Cs.append(C)
    # T[j] (jumps to exit) ~ use C at full depth as proxy for the bench
    T = C
    # rank replay: p_j = jump^{T0 - T_j}(0)
    t0 = T[0::NSEG][:1, :1]  # placeholder broadcast
    k = jnp.maximum(T - T, 0) + (T & 7)  # synthetic ranks, keeps data dep
    p = jnp.zeros_like(A)
    for r in range(10):
        pr = seg_gather(As[min(r, 9)], p)
        p = jnp.where((k >> r) & 1 == 1, pr, p)
    o_ref[:] = p + T


def run_parse(j):
    return pl.pallas_call(
        parse_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(j)


jarr = jnp.asarray(
    rng.integers(1, 1024, (ROWS, 128), dtype=np.int32)
)
per = loop_time(
    "pallas parse proto 256K (20 gather-rounds)",
    lambda i, s: ((run_parse(s) & 1023) + 1,),
    jarr,
    k1=2,
    k2=10,
    per_iter_units=N,
    unit="byte",
)

# same seg_gather doubling in pure XLA for comparison
def xla_parse(i, s):
    A = jnp.minimum(s, S - 1)
    C = jnp.ones_like(A)
    for r in range(10):
        A2 = seg_gather(A, A)
        C = C + seg_gather(C, A)
        A = jnp.minimum(A2, S - 1)
    return (A + C) % 1023 + 1


loop_time("XLA same doubling (10 rounds seg_gather)", xla_parse, jarr,
          k1=2, k2=10, per_iter_units=N, unit="byte")

print("done", flush=True)
