#!/usr/bin/env python
"""One-off TPU primitive profiler (round 2 design groundwork).

Measures the primitives the deflate/inflate device kernels could be
built from, so the round-2 kernel design targets what the hardware
actually does well.  Times are wall through the tunnel; every call pulls
a scalar to force completion (block_until_ready is a no-op here).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), "devices:", jax.devices(), flush=True)

N = 1 << 18  # 262144


def timeit(name, fn, reps=5):
    t0 = time.perf_counter()
    r = fn()
    np.asarray(r)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(f"{name:42s} med {med*1e3:8.3f} ms  (compile {compile_s:6.1f}s)", flush=True)
    return med


rng = np.random.default_rng(0)
x_np = rng.integers(0, 1 << 30, N, dtype=np.int32)
idx_np = rng.integers(0, N, N, dtype=np.int32)
x = jax.device_put(jnp.asarray(x_np))
idx = jax.device_put(jnp.asarray(idx_np))
m2d = jax.device_put(jnp.asarray(rng.integers(0, 256, (2048, 2048), dtype=np.int32)))

# 0. dispatch overhead
f_nop = jax.jit(lambda a: a.sum())
timeit("dispatch+sum 256K", lambda: f_nop(x))

# 1. elementwise chain on 2-D (VPU): 64 dependent ops on 4M elems
def ew_chain(a):
    for i in range(64):
        a = (a ^ (a >> 3)) + jnp.where(a > i, 1, 2)
    return a.sum()
f_ew = jax.jit(ew_chain)
t = timeit("64x3 elementwise ops on (2048,2048) i32", lambda: f_ew(m2d))
print(f"   -> ~{64*3*2048*2048/t/1e12:.2f} Tops/s VPU", flush=True)

# 2. argsort / sort 1-D
f_as = jax.jit(lambda a: jnp.argsort(a).sum())
timeit("argsort 256K i32", lambda: f_as(x))
f_s = jax.jit(lambda a: jnp.sort(a).sum())
timeit("sort 256K i32", lambda: f_s(x))

# 3. 1-D gather
f_g = jax.jit(lambda a, i: a[i].sum())
t = timeit("gather 256K from 256K (1-D)", lambda: f_g(x, idx))
print(f"   -> {N/t/1e6:.1f} M elem/s", flush=True)

# 3b. 2-D gather formulation: gather rows of (N/128,128) by row index
x2 = x.reshape(-1, 128)
ridx = jax.device_put(jnp.asarray(rng.integers(0, N // 128, N // 128, dtype=np.int32)))
f_g2 = jax.jit(lambda a, i: a[i].sum())
t = timeit("gather 2K rows of 128 (2-D)", lambda: f_g2(x2, ridx))

# 4. scatter-add 1-D
f_sc = jax.jit(lambda a, i: jnp.zeros(N, jnp.int32).at[i].add(a).sum())
t = timeit("scatter-add 256K (1-D)", lambda: f_sc(x, idx))
print(f"   -> {N/t/1e6:.1f} M elem/s", flush=True)

# 5. cumsum
f_cs = jax.jit(lambda a: jnp.cumsum(a).sum())
timeit("cumsum 256K i32", lambda: f_cs(x))
f_cs2 = jax.jit(lambda a: jnp.cumsum(a.reshape(-1, 128), axis=0)[-1].sum())
timeit("cumsum (2048,128) axis0", lambda: f_cs2(x))

# 6. pointer doubling: one J[J] round
f_pd = jax.jit(lambda j: j[j][0])
jptr = jax.device_put(jnp.asarray(idx_np))
timeit("one J[J] doubling round 256K", lambda: f_pd(jptr))

# 7. Pallas: shifted-compare matcher core estimate.
#    (T positions x D distances) tile: eq-compare via roll + 4 doubling
#    steps + reduce over D -- the proposed matcher inner loop.
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, D = 1024, 512


def match_tile_kernel(w_ref, out_ref):
    # w_ref: (8, T + D + 64) u32 rows replicated window (sublane-major)
    w = w_ref[0, :]
    accL = jnp.zeros((T, 1), jnp.int32)
    accD = jnp.zeros((T, 1), jnp.int32)
    base = jax.lax.dynamic_slice(w, (D,), (T,)).reshape(T, 1)
    for db in range(4):  # 4 sub-blocks of 128 distances
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)
        # candidate windows: w[D + t - (db*128 + c + 1)]
        cand = jax.lax.dynamic_slice(w, (D - db * 128 - 128,), (T + 128,))
        # build (T,128) by slicing shifted views: compare base vs cand shifted
        g = jnp.zeros((T, 128), jnp.uint32)
        eq = jnp.zeros((T, 128), jnp.int32)
        for c in range(0, 128, 128):
            seg = jax.lax.dynamic_slice(cand, (c,), (T,)).reshape(T, 1)
            eq = eq + jnp.where(base == seg, 1, 0)
        L = eq
        for s in (1, 2, 4, 8):
            Ls = jnp.concatenate([L[s:], jnp.zeros((s, 128), jnp.int32)], 0)
            L = jnp.where(L >= s, jnp.minimum(L + Ls, 2 * s), L)
        d = jnp.max(L, axis=1, keepdims=True)
        accL = jnp.maximum(accL, d)
        accD = accD + jnp.argmax(L, axis=1, keepdims=True)
    out_ref[:] = (accL + accD).astype(jnp.int32)


def run_match_tile(w):
    return pl.pallas_call(
        match_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((T, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w)


wbuf = jax.device_put(
    jnp.asarray(rng.integers(0, 1 << 30, (8, T + D + 64), dtype=np.uint32))
)
try:
    f_mt = jax.jit(lambda w: run_match_tile(w).sum())
    t = timeit("pallas match-tile (1024pos x 512dist)", lambda: f_mt(wbuf))
    print(f"   -> {T/t/1e6:.1f} M pos/s at D=512", flush=True)
except Exception as e:
    print("pallas match-tile FAILED:", repr(e)[:300], flush=True)

# 8. Pallas dynamic gather support probe: take_along_axis in-kernel
def gather_kernel(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:] & 127, axis=1)


def run_gather(a, i):
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, i)


a8 = jax.device_put(jnp.asarray(rng.integers(0, 99, (256, 128), dtype=np.int32)))
i8 = jax.device_put(jnp.asarray(rng.integers(0, 128, (256, 128), dtype=np.int32)))
try:
    f_pg = jax.jit(lambda a, i: run_gather(a, i).sum())
    t = timeit("pallas take_along_axis lanes (256,128)", lambda: f_pg(a8, i8))
    print("   pallas lane-gather SUPPORTED", flush=True)
except Exception as e:
    print("pallas lane-gather FAILED:", repr(e)[:300], flush=True)

# 9. big matmul sanity (MXU roofline)
A = jax.device_put(jnp.asarray(rng.standard_normal((4096, 4096)), dtype=jnp.bfloat16))
f_mm = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.float32).sum())
t = timeit("matmul 4096^3 bf16", lambda: f_mm(A))
print(f"   -> {2*4096**3/t/1e12:.1f} Tflops/s MXU", flush=True)

print("done", flush=True)
