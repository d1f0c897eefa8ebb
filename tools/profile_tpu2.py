#!/usr/bin/env python
"""TPU primitive profiler v2: in-jit loop differencing.

The tunnel has a ~24 ms dispatch+pull floor, so single-dispatch wall
times are meaningless.  Each measurement runs the op K times inside one
jit (lax.fori_loop, data-dependent carry) and reports
(T(K2) - T(K1)) / (K2 - K1).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend(), jax.devices(), flush=True)

N = 1 << 18


def loop_time(name, body, init, k1=4, k2=24, unit_elems=None):
    f = jax.jit(lambda x, k: lax.fori_loop(0, k, body, x))

    def run(k):
        t0 = time.perf_counter()
        r = f(init, k)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
        return time.perf_counter() - t0

    try:
        run(2)  # compile+warm
        t1 = min(run(k1) for _ in range(3))
        t2 = min(run(k2) for _ in range(3))
        per = (t2 - t1) / (k2 - k1)
        msg = f"{name:44s} {per*1e3:9.4f} ms/iter"
        if unit_elems:
            msg += f"  -> {unit_elems/per/1e6:9.1f} M elem/s"
        print(msg, flush=True)
        return per
    except Exception as e:
        print(f"{name:44s} FAILED: {repr(e)[:200]}", flush=True)
        return None


rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))
idx0 = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))

loop_time("argsort 256K i32", lambda i, x: jnp.argsort(x), x0, unit_elems=N)
loop_time("sort 256K i32", lambda i, x: jnp.sort(x) ^ 1, x0, unit_elems=N)
loop_time(
    "sort 256K u64 key (sort_key_val)",
    lambda i, s: (lax.sort_key_val(s[0], s[1])[0] + jnp.uint64(1), s[1]),
    (x0.astype(jnp.uint64), x0),
    unit_elems=N,
)
loop_time(
    "gather 256K (1-D)",
    lambda i, s: (s[0][s[1]] + 1, s[1]),
    (x0, idx0),
    unit_elems=N,
)
loop_time(
    "scatter-add 256K (1-D)",
    lambda i, s: (jnp.zeros(N, jnp.int32).at[s[1]].add(s[0]), s[1]),
    (x0, idx0),
    unit_elems=N,
)
loop_time("cumsum 256K", lambda i, x: jnp.cumsum(x) ^ 1, x0, unit_elems=N)

m0 = jnp.asarray(rng.integers(0, 256, (2048, 2048), dtype=np.int32))


def ew_body(i, a):
    for j in range(16):
        a = (a ^ (a >> 3)) + 1
    return a


loop_time("48 elementwise ops (2048,2048) i32", ew_body, m0,
          unit_elems=48 * 2048 * 2048)

a0 = jnp.asarray(rng.standard_normal((4096, 4096)), dtype=jnp.bfloat16)
per = loop_time(
    "matmul 4096^3 bf16",
    lambda i, a: jnp.dot(a, a, preferred_element_type=jnp.bfloat16),
    a0,
)
if per:
    print(f"   -> {2*4096**3/per/1e12:.1f} Tflops/s", flush=True)

# int8 matmul (checksum path)
b0 = jnp.asarray(rng.integers(-2, 2, (4096, 4096), dtype=np.int8))
per = loop_time(
    "matmul 4096^3 int8->int32",
    lambda i, a: jnp.dot(a, a, preferred_element_type=jnp.int32).astype(jnp.int8),
    b0,
)
if per:
    print(f"   -> {2*4096**3/per/1e12:.1f} Tops/s", flush=True)

# HBM bandwidth probe: big copy
c0 = jnp.asarray(rng.integers(0, 255, 1 << 26, dtype=np.uint8))  # 64MB
per = loop_time("copy+add 64MB u8", lambda i, a: a + jnp.uint8(1), c0)
if per:
    print(f"   -> {2*(1<<26)/per/1e9:.0f} GB/s r+w", flush=True)

# current match_and_parse at L6, 256K chunk
from tpuzlib.kernels.deflate_device import match_and_parse, pack_static_block, CTX

chunk = 1 << 18
dbuf = jnp.asarray(rng.integers(0, 255, CTX + chunk, dtype=np.uint8))
txt = np.frombuffer(open("/root/reference/test/paradiselost.txt", "rb").read(), np.uint8)
tbuf = jnp.asarray(np.resize(txt, CTX + chunk))


def mp_body(i, s):
    buf = s
    it, ll, dd = match_and_parse(jax, jnp, buf, jnp.int32(0), jnp.int32(chunk), 6)
    return buf ^ it[0].astype(jnp.uint8)


per = loop_time("match_and_parse L6 256K (text)", mp_body, tbuf, k1=2, k2=6)
if per:
    print(f"   -> {chunk/per/1e6:.2f} MB/s", flush=True)


def pk_body(i, s):
    buf, it, ll, dd = s
    w, nb = pack_static_block(jax, jnp, it, ll, dd, jnp.int32(1))
    return buf ^ w[0].astype(jnp.uint8), it, ll, dd


it0, ll0, dd0 = match_and_parse(jax, jnp, tbuf, jnp.int32(0), jnp.int32(chunk), 6)
per = loop_time("pack_static_block 256K", pk_body, (tbuf, it0, ll0, dd0), k1=2, k2=10)
if per:
    print(f"   -> {chunk/per/1e6:.2f} MB/s", flush=True)

# pallas match-tile v2: static slices only
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, D = 1024, 512


def match_tile_kernel(w_ref, out_ref):
    # w_ref: (1, D + T + 64) i32 bytes; positions D..D+T are "current"
    w = w_ref[0, :]
    base = w[D : D + T].reshape(T // 128, 128)
    bestL = jnp.zeros((T // 128, 128), jnp.int32)
    bestD = jnp.zeros((T // 128, 128), jnp.int32)
    for d in range(1, D + 1, 1):
        cand = w[D - d : D - d + T].reshape(T // 128, 128)
        eq = jnp.where(base == cand, 1, 0)
        better = eq > bestL
        bestL = jnp.maximum(bestL, eq)
        bestD = jnp.where(better, d, bestD)
    out_ref[:] = bestL + bestD


def run_match_tile(w):
    return pl.pallas_call(
        match_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((T // 128, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w)


wb0 = jnp.asarray(rng.integers(0, 255, (1, D + T + 64), dtype=np.int32))
per = loop_time(
    "pallas naive D-loop (1024pos x 512d)",
    lambda i, s: (run_match_tile(s[0][: 1])[:1, :].astype(jnp.int32)
                  .reshape(1, 128).repeat(1, 0) + s[0][:, :128]).astype(jnp.int32)[:, :1]
    if False else (s[0] + run_match_tile(s[0])[0, 0], ),
    (wb0,),
    k1=2,
    k2=6,
)
if per:
    print(f"   -> {T/per/1e6:.2f} M pos/s (x512 dist, VPU shifted-compare)", flush=True)

# pallas lane-gather rate: (8, 128) table rows one-hot + lane gather is complex;
# measure plain take_along_axis throughput at bigger shape
def gk(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:] & 127, axis=1)


def run_g(a, i):
    return pl.pallas_call(
        gk,
        out_shape=jax.ShapeDtypeStruct((2048, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, i)


ag = jnp.asarray(rng.integers(0, 99, (2048, 128), dtype=np.int32))
ig = jnp.asarray(rng.integers(0, 128, (2048, 128), dtype=np.int32))
per = loop_time(
    "pallas lane take_along_axis (2048,128)",
    lambda i, s: (s[0], run_g(s[0], s[1]) & 127),
    (ag, ig),
    unit_elems=2048 * 128,
)

print("done", flush=True)
