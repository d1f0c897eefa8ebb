"""Probe the exact Pallas primitives the inflate kernel relies on,
individually, against interpret-mode oracles — to find which one
diverges on real hardware (the full kernel round-trips on CPU interpret
but falls back on the chip)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tpuzlib.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    def check(name, kern, args, out_shape):
        try:
            f = jax.jit(pl.pallas_call(kern, out_shape=out_shape))
            got = np.asarray(f(*args))
            want = np.asarray(
                pl.pallas_call(kern, out_shape=out_shape, interpret=True)(*args)
            )
            same = (got == want).all()
            print(f"{name}: {'MATCH' if same else 'DIVERGE'}", flush=True)
            if not same:
                bad = np.argwhere(got != want)[:4]
                for b in bad:
                    print(f"   at {tuple(b)}: got {got[tuple(b)]} want "
                          f"{want[tuple(b)]}", flush=True)
            return same
        except Exception as e:
            print(f"{name}: FAIL {str(e).splitlines()[0][:140]}", flush=True)
            return False

    # (a) u32 sublane gather
    x = jnp.asarray(rng.integers(0, 1 << 32, (8, 128), dtype=np.uint64)
                    .astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, 8, (1, 128), dtype=np.int32))

    def k_a(x_ref, i_ref, o_ref):
        sb = jnp.broadcast_to(i_ref[:], (8, 128))
        o_ref[:] = jnp.take_along_axis(x_ref[:], sb, axis=0)[0:1]

    check("a u32 sublane gather", k_a, (x, idx),
          jax.ShapeDtypeStruct((1, 128), jnp.uint32))

    # (b) dynamic odd-row store in a while loop
    def k_b(o_ref):
        def cond(it):
            return it < 24

        def body(it):
            o_ref[pl.ds(it, 1), :] = jnp.full((1, 128), it, jnp.int32)
            return it + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))

    try:
        f = jax.jit(pl.pallas_call(
            k_b, out_shape=jax.ShapeDtypeStruct((24, 128), jnp.int32)))
        got = np.asarray(f())
        want = np.arange(24)[:, None] * np.ones((1, 128), np.int64)
        print("b dyn-row store while:",
              "MATCH" if (got == want).all() else f"DIVERGE {got[:,0]}",
              flush=True)
    except Exception as e:
        print("b dyn-row store while: FAIL",
              str(e).splitlines()[0][:140], flush=True)

    # (c) vector-reduce while cond + carried (1,128) state
    def k_c(x_ref, o_ref):
        def cond(st):
            v, it = st
            return jnp.logical_and(jnp.any(v < 100), it < 64)

        def body(st):
            v, it = st
            return v + (v < 100), it + 1

        v, it = jax.lax.while_loop(
            cond, body, (x_ref[:], jnp.int32(0))
        )
        o_ref[:] = v + it * 0

    x0 = jnp.asarray(rng.integers(0, 100, (1, 128), dtype=np.int32))
    check("c vec-cond while", k_c, (x0,),
          jax.ShapeDtypeStruct((1, 128), jnp.int32))

    # (d) fetch3-style straddled NV-way select (NV=5)
    NW = 40
    words = jnp.asarray(rng.integers(0, 1 << 32, (NW, 128), dtype=np.uint64)
                        .astype(np.uint32))
    jidx = jnp.asarray(rng.integers(0, NW - 3, (1, 128), dtype=np.int32))

    def k_d(w_ref, j_ref, o_ref):
        j = j_ref[:]
        v = j >> 3
        s = j & 7
        w_a = jnp.zeros((1, 128), jnp.uint32)
        w_b = jnp.zeros((1, 128), jnp.uint32)
        w_c = jnp.zeros((1, 128), jnp.uint32)
        sb = jnp.broadcast_to(s, (8, 128))
        s1 = jnp.broadcast_to((s + 1) & 7, (8, 128))
        s2 = jnp.broadcast_to((s + 2) & 7, (8, 128))
        for t in range(NW // 8):
            tile = w_ref[t * 8 : (t + 1) * 8, :]
            g0 = jnp.take_along_axis(tile, sb, axis=0)[0:1]
            g1 = jnp.take_along_axis(tile, s1, axis=0)[0:1]
            g2 = jnp.take_along_axis(tile, s2, axis=0)[0:1]
            w_a = jnp.where(v == t, g0, w_a)
            w_b = jnp.where((v == t) & (s < 7), g1, w_b)
            w_b = jnp.where((v == t - 1) & (s >= 7), g1, w_b)
            w_c = jnp.where((v == t) & (s < 6), g2, w_c)
            w_c = jnp.where((v == t - 1) & (s >= 6), g2, w_c)
        o_ref[:] = jnp.concatenate([w_a, w_b, w_c], axis=0)

    check("d fetch3 straddle", k_d, (words, jidx),
          jax.ShapeDtypeStruct((3, 128), jnp.uint32))

    # (e) in-while ref write + gather combined (the kernel's inner shape)
    def k_e(w_ref, j_ref, o_ref):
        def cond(st):
            it, _ = st
            return it < 16

        def body(st):
            it, j = st
            v = j >> 3
            sb = jnp.broadcast_to(j & 7, (8, 128))
            g = jnp.zeros((1, 128), jnp.uint32)
            for t in range(NW // 8):
                tile = w_ref[t * 8 : (t + 1) * 8, :]
                gt = jnp.take_along_axis(tile, sb, axis=0)[0:1]
                g = jnp.where(v == t, gt, g)
            o_ref[pl.ds(it, 1), :] = g
            return it + 1, (j + 3) % (NW - 1)

        jax.lax.while_loop(cond, body, (jnp.int32(0), j_ref[:]))

    try:
        f = jax.jit(pl.pallas_call(
            k_e, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32)))
        got = np.asarray(f(words, jidx))
        fi = pl.pallas_call(
            k_e, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32),
            interpret=True)
        want = np.asarray(fi(words, jidx))
        print("e while+gather+store:",
              "MATCH" if (got == want).all() else "DIVERGE", flush=True)
        if not (got == want).all():
            bad = np.argwhere(got != want)[:4]
            for b in bad:
                print(f"   at {tuple(b)}: got {got[tuple(b)]} want "
                      f"{want[tuple(b)]}", flush=True)
    except Exception as e:
        print("e while+gather+store: FAIL",
              str(e).splitlines()[0][:140], flush=True)


if __name__ == "__main__":
    main()
