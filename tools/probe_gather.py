"""Probe Mosaic dynamic-gather capabilities + costs on the real chip.

Questions that decide the device-inflate redesign (round 4):
  1. take_along_axis(axis=1) lane-gather: max logical lane width?
     (>128 would let per-cursor slices be row-resident)
  2. take_along_axis(axis=0) sublane-gather: supported? max rows?
  3. cost per element of each, vs the XLA gather (7-14 ns/elem).
  4. cost of an XLA gather from a LUT inside a fori_loop (the
     cursor_tokenize_body pattern) — is the 0.24 MB/s warm inflate
     explained by XLA lowering small gathers as dense table scans?

Run alone — only one process may hold the TPU.
"""

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
    from jax.experimental.pallas import tpu as pltpu

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    def try_kernel(name, build):
        try:
            out = build()
            out = np.asarray(out)
            print(f"{name}: OK shape={out.shape}", flush=True)
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
            return False

    # --- 1. lane gather widths ------------------------------------------
    for W in (128, 256, 512, 1024, 4352):
        R = 64
        x = jnp.asarray(rng.integers(0, 1 << 20, (R, W), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, W, (R, W), dtype=np.int32))

        def build(x=x, idx=idx, W=W):
            def kern(x_ref, i_ref, o_ref):
                o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
            )
            r = jax.jit(f)(x, idx)
            expect = np.take_along_axis(np.asarray(x), np.asarray(idx), 1)
            assert (np.asarray(r) == expect).all(), "WRONG RESULT"
            return r

        try_kernel(f"lane-gather W={W}", build)

    # --- 2. sublane gather sizes ----------------------------------------
    for R in (8, 32, 256, 1024, 4352):
        W = 128
        x = jnp.asarray(rng.integers(0, 1 << 20, (R, W), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, R, (R, W), dtype=np.int32))

        def build(x=x, idx=idx):
            def kern(x_ref, i_ref, o_ref):
                o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
            )
            r = jax.jit(f)(x, idx)
            expect = np.take_along_axis(np.asarray(x), np.asarray(idx), 0)
            assert (np.asarray(r) == expect).all(), "WRONG RESULT"
            return r

        try_kernel(f"sublane-gather R={R}", build)

    # --- 3. in-kernel gather cost (looped) ------------------------------
    def loop_cost(name, R, W, axis, iters=64):
        x = jnp.asarray(rng.integers(0, 1 << 20, (R, W), dtype=np.int32))
        idx0 = jnp.asarray(
            rng.integers(0, x.shape[axis], (R, W), dtype=np.int32)
        )

        def kern(x_ref, i_ref, o_ref):
            def body(t, acc):
                g = jnp.take_along_axis(
                    x_ref[:], (i_ref[:] + t) % x.shape[axis], axis=axis
                )
                return acc + g

            o_ref[:] = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(x_ref))

        try:
            f = jax.jit(
                pl.pallas_call(
                    kern, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32)
                )
            )
            np.asarray(f(x, idx0))
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(f(x, idx0))
                best = min(best, time.perf_counter() - t0)
            per = best / (iters * R * W)
            print(f"{name}: {per*1e9:.3f} ns/elem (e2e incl dispatch)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e).splitlines()[0][:120]}", flush=True)

    loop_cost("lane-gather loop (1024,128)", 1024, 128, 1)
    loop_cost("sublane-gather loop (1024,128)", 1024, 128, 0)
    loop_cost("sublane-gather loop (4352,128)", 4352, 128, 0)

    # --- 4. XLA gather-in-while-loop (tokenize pattern) -----------------
    TAB = 32768 * 8
    K = 2048
    lut = jnp.asarray(rng.integers(0, 1 << 30, TAB, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, TAB, K, dtype=np.int32))

    def body(t, st):
        acc, i = st
        g = lut[jnp.clip(i, 0, TAB - 1)]
        return acc + g, (i + g) % TAB

    f = jax.jit(lambda i, n: jax.lax.fori_loop(0, n, body, (jnp.zeros(K, jnp.int32), i)))
    np.asarray(f(idx, 8)[0])
    times = {}
    for n in (8, 64):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(idx, n)[0])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_iter = (times[64] - times[8]) / 56
    print(
        f"XLA lut-gather while_loop: {per_iter*1e6:.1f} us/iter "
        f"({per_iter/K*1e9:.2f} ns/lookup, K={K}, TAB={TAB})",
        flush=True,
    )

    # same but with a scatter carry like tok_pack.at[slot].set
    CAPK = K * 5632 + 1

    def body2(t, st):
        acc, i, tape = st
        g = lut[jnp.clip(i, 0, TAB - 1)]
        slot = jnp.clip(i, 0, CAPK - 1)
        tape = tape.at[slot].set(g)
        return acc + g, (i + g) % TAB, tape

    f2 = jax.jit(
        lambda i, n: jax.lax.fori_loop(
            0, n, body2, (jnp.zeros(K, jnp.int32), i,
                          jnp.zeros(CAPK, jnp.uint32).at[0].set(1))
        )
    )
    np.asarray(f2(idx, 8)[0])
    times = {}
    for n in (8, 64):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f2(idx, n)[0])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_iter = (times[64] - times[8]) / 56
    print(
        f"XLA lut-gather + big-tape scatter while_loop: "
        f"{per_iter*1e6:.1f} us/iter (K={K}, tape={CAPK})",
        flush=True,
    )


if __name__ == "__main__":
    main()
