"""Per-stage device-time profile of the v3 deflate encoder (round 4).

Times each pipeline stage as its own jit program (loop-differenced where
cheap, floor-subtracted otherwise) at the bench shape, to find where the
~44 ms/MB of device time goes.  Run alone — one process per TPU.
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

    assert jax.default_backend() == "tpu"

    from tpuzlib.kernels import deflate_device as dd
    from tpuzlib.kernels import deflate_device3 as d3

    level, chunk, batch = 6, 1 << 18, 4
    ctx = dd.CTX
    B, N = batch, chunk
    stride = ctx + N
    total = B * stride

    txt = open("/root/reference/test/paradiselost.txt", "rb").read()
    big = np.frombuffer((txt * 40)[: batch * stride], np.uint8)
    bufs = jnp.asarray(big.reshape(batch, stride))
    cv = jnp.zeros(batch, jnp.int32)
    nv = jnp.full(batch, chunk, jnp.int32)

    # dispatch floor
    tiny = jax.jit(lambda x: x + 1)
    tz = jnp.zeros(8, jnp.int32)
    np.asarray(tiny(tz))
    floor = 1e9
    for _ in range(5):
        t0 = time.time()
        np.asarray(tiny(tz))
        floor = min(floor, time.time() - t0)
    print(f"floor {floor*1000:.1f} ms", flush=True)

    def bench(name, fn, *args, reps=5):
        # reduce outputs to scalars INSIDE jit: the tunnel pulls at only
        # ~25-50 MB/s, so pulling full outputs would time the tunnel
        red = jax.jit(
            lambda *a: jax.tree_util.tree_reduce(
                lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)),
                fn(*a), jnp.float32(0),
            )
        )
        np.asarray(red(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(red(*args))
            best = min(best, time.time() - t0)
        print(f"{name}: {max(best-floor,0)*1000:.1f} ms (e2e {best*1000:.1f})",
              flush=True)
        return best - floor

    # tunnel pull bandwidth calibration
    for mb in (1, 4, 16):
        arr = jnp.zeros((mb << 20) // 4, jnp.uint32) + jnp.uint32(1)
        np.asarray(arr)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            np.asarray(arr)
            best = min(best, time.time() - t0)
        print(f"pull {mb} MB: {best*1000:.1f} ms = "
              f"{mb/max(best-floor,1e-9):.1f} MB/s", flush=True)

    # ---- stage A: match_lengths_v3 -------------------------------------
    li = jnp.arange(stride, dtype=jnp.int32)[None, :]
    cb = (jnp.arange(B, dtype=jnp.int32) * stride)[:, None]
    chid = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, stride)
    ).reshape(total)

    @jax.jit
    def stageA(data, ctx_valids, n_valids):
        from tpuzlib.codec.tables import MAX_MATCH

        flat = data.reshape(total)
        ev2 = cb + ctx + n_valids[:, None]
        mincand = (cb + ctx - ctx_valids[:, None] + 0 * li).reshape(total)
        gpos2 = cb + li
        lim16 = jnp.clip(ev2 - gpos2, 0, 16).reshape(total)
        limit = jnp.clip(ev2 - gpos2, 0, MAX_MATCH).reshape(total)
        return d3.match_lengths_v3(jax, jnp, flat, lim16, limit, mincand,
                                   chid, level)

    bench("A match_lengths_v3", stageA, bufs, cv, nv)

    # near screen alone
    @jax.jit
    def stageA1(data):
        flat = data.reshape(total)
        w0 = dd._build_w32(jnp, flat)
        w1 = jnp.concatenate([w0[4:], jnp.zeros(4, jnp.uint32)])
        w2 = jnp.concatenate([w0[8:], jnp.zeros(8, jnp.uint32)])
        w3 = jnp.concatenate([w0[12:], jnp.zeros(12, jnp.uint32)])
        mc = jnp.zeros(total, jnp.int32)
        lim = jnp.full(total, 16, jnp.int32)
        from tpuzlib.kernels.screen_pallas import near_screen

        return near_screen(jax, jnp, w0, w1, w2, w3, mc, lim,
                           d3.LEVELS_V3[level]["nd"])

    bench("A1 near_screen(nd=24)", stageA1, bufs)

    # one probe (sort + far + return sort)
    @jax.jit
    def stageA2(data):
        flat = data.reshape(total)
        w0 = dd._build_w32(jnp, flat)
        w1 = jnp.concatenate([w0[4:], jnp.zeros(4, jnp.uint32)])
        w2 = jnp.concatenate([w0[8:], jnp.zeros(8, jnp.uint32)])
        w3 = jnp.concatenate([w0[12:], jnp.zeros(12, jnp.uint32)])
        pos = jnp.arange(total, dtype=jnp.int32)
        h = d3._hash_k(jnp, w0, w1, 4, 16)
        hc = h | (chid << 16)
        from tpuzlib.kernels.screen_pallas import far_screen

        sh, sp, s0, s1, s2, s3 = jax.lax.sort(
            (hc, pos, w0, w1, w2, w3), num_keys=1, is_stable=True
        )
        fkeys = far_screen(jax, jnp, sh, sp, s0, s1, s2, s3,
                           d3.LEVELS_V3[level]["k4"])
        _, fpos = jax.lax.sort((sp, fkeys), num_keys=1, is_stable=True)
        return fpos

    bench("A2 probe4 (2 sorts + far k=24)", stageA2, bufs)

    @jax.jit
    def stageA2s(data):
        flat = data.reshape(total)
        w0 = dd._build_w32(jnp, flat)
        w1 = jnp.concatenate([w0[4:], jnp.zeros(4, jnp.uint32)])
        w2 = jnp.concatenate([w0[8:], jnp.zeros(8, jnp.uint32)])
        w3 = jnp.concatenate([w0[12:], jnp.zeros(12, jnp.uint32)])
        pos = jnp.arange(total, dtype=jnp.int32)
        h = d3._hash_k(jnp, w0, w1, 4, 16)
        hc = h | (chid << 16)
        return jax.lax.sort((hc, pos, w0, w1, w2, w3), num_keys=1,
                            is_stable=True)[0]

    bench("A2s 6-operand sort alone", stageA2s, bufs)

    # ---- stage B: full token pass --------------------------------------
    @jax.jit
    def stageB(data, ctx_valids, n_valids):
        return d3._tokens_v3(jax, jnp, B, ctx, N, data, ctx_valids,
                             n_valids, level)

    bench("B tokens (match+lazy+parse)", stageB, bufs, cv, nv)

    # ---- stage C: full encode ------------------------------------------
    out_words = min(chunk + 4, (chunk * 10) // 32 + 64)
    enc = d3.make_encode_batch_v3(level, chunk, batch, out_words)
    lv = jnp.zeros(batch, jnp.int32)
    bench("C full encode", enc, bufs, cv, nv, lv)

    # ---- synthetic sort costs at pipeline shapes -----------------------
    rng = np.random.default_rng(0)
    T_CAP = max(d3.PACK_TILE * 8, (N // 2 // (d3.PACK_TILE * 8)) * d3.PACK_TILE * 8)
    F = 1 + 338 + T_CAP
    n_pack = B * (3 * F + out_words)
    for n, ops in ((B * N, 2), (B * T_CAP, 3), (n_pack, 2)):
        keys = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
        pays = [
            jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
            for _ in range(ops - 1)
        ]
        f = jax.jit(
            lambda k, *p: jax.lax.sort((k, *p), num_keys=1, is_stable=True)[0]
        )
        bench(f"sort {n/1e6:.2f}M x{ops}", f, keys, *pays)

    # cumsum at pack shape
    f = jax.jit(lambda x: jnp.cumsum(x, dtype=jnp.uint32))
    x = jnp.asarray(rng.integers(0, 1 << 30, n_pack, dtype=np.int32)).astype(
        jnp.uint32
    )
    bench(f"cumsum {n_pack/1e6:.2f}M", f, x)

    # ---- pack_fields kernel at shape -----------------------------------
    nrows = B * T_CAP // d3.PACK_TILE
    tok = jnp.asarray(
        rng.integers(0, 1 << 20, (nrows, d3.PACK_TILE), dtype=np.int64)
    ).astype(jnp.uint32)
    ltab = jnp.zeros((B, 8, 384), jnp.float32)
    dtab = jnp.zeros((B, 8, 32), jnp.float32)
    pk = jax.jit(
        lambda t, l, d: d3._pack_fields_kernel(
            nrows, T_CAP // d3.PACK_TILE // 8, False
        )(t, l, d)
    )
    bench("pack_fields kernel", pk, tok, ltab, dtab)

    # ---- package-merge batch -------------------------------------------
    from tpuzlib.kernels.huffman_device import package_merge_device

    freqs = jnp.asarray(rng.integers(0, 1000, (2 * B, 286), dtype=np.int32))
    pm = jax.jit(
        lambda f: jax.vmap(lambda x: package_merge_device(jax, jnp, x, 15))(f)
    )
    bench("package_merge x2B", pm, freqs)


if __name__ == "__main__":
    main()
