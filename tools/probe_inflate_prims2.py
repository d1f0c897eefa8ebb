"""Second-round primitive probes for the inflate kernel divergence:
sublane reductions, variable-amount shifts, and the kernel's actual
tree_decode/lookup subroutines on real canonical tables."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tpuzlib.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(1)

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
                bad = np.argwhere(got != want)[:6]
                for b in bad:
                    print(f"   at {tuple(b)}: got {got[tuple(b)]} want "
                          f"{want[tuple(b)]}", flush=True)
            return same
        except Exception as e:
            print(f"{name}: FAIL {str(e).splitlines()[0][:140]}", flush=True)
            return False

    # (f) sublane min+sum reduce with keepdims
    x = jnp.asarray(rng.integers(0, 1000, (16, 128), dtype=np.int32))

    def k_f(x_ref, o_ref):
        m = jnp.min(x_ref[:], axis=0, keepdims=True)
        s = jnp.sum(x_ref[:], axis=0, keepdims=True)
        o_ref[:] = jnp.concatenate([m, s], axis=0)

    check("f sublane min/sum", k_f, (x,),
          jax.ShapeDtypeStruct((2, 128), jnp.int32))

    # (g) variable-amount shifts
    rv = jnp.asarray(rng.integers(0, 1 << 16, (1, 128), dtype=np.int32))
    eb = jnp.asarray(rng.integers(0, 14, (1, 128), dtype=np.int32))

    def k_g(r_ref, e_ref, o_ref):
        Lrow = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
        code = jnp.broadcast_to(r_ref[:], (16, 128)) >> (16 - Lrow)
        ebv = e_ref[:].astype(jnp.uint32)
        mask = ((jnp.uint32(1) << ebv) - 1).astype(jnp.int32)
        o_ref[:] = jnp.concatenate([code, jnp.broadcast_to(mask, (1, 128))],
                                   axis=0)

    check("g variable shifts", k_g, (rv, eb),
          jax.ShapeDtypeStruct((17, 128), jnp.int32))

    # (h) tree_decode on a real canonical table
    from tpuzlib.codec.tables import FIXED_LITLEN_LENGTHS
    from tpuzlib.kernels.inflate_pallas import canon_tables

    ents, cnt16, first16, off16 = canon_tables(
        np.asarray(FIXED_LITLEN_LENGTHS), "litlen"
    )
    cnt_t = jnp.asarray(np.tile(cnt16[:, None], (1, 128)))
    fst_t = jnp.asarray(np.tile(first16[:, None], (1, 128)))
    off_t = jnp.asarray(np.tile(off16[:, None], (1, 128)))
    w = jnp.asarray(rng.integers(0, 1 << 32, (1, 128), dtype=np.uint64)
                    .astype(np.uint32))

    def k_h(w_ref, c_ref, f_ref, o_ref, out_ref):
        def rev16(wv):
            r = wv & jnp.uint32(0xFFFF)
            r = ((r & jnp.uint32(0x5555)) << 1) | ((r >> 1) & jnp.uint32(0x5555))
            r = ((r & jnp.uint32(0x3333)) << 2) | ((r >> 2) & jnp.uint32(0x3333))
            r = ((r & jnp.uint32(0x0F0F)) << 4) | ((r >> 4) & jnp.uint32(0x0F0F))
            r = ((r & jnp.uint32(0x00FF)) << 8) | ((r >> 8) & jnp.uint32(0x00FF))
            return r

        Lrow = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
        rv = rev16(w_ref[:]).astype(jnp.int32)
        code = jnp.broadcast_to(rv, (16, 128)) >> (16 - Lrow)
        cnt = c_ref[:]
        first = f_ref[:]
        off = o_ref[:]
        match = (code >= first) & (code - first < cnt) & (Lrow >= 1)
        Lsel = jnp.min(jnp.where(match, Lrow, 99), axis=0, keepdims=True)
        Lc = jnp.clip(Lsel, 0, 15)
        pick = Lrow == Lc
        rank = jnp.sum(jnp.where(pick, off + code - first, 0),
                       axis=0, keepdims=True)
        out_ref[:] = jnp.concatenate([Lsel, rank], axis=0)

    check("h tree_decode fixed-lit", k_h, (w, cnt_t, fst_t, off_t),
          jax.ShapeDtypeStruct((2, 128), jnp.int32))

    # (i) lookup over a (288,128) entry table
    LE = 288
    etab = jnp.asarray(
        np.tile(ents[:, None], (1, 128)).astype(np.uint32)
    )
    rank = jnp.asarray(rng.integers(0, 286, (1, 128), dtype=np.int32))

    def k_i(e_ref, r_ref, out_ref):
        r = jnp.clip(r_ref[:], 0, LE - 1)
        v = r >> 3
        sb = jnp.broadcast_to(r & 7, (8, 128))
        out = jnp.zeros((1, 128), jnp.uint32)
        for t in range(LE // 8):
            tile = e_ref[t * 8 : (t + 1) * 8, :]
            g = jnp.take_along_axis(tile, sb, axis=0)[0:1]
            out = jnp.where(v == t, g, out)
        out_ref[:] = out

    check("i lookup 288", k_i, (etab, rank),
          jax.ShapeDtypeStruct((1, 128), jnp.uint32))

    # (j) the w64 window assembly + dist re-window (shift edge cases)
    wa = jnp.asarray(rng.integers(0, 1 << 32, (1, 128), dtype=np.uint64)
                     .astype(np.uint32))
    wb = jnp.asarray(rng.integers(0, 1 << 32, (1, 128), dtype=np.uint64)
                     .astype(np.uint32))
    wc = jnp.asarray(rng.integers(0, 1 << 32, (1, 128), dtype=np.uint64)
                     .astype(np.uint32))
    sh = jnp.asarray(rng.integers(0, 32, (1, 128), dtype=np.int32))
    o = jnp.asarray(rng.integers(0, 21, (1, 128), dtype=np.int32))

    def k_j(a_ref, b_ref, c_ref, s_ref, o2_ref, out_ref):
        w_a, w_b, w_c = a_ref[:], b_ref[:], c_ref[:]
        shv = s_ref[:].astype(jnp.uint32)
        nsh = (jnp.uint32(32) - shv) & jnp.uint32(31)
        hi_b = jnp.where(shv == 0, jnp.uint32(0), w_b << nsh)
        hi_c = jnp.where(shv == 0, jnp.uint32(0), w_c << nsh)
        w64_lo = (w_a >> shv) | hi_b
        w64_hi = (w_b >> shv) | hi_c
        ov = jnp.clip(o2_ref[:], 0, 31).astype(jnp.uint32)
        no = (jnp.uint32(32) - ov) & jnp.uint32(31)
        w2 = jnp.where(ov == 0, w64_lo, (w64_lo >> ov) | (w64_hi << no))
        out_ref[:] = jnp.concatenate([w64_lo, w64_hi, w2], axis=0)

    check("j window assembly", k_j, (wa, wb, wc, sh, o),
          jax.ShapeDtypeStruct((3, 128), jnp.uint32))


if __name__ == "__main__":
    main()
