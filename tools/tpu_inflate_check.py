"""Real-TPU check of the round-4 Pallas device inflate.

Decodes an 8 MB stream via inflate_device_v2 (Pallas cursor tokenizer),
verifies bytes, and reports: tokenize device-time (scalar-reduced),
staged e2e, and the host-expand variant.  Run alone — one process/TPU.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from tpuzlib.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    import zlib

    import tpuzlib
    from tpuzlib.kernels.inflate_device2 import _cursor_plan, inflate_device_v2

    txt = open("/root/reference/test/paradiselost.txt", "rb").read()
    src = (txt * (mb * 3))[: mb << 20]
    wire = zlib.compress(src, 6)
    payload = np.ascontiguousarray(np.frombuffer(wire[2:-4], np.uint8))
    print(f"src {len(src)} B, wire {len(payload)} B", flush=True)

    t0 = time.time()
    out = inflate_device_v2(payload, size_hint=len(src) + 1024)
    print(f"first call (compile+run): {time.time()-t0:.1f}s", flush=True)
    assert out is not None, "fell back"
    assert bytes(out) == src, "MISMATCH"
    print("round-trip OK", flush=True)

    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = inflate_device_v2(payload, size_hint=len(src) + 1024)
        best = min(best, time.time() - t0)
    print(
        f"staged e2e: {best*1000:.1f} ms = {len(src)/best/1e6:.1f} MB/s",
        flush=True,
    )

    # host-expand variant (tokens pulled, native expand)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out2 = inflate_device_v2(
            payload, size_hint=len(src) + 1024, device_expand=False
        )
        best = min(best, time.time() - t0)
    assert bytes(out2) == src
    print(
        f"host-expand e2e: {best*1000:.1f} ms = {len(src)/best/1e6:.1f} MB/s",
        flush=True,
    )

    # tokenize-only device time: same parameters as inflate_device_v2
    # (pow2 stride + group buckets, early starts, CAP formula), so the
    # kernel shape — and its compile-cache entry — are identical
    from tpuzlib.kernels import inflate_pallas as ip

    avail_bits = len(payload) * 8
    max_cursors = 8192
    stride_bits = max(1 << 13, -(-avail_bits // (max_cursors - 64)))
    stride_bits = 1 << max(12, (stride_bits - 1).bit_length())
    cp = _cursor_plan(payload, stride_bits, max_cursors)
    K = cp.K
    groups = -(-cp.Kpad // 128)
    Kpad = 128 * (1 << max(0, (groups - 1).bit_length()))
    OVERLAP = 1024
    CAP = -(-max(64, (stride_bits + 3 * OVERLAP) // 6) // 8) * 8
    starts_a = np.full(Kpad, -1, np.int32)
    stops_a = np.zeros(Kpad, np.int32)
    block_a = np.zeros(Kpad, np.int32)
    starts_a[:K] = cp.starts
    stops_a[:K] = cp.stops
    block_a[:K] = cp.block_of
    first, last, bstart, plan, stored_f = cp.meta
    first_a = np.ones(Kpad, bool)
    first_a[:K] = first
    last_a = np.ones(Kpad, bool)
    last_a[:K] = last
    bstart_a = np.zeros(Kpad, np.int32)
    bstart_a[:K] = bstart
    active_a = np.zeros(Kpad, bool)
    active_a[:K] = True
    stored_a = np.zeros(Kpad, bool)
    stored_a[:K] = stored_f
    stops_dec = np.where(last_a & stored_a, stops_a, stops_a + OVERLAP)
    early = active_a & ~first_a & ~stored_a
    starts_a = np.where(
        early, np.maximum(bstart_a, starts_a - OVERLAP), starts_a
    ).astype(np.int32)

    print(f"K={K} Kpad={Kpad} stride={stride_bits} CAP={CAP}", flush=True)
    t0 = time.time()
    r = ip.pallas_cursor_tokenize(
        payload, starts_a, stops_dec, block_a, plan, stride_bits,
        2 * OVERLAP, CAP,
    )
    red = float(np.asarray(jnp.sum(r[2])))
    t1 = time.time() - t0
    print(f"tokenize pass (incl host prep + pull): {t1*1000:.1f} ms, "
          f"{int(red)} tokens", flush=True)
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        r = ip.pallas_cursor_tokenize(
            payload, starts_a, stops_dec, block_a, plan,
            stride_bits, 2 * OVERLAP, CAP,
        )
        np.asarray(jnp.sum(r[2]))
        best = min(best, time.time() - t0)
    print(
        f"tokenize warm: {best*1000:.1f} ms = {len(src)/best/1e6:.1f} MB/s "
        f"(of source)",
        flush=True,
    )


if __name__ == "__main__":
    main()
