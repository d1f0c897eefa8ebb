"""Real-TPU check: v3 device deflate at the bench shape.

Compiles make_encode_batch_v3(6, 256 KiB, batch 4) on the chip (the
round-3 verdict's gating defect was a VMEM OOM here), round-trips the
output through python-zlib, and reports e2e + device-time throughput.
Run alone — only one process may hold the TPU.
"""

import os
import sys
import time

import numpy as np

# repo root importable; NOT via PYTHONPATH, which would shadow the axon
# TPU plugin's early-startup imports (sitecustomize runs before us)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 18
    level = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from tpuzlib.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()

    from tpuzlib.codec.bitsink import BitSink
    from tpuzlib.kernels import deflate_device as dd
    from tpuzlib.kernels.deflate_device3 import make_encode_batch_v3

    out_words = min(chunk + 4, (chunk * 10) // 32 + 64)
    print(f"building enc3 level={level} chunk={chunk} batch={batch}", flush=True)
    enc = make_encode_batch_v3(level, chunk, batch, out_words)

    txt = open("/root/reference/test/paradiselost.txt", "rb").read()
    big = np.frombuffer((txt * 40)[: batch * (dd.CTX + chunk)], np.uint8)
    bufs = jnp.asarray(big.reshape(batch, dd.CTX + chunk))
    cv = jnp.zeros(batch, jnp.int32)
    nv = jnp.full(batch, chunk, jnp.int32)
    lv = jnp.zeros(batch, jnp.int32).at[batch - 1].set(1)

    t0 = time.time()
    words, tb, ok = enc(bufs, cv, nv, lv)
    np.asarray(tb)
    print(f"first call (compile+run): {time.time()-t0:.1f}s", flush=True)

    # correctness: assemble + decode
    import zlib

    wh = np.asarray(words)
    tbh = np.asarray(tb)
    okh = np.asarray(ok)
    print("ok flags:", okh.tolist(), "total_bits:", tbh.tolist(), flush=True)
    assert okh.all(), "token-cap overflow on text corpus?!"
    sink = BitSink()
    for b in range(batch):
        dd._push_words(sink, wh[b], int(tbh[b]))
    body, _, _ = sink.flush(final=True)
    src = big.reshape(batch, dd.CTX + chunk)[:, dd.CTX :].reshape(-1).tobytes()
    dec = zlib.decompress(bytes(body), -15)
    assert dec == src, "round-trip FAILED"
    ratio = len(body) / len(src)
    print(f"round-trip OK, ratio {ratio:.4f} ({len(body)} B)", flush=True)

    # timing: e2e best-of-5 + dispatch floor
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        words, tb, ok = enc(bufs, cv, nv, lv)
        np.asarray(tb)
        best = min(best, time.time() - t0)
    tiny = jax.jit(lambda x: x + 1)
    tz = jnp.zeros(8, jnp.int32)
    np.asarray(tiny(tz))
    floor = 1e9
    for _ in range(5):
        t0 = time.time()
        np.asarray(tiny(tz))
        floor = min(floor, time.time() - t0)
    mb = batch * chunk / 1e6
    print(
        f"e2e {best*1000:.1f} ms = {mb/best:.1f} MB/s; "
        f"floor {floor*1000:.1f} ms; device-time "
        f"{mb/max(best-floor,1e-9):.1f} MB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
