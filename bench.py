#!/usr/bin/env python
"""tpuzlib benchmark — prints ONE JSON line for the driver.

Methodology mirrors the reference perf harness (test/perf.html:23-37):
repeated one-shot deflate/inflate over the paradiselost corpus, extremes
trimmed.  Baselines are the only numbers the reference ever recorded
(BASELINE.md): deflate L6 = 39-48 ms on 471,162 B (~11 MB/s midpoint).
The reference did not record an inflate time.

Extras report the TPU checksum kernels and the device codec path, plus a
large-corpus throughput figure (the multi-core/production path).
"""

import json
import sys
import time

import numpy as np


def timed(fn, reps=10):
    fn()  # warm
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    times.sort()
    trimmed = times[1:-1] if len(times) > 4 else times
    return sum(trimmed) / len(trimmed)


def main():
    import tpuzlib
    from tpuzlib.utils.mem import tune_malloc

    tune_malloc()  # this host pays ~50us/page on first touch; see utils/mem.py

    txt = open("/root/reference/test/paradiselost.txt", "rb").read()
    n = len(txt)
    extras = {}

    # --- headline: deflate L6, reference methodology --------------------
    wire6 = bytes(tpuzlib.deflate(txt, level=6))
    t_deflate = timed(lambda: tpuzlib.deflate(txt, level=6), reps=12)
    deflate_mbps = n / t_deflate / 1e6
    extras["deflate_l6_ms"] = round(t_deflate * 1000, 1)
    extras["deflate_l6_size"] = len(wire6)
    extras["deflate_l6_size_vs_ref"] = len(wire6) - 193730

    # --- inflate (no recorded reference number) -------------------------
    t_inflate = timed(lambda: tpuzlib.inflate(wire6), reps=12)
    extras["inflate_MBps"] = round(n / t_inflate / 1e6, 1)

    # --- large-corpus throughput (production path) ----------------------
    # one warm pass faults in the working set (page faults cost ~50us
    # here), then steady-state is timed: best of 3
    big = (txt * 70)[: 32 << 20]
    cbig = tpuzlib.deflate(big, level=6)
    obig = tpuzlib.inflate(cbig)
    assert bytes(obig) == big
    best_d = best_i = 1e9
    for _ in range(3):
        t0 = time.time()
        cbig = tpuzlib.deflate(big, level=6)
        best_d = min(best_d, time.time() - t0)
        t0 = time.time()
        obig = tpuzlib.inflate(cbig)
        best_i = min(best_i, time.time() - t0)
    extras["deflate_l6_32MB_MBps"] = round(len(big) / best_d / 1e6, 1)
    extras["inflate_32MB_MBps"] = round(len(big) / best_i / 1e6, 1)

    # --- TPU kernels (bounded + retried: the remote tunnel can stall) ---
    import signal

    def _alarm(sig, frame):
        raise TimeoutError("tpu section timed out")

    signal.signal(signal.SIGALRM, _alarm)
    for attempt, budget in ((0, 240), (1, 150)):
        if attempt and "tpu_error" not in extras:
            break
        extras.pop("tpu_error", None)
        signal.alarm(budget)
        _run_tpu_section(extras, txt)
        signal.alarm(0)

    result = _emit(deflate_mbps, extras)
    print(json.dumps(result))


def _run_tpu_section(extras, txt):
    import time

    import numpy as np

    try:
        import jax

        if jax.default_backend() in ("tpu",):
            from tpuzlib.kernels.adler32 import adler32_device
            from tpuzlib.kernels.crc32 import crc32_device

            import jax.numpy as jnp

            data = np.frombuffer((txt * 140)[: 64 << 20], np.uint8)
            # device-resident input: the production scenario is checksums
            # over data already in HBM (decompressed shards)
            ddata = jax.device_put(jnp.asarray(data))
            jax.block_until_ready(ddata)
            crc_val = crc32_device(ddata)  # warm/compile
            crc32_device(ddata)  # second warm (transfer-program cache)
            t0 = time.time()
            crc_val = crc32_device(ddata)
            extras["tpu_crc32_GBps"] = round(len(data) / (time.time() - t0) / 1e9, 2)
            adler32_device(ddata)
            adler32_device(ddata)
            t0 = time.time()
            adler32_device(ddata)
            extras["tpu_adler32_GBps"] = round(
                len(data) / (time.time() - t0) / 1e9, 2
            )
            import zlib as _z

            assert crc_val == _z.crc32(data.tobytes())

            # device codec kernel (honest number: gather-bound this round)
            from tpuzlib.kernels.deflate_device import (
                CTX,
                match_and_parse,
                pack_static_block,
            )

            chunk = 1 << 18
            dbuf = jax.device_put(
                jnp.asarray(np.frombuffer((txt * 40)[: CTX + chunk], np.uint8))
            )

            @jax.jit
            def dev_encode(x):
                it, ll_, dd_ = match_and_parse(
                    jax, jnp, x, jnp.int32(0), jnp.int32(chunk), 6
                )
                return pack_static_block(jax, jnp, it, ll_, dd_, jnp.int32(1))

            r = dev_encode(dbuf)
            np.asarray(r[1])
            t0 = time.time()
            for _ in range(3):
                r = dev_encode(dbuf)
                np.asarray(r[1])
            extras["tpu_deflate_kernel_MBps"] = round(
                chunk / ((time.time() - t0) / 3) / 1e6, 2
            )
    except Exception as e:  # pragma: no cover
        extras["tpu_error"] = str(e)[:120]


def _emit(deflate_mbps, extras):
    # vs_baseline: reference deflate L6 midpoint 43.5 ms -> 10.8 MB/s
    baseline_mbps = 471162 / 0.0435 / 1e6
    return {
        "metric": "deflate_l6_throughput",
        "value": round(deflate_mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(deflate_mbps / baseline_mbps, 3),
        "extras": extras,
    }


if __name__ == "__main__":
    sys.exit(main())
