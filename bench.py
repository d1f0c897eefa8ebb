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
    import os

    import tpuzlib
    from tpuzlib.utils.jaxcache import enable_compile_cache
    from tpuzlib.utils.mem import tune_malloc

    tune_malloc()  # this host pays ~50us/page on first touch; see utils/mem.py
    enable_compile_cache()  # tunnel compiles cost minutes; pay them once

    txt = open("/root/reference/test/paradiselost.txt", "rb").read()
    n = len(txt)
    extras = {}

    # host sections measure the HOST path explicitly; the TPU section
    # measures the device paths (incl. the public-API device dispatch)
    # under its own per-metric alarms
    prev_env = os.environ.get("TPUZLIB_DEVICE")
    os.environ["TPUZLIB_DEVICE"] = "0"

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

    # --- TPU kernels: one alarm budget PER metric, extras recorded as
    # they land (round-2 lesson: a single whole-section alarm lost every
    # TPU number to one slow compile; with the persistent compile cache
    # warm, each metric takes seconds)
    if prev_env is None:
        del os.environ["TPUZLIB_DEVICE"]
    else:
        os.environ["TPUZLIB_DEVICE"] = prev_env
    _run_tpu_section(extras, txt)

    result = _emit(deflate_mbps, extras)
    print(json.dumps(result))


def _loop_time(jax, fn, init, k1=2, k2=8, reps=3):
    """Per-iteration device time by in-jit loop differencing: the tunnel
    adds a ~24 ms floor to EVERY dispatch, so single-dispatch wall times
    measure the tunnel, not the kernel."""
    import time

    import numpy as np
    from jax import lax

    f = jax.jit(lambda x, k: lax.fori_loop(0, k, fn, x))

    def run(k):
        t0 = time.perf_counter()
        r = f(init, k)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
        return time.perf_counter() - t0

    run(1)  # compile + warm
    t1 = min(run(k1) for _ in range(reps))
    t2 = min(run(k2) for _ in range(reps))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def _metric(extras, key, budget, fn):
    """Run one TPU metric under its own alarm; failures are recorded
    per-key and never erase other metrics (round-2 lesson).  NOTE the
    alarm cannot interrupt a blocking XLA compile — it fires when the
    native call returns — so completed extras are also checkpointed to a
    sidecar file, surviving an external kill of the whole process."""
    import json as _json
    import signal

    def _alarm(sig, frame):
        raise TimeoutError("timed out")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(budget)
    try:
        fn()
    except Exception as e:  # pragma: no cover
        extras.setdefault("tpu_errors", {})[key] = str(e)[:120]
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
        try:
            with open("bench_partial.json", "w") as f:
                _json.dump(extras, f)
        except OSError:  # pragma: no cover
            pass


def _run_tpu_section(extras, txt):
    import time

    import numpy as np

    try:
        import jax

        if jax.default_backend() not in ("tpu",):
            return
        import jax.numpy as jnp
    except Exception as e:  # pragma: no cover
        extras["tpu_error"] = str(e)[:160]
        return

    def checksums():
        from tpuzlib.kernels.adler32 import adler32_device
        from tpuzlib.kernels.crc32 import crc32_device

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
        extras["tpu_adler32_GBps"] = round(len(data) / (time.time() - t0) / 1e9, 2)
        import zlib as _z

        assert crc_val == _z.crc32(data.tobytes())

        # device-time split (loop differencing; excludes the ~24 ms
        # tunnel dispatch floor baked into the e2e numbers above)
        from tpuzlib.kernels.crc32_pallas import crc32_device_jit
        from tpuzlib.kernels.adler32_pallas import adler32_device_jit

        # the loop body must depend on the carry AND mutate the data,
        # else XLA hoists the (loop-invariant) checksum out of the loop
        # and the differenced time collapses to ~0
        def crc_body(i, st):
            d, acc = st
            d = d.at[0].set((acc & 127).astype(jnp.uint8))
            return d, acc ^ crc32_device_jit(d)

        per = _loop_time(jax, crc_body, (ddata, jnp.uint32(0)), k1=2, k2=8)
        extras["tpu_crc32_dev_GBps"] = round(len(data) / per / 1e9, 2)

        def adl_body(i, st):
            d, acc = st
            d = d.at[0].set((acc & 127).astype(jnp.uint8))
            return d, acc ^ adler32_device_jit(d)

        per = _loop_time(jax, adl_body, (ddata, jnp.uint32(0)), k1=2, k2=8)
        extras["tpu_adler32_dev_GBps"] = round(len(data) / per / 1e9, 2)

    _metric(extras, "checksums", 600, checksums)

    def deflate_kernel():
        from tpuzlib.kernels import deflate_device as dd
        from tpuzlib.kernels.deflate_device3 import make_encode_batch_v3

        chunk, batch = 1 << 18, 4
        out_words = min(chunk + 4, (chunk * 10) // 32 + 64)
        enc = make_encode_batch_v3(6, chunk, batch, out_words)
        big = np.frombuffer((txt * 40)[: batch * (dd.CTX + chunk)], np.uint8)
        bufs = jnp.asarray(big.reshape(batch, dd.CTX + chunk))
        cv = jnp.zeros(batch, jnp.int32)
        nv = jnp.full(batch, chunk, jnp.int32)
        lv = jnp.zeros(batch, jnp.int32)

        # honest wall number (includes tunnel dispatch)
        w, tb, ok = enc(bufs, cv, nv, lv)
        np.asarray(tb)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            w, tb, ok = enc(bufs, cv, nv, lv)
            np.asarray(tb)
            best = min(best, time.time() - t0)
        extras["tpu_deflate_e2e_MBps"] = round(batch * chunk / best / 1e6, 2)

        # device-time number: e2e minus the measured dispatch+pull floor
        # (a trivial kernel round-trip).  Wrapping the whole v3 encoder
        # in lax.fori_loop for loop-differencing proved an unbounded
        # compile through the tunnel; the floor subtraction needs only a
        # 1-op program and bounds device time from above.
        tiny = jax.jit(lambda x: x + 1)
        tz = jnp.zeros(8, jnp.int32)
        np.asarray(tiny(tz))
        floor = 1e9
        for _ in range(5):
            t0 = time.time()
            np.asarray(tiny(tz))
            floor = min(floor, time.time() - t0)
        extras["tpu_dispatch_floor_ms"] = round(floor * 1000, 2)
        dev = max(best - floor, 1e-9)
        extras["tpu_deflate_kernel_MBps"] = round(batch * chunk / dev / 1e6, 2)

    _metric(extras, "deflate", 900, deflate_kernel)

    def api_device():
        """Public one-shot entry points on the TPU host: the paths a
        reference user actually calls (sd-inflate.ts:189, sd-deflate.ts:263)
        dispatched to the device kernels above the size threshold."""
        import os

        import tpuzlib

        os.environ["TPUZLIB_DEVICE"] = "1"
        # staged device inflate: the fused program's first compile is
        # unbounded through the tunnel (see inflate_device2.use_fused)
        os.environ["TPUZLIB_FUSED"] = "0"
        try:
            src = (txt * 18)[: 8 << 20]
            wire = bytes(tpuzlib.deflate(src, level=6))  # warm/compile
            t0 = time.time()
            wire = bytes(tpuzlib.deflate(src, level=6))
            extras["tpu_api_deflate_MBps"] = round(
                len(src) / (time.time() - t0) / 1e6, 2
            )
            out = tpuzlib.inflate(wire)  # warm/compile
            assert bytes(out) == src
            t0 = time.time()
            tpuzlib.inflate(wire)
            extras["tpu_api_inflate_MBps"] = round(
                len(src) / (time.time() - t0) / 1e6, 2
            )
            from tpuzlib.utils import trace

            counts = trace.get_counters()
            extras["tpu_api_device_fallbacks"] = int(
                counts.get("deflate.device_fallback", 0)
                + counts.get("inflate.device_fallback", 0)
            )
        finally:
            os.environ["TPUZLIB_DEVICE"] = "0"

    _metric(extras, "api_device", 900, api_device)

    def inflate_e2e():
        import os

        from tpuzlib.kernels.inflate_device2 import inflate_device_v2

        import tpuzlib

        os.environ["TPUZLIB_FUSED"] = "0"  # bounded compiles (see above)
        src = (txt * 18)[: 8 << 20]
        wire = bytes(tpuzlib.deflate(src, level=6))
        payload = np.ascontiguousarray(np.frombuffer(wire[2:-4], np.uint8))
        out = inflate_device_v2(payload, size_hint=len(src) + 1024)
        assert out is not None and bytes(out) == src, "device inflate fell back"
        t0 = time.time()
        inflate_device_v2(payload, size_hint=len(src) + 1024)
        extras["tpu_inflate_e2e_MBps"] = round(
            len(src) / (time.time() - t0) / 1e6, 2
        )

    _metric(extras, "inflate", 900, inflate_e2e)


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
