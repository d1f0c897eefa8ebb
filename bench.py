#!/usr/bin/env python
"""tpuzlib benchmark — prints ONE JSON line for the driver.

Methodology mirrors the reference perf harness (test/perf.html:23-37):
repeated one-shot deflate/inflate over the paradiselost corpus, extremes
trimmed.  Baselines are the only numbers the reference ever recorded
(BASELINE.md): deflate L6 = 39-48 ms on 471,162 B (~11 MB/s midpoint).
The reference did not record an inflate time.

Extras report the TPU kernels and the device codec paths.  Two numbers
per codec path:
  *_dev_MBps  — device time, measured with outputs scalar-reduced INSIDE
                jit and the measured dispatch floor subtracted (through
                the remote tunnel, pulling full outputs times the ~25-50
                MB/s tunnel, not the chip; see tools/profile_v3.py)
  *_e2e_MBps  — honest wall time incl. the tunnel dispatch + result pull

Round-4 budget discipline: every TPU program this bench compiles is
pre-compiled into the persistent cache by `python bench.py --warm`
(tools/warm_cache.py invokes it during the round), so the driver run
only replays cached executables; per-metric alarms are small and real
exceptions are recorded per-key (never masked as bare timeouts).
"""

import json
import sys
import time

import numpy as np

WARM = "--warm" in sys.argv[1:]


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

    # host sections measure the HOST path explicitly (device dispatch off)
    prev_device = os.environ.get("TPUZLIB_DEVICE")
    os.environ["TPUZLIB_DEVICE"] = "0"
    try:
        # --- headline: deflate L6, reference methodology ----------------
        wire6 = bytes(tpuzlib.deflate(txt, level=6))
        t_deflate = timed(lambda: tpuzlib.deflate(txt, level=6), reps=12)
        deflate_mbps = n / t_deflate / 1e6
        extras["deflate_l6_ms"] = round(t_deflate * 1000, 1)
        extras["deflate_l6_size"] = len(wire6)
        extras["deflate_l6_size_vs_ref"] = len(wire6) - 193730

        # --- inflate (no recorded reference number) ---------------------
        t_inflate = timed(lambda: tpuzlib.inflate(wire6), reps=12)
        extras["inflate_MBps"] = round(n / t_inflate / 1e6, 1)

        # --- large-corpus throughput (production path) ------------------
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
    finally:
        if prev_device is None:
            del os.environ["TPUZLIB_DEVICE"]
        else:
            os.environ["TPUZLIB_DEVICE"] = prev_device

    _run_tpu_section(extras, txt)

    result = _emit(deflate_mbps, extras)
    print(json.dumps(result))


def _loop_time(jax, fn, init, floor, k=256, reps=5):
    """Per-iteration device time from ONE big in-jit loop: per =
    (wall(k iterations) - dispatch_floor) / k.  The tunnel adds a ~24 ms
    floor with multi-ms jitter to every dispatch, so two-point
    differencing (round 2/3's method) swung by an order of magnitude run
    to run; a k large enough that k*per >> jitter makes the subtraction
    stable.  Returns None if the loop never rises above the floor."""
    import time

    import numpy as np
    from jax import lax

    f = jax.jit(lambda x, n: lax.fori_loop(0, n, fn, x))

    def run(n):
        t0 = time.perf_counter()
        r = f(init, n)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
        return time.perf_counter() - t0

    run(1)  # compile + warm
    t = min(run(k) for _ in range(reps))
    per = (t - floor) / k
    return per if per > 0 else None


def _metric(extras, key, budget, fn):
    """Run one TPU metric under its own alarm; failures are recorded
    per-key with the REAL exception text and never erase other metrics.
    NOTE the alarm cannot interrupt a blocking XLA compile — it fires
    when the native call returns — so completed extras are also
    checkpointed to a sidecar file, surviving an external kill."""
    import json as _json
    import signal

    def _alarm(sig, frame):
        raise TimeoutError(f"alarm after {budget}s")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(budget)
    t0 = time.time()
    try:
        fn()
    except Exception as e:  # pragma: no cover
        extras.setdefault("tpu_errors", {})[key] = (
            f"{type(e).__name__}: {str(e)[:160]}"
        )
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
        extras.setdefault("tpu_metric_seconds", {})[key] = round(
            time.time() - t0, 1
        )
        try:
            with open("bench_partial.json", "w") as f:
                _json.dump(extras, f)
        except OSError:  # pragma: no cover
            pass


def _scalar_reduced(jax, jnp, fn):
    """jit(fn) with every output summed to ONE f32 scalar, so timing
    excludes the tunnel's slow full-array pulls."""
    return jax.jit(
        lambda *a: jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)),
            fn(*a),
            jnp.float32(0),
        )
    )


def _floor(jax, jnp):
    tiny = jax.jit(lambda x: x + 1)
    tz = jnp.zeros(8, jnp.int32)
    np.asarray(tiny(tz))
    fl = 1e9
    for _ in range(5):
        t0 = time.time()
        np.asarray(tiny(tz))
        fl = min(fl, time.time() - t0)
    return fl


def _run_tpu_section(extras, txt):
    try:
        import jax

        if jax.default_backend() not in ("tpu",):
            return
        import jax.numpy as jnp
    except Exception as e:  # pragma: no cover
        extras["tpu_error"] = str(e)[:160]
        return

    # generous alarms in --warm mode (first compiles take minutes through
    # the tunnel); tight ones for the driver run against the warm cache
    b_cks, b_def, b_inf, b_api = (
        (1800, 2400, 2400, 1800) if WARM else (300, 420, 420, 420)
    )

    floor = _floor(jax, jnp)
    extras["tpu_dispatch_floor_ms"] = round(floor * 1000, 2)

    def checksums():
        from tpuzlib.kernels.adler32 import adler32_device
        from tpuzlib.kernels.crc32 import crc32_device

        data = np.frombuffer((txt * 140)[: 64 << 20], np.uint8)
        ddata = jax.device_put(jnp.asarray(data))
        jax.block_until_ready(ddata)
        crc_val = crc32_device(ddata)
        crc32_device(ddata)
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

        # device-time split: COPY-FREE loop timing (round 5).  The round
        # -4 method mutated the 64 MB input via d.at[0].set per
        # iteration; probe_crc2.py measured that carry copy alone at
        # ~22.5 ms — it dominated, and the recorded 2.48 GB/s crc was
        # the copy, not the kernel.  Now the loop carry feeds the Pallas
        # kernels through a tiny value-neutral `mix` input: XLA cannot
        # hoist the call (its input changes) and nothing big is copied.
        from tpuzlib.kernels.adler32_pallas import adler32_device_jit
        from tpuzlib.kernels.crc32_pallas import crc32_device_jit

        def crc_body(i, acc):
            mix = jnp.full((8, 128), acc.astype(jnp.int32), jnp.int32)
            return acc ^ crc32_device_jit(ddata, mix)

        per = _loop_time(jax, crc_body, jnp.uint32(0), floor, k=256)
        extras["tpu_crc32_dev_GBps"] = (
            round(len(data) / per / 1e9, 2) if per else None
        )

        def adl_body(i, acc):
            mix = jnp.full((8, 128), acc.astype(jnp.int32), jnp.int32)
            return acc ^ adler32_device_jit(ddata, mix)

        per = _loop_time(jax, adl_body, jnp.uint32(0), floor, k=256)
        extras["tpu_adler32_dev_GBps"] = (
            round(len(data) / per / 1e9, 2) if per else None
        )

        # host comparison on the same buffer: the device checksums are
        # the library's first clear device-beats-host paths (r5)
        from tpuzlib.kernels.adler32 import adler32_host
        from tpuzlib.kernels.crc32 import crc32_host

        t0 = time.time()
        crc32_host(data)
        extras["host_crc32_GBps"] = round(
            len(data) / (time.time() - t0) / 1e9, 2
        )
        t0 = time.time()
        adler32_host(data)
        extras["host_adler32_GBps"] = round(
            len(data) / (time.time() - t0) / 1e9, 2
        )

    _metric(extras, "checksums", b_cks, checksums)

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
        mb = batch * chunk / 1e6

        # honest wall number (includes tunnel dispatch + words pull)
        w, tb, ok = enc(bufs, cv, nv, lv)
        assert np.asarray(ok).all()
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            w, tb, ok = enc(bufs, cv, nv, lv)
            np.asarray(w)
            best = min(best, time.time() - t0)
        extras["tpu_deflate_e2e_MBps"] = round(mb / best, 2)

        # device time: scalar-reduced outputs, floor-subtracted
        red = _scalar_reduced(jax, jnp, enc)
        np.asarray(red(bufs, cv, nv, lv))
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            np.asarray(red(bufs, cv, nv, lv))
            best = min(best, time.time() - t0)
        dev = best - floor
        if dev < 0.2 * floor:
            # floor-bound: a throughput number here would be meaningless
            extras["tpu_deflate_dev_MBps"] = None
            extras["tpu_deflate_dev_floor_bound"] = True
        else:
            extras["tpu_deflate_dev_MBps"] = round(mb / dev, 2)
        extras["tpu_deflate_dev_ms"] = round(max(dev, 0) * 1000, 1)

    _metric(extras, "deflate", b_def, deflate_kernel)

    def inflate_device():
        import zlib

        from tpuzlib.kernels.inflate_device2 import inflate_device_v2

        src = (txt * 18)[: 8 << 20]
        wire = zlib.compress(src, 6)
        payload = np.ascontiguousarray(np.frombuffer(wire[2:-4], np.uint8))
        mb = len(src) / 1e6

        out = inflate_device_v2(payload, size_hint=len(src) + 1024)
        assert out is not None and bytes(out) == src, "device inflate fell back"
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            inflate_device_v2(payload, size_hint=len(src) + 1024)
            best = min(best, time.time() - t0)
        extras["tpu_inflate_e2e_MBps"] = round(mb / best, 2)

        # host-expand variant: tokens pulled once, native expansion
        out2 = inflate_device_v2(
            payload, size_hint=len(src) + 1024, device_expand=False
        )
        assert out2 is not None and bytes(out2) == src
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            inflate_device_v2(
                payload, size_hint=len(src) + 1024, device_expand=False
            )
            best = min(best, time.time() - t0)
        extras["tpu_inflate_hostexp_MBps"] = round(mb / best, 2)

        from tpuzlib.utils import trace

        counts = trace.get_counters()
        extras["tpu_inflate_fallbacks"] = int(
            counts.get("inflate.device_fallback", 0)
        )

        # per-stage wall breakdown (tunnel terms vs codec terms) for the
        # artifact — one extra timed run with stage telemetry on
        import os as _os

        from tpuzlib.kernels import inflate_device2 as _idv

        _os.environ["TPUZLIB_TIME_INFLATE"] = "1"
        try:
            inflate_device_v2(payload, size_hint=len(src) + 1024)
            extras["tpu_inflate_stage_ms"] = dict(_idv.last_stage_ms)
        finally:
            del _os.environ["TPUZLIB_TIME_INFLATE"]

    _metric(extras, "inflate", b_inf, inflate_device)

    def api_device():
        """Public one-shot entry points on the TPU host: the paths a
        reference user actually calls (sd-inflate.ts:189,
        sd-deflate.ts:263) dispatched to the device kernels above the
        size threshold."""
        import os

        import tpuzlib

        saved = {
            k: os.environ.get(k) for k in ("TPUZLIB_DEVICE", "TPUZLIB_FUSED")
        }
        os.environ["TPUZLIB_DEVICE"] = "1"
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
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    _metric(extras, "api_device", b_api, api_device)


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
