#!/usr/bin/env python
"""Weak-scaling shape check for the sharded deflate pipeline.

BASELINE.md demands >80% scaling efficiency at 2+ hosts.  Real multi-chip
hardware is not available in this environment (one v5e via a tunnel), so
this measures the SHAPE of the scaling curve on N virtual CPU devices:
each device compresses one 256 KiB shard (weak scaling — work per device
constant), and efficiency_N = T_1 / T_N (perfect weak scaling keeps the
step time flat).  CPU devices share host cores, so the curve here is a
lower bound on dedicated-chip efficiency: the collectives (ppermute halo,
psum checksum combines) are the only cross-device traffic and they are
O(32 KiB + scalars) per step regardless of N.

Writes SCALING_r{N}.json at the repo root when run with --out.

Usage: python tools/scaling_curve.py [--out SCALING_r03.json]
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    import jax.numpy as jnp

    from tpuzlib.parallel.mesh import make_mesh
    from tpuzlib.parallel.pipeline import build_sharded_deflate

    shard_len = 1 << 18
    text = open("/root/reference/test/paradiselost.txt", "rb").read() * 8
    results = {}
    t1 = None
    for ndev in (1, 2, 4, 8):
        mesh = make_mesh(ndev, platform="cpu")
        run, _ = build_sharded_deflate(mesh, shard_len, level=6, dynamic=True)
        n = shard_len * ndev
        data = np.frombuffer(text[:n], np.uint8)
        out = run(jnp.asarray(data), n)
        jax.block_until_ready(out)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(jnp.asarray(data), n)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        t = min(times)
        if t1 is None:
            t1 = t
        eff = t1 / t
        results[str(ndev)] = {
            "step_s": round(t, 4),
            "MBps_total": round(n / t / 1e6, 1),
            "weak_scaling_eff": round(eff, 3),
        }
        print(ndev, results[str(ndev)], flush=True)

    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    if out_path:
        json.dump(
            {
                "method": "weak scaling, 256KiB/device, N virtual CPU "
                "devices sharing 2 host cores (shape check; dedicated "
                "chips would not share compute)",
                "results": results,
            },
            open(out_path, "w"),
            indent=1,
        )
        print("wrote", out_path)


if __name__ == "__main__":
    main()
