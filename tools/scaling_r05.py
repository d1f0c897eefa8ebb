#!/usr/bin/env python
"""SCALING_r05: per-stage scaling decomposition of the mesh deflate.

The round-3/4 scaling artifacts measured wall-clock on N virtual devices
multiplexed onto 2 shared CPU cores — an artifact of the host, proving
wiring but nothing about device scaling (VERDICT r4 weak #6).  This one
separates the quantities that actually determine multi-chip efficiency:

  1. per-shard COMPUTE: the v3 encoder's measured single-chip device
     time (PROFILE_r05, real v5e) — scale-invariant per shard;
  2. COLLECTIVE traffic: counted from the lowered HLO of the sharded
     step at ndev = 1/2/4/8 (ppermute halo bytes, psum/all-reduce bytes
     for the adler/crc combines) — these are the only inter-chip terms;
  3. a projected efficiency: t_step = t_compress + traffic/BW_ICI +
     n_collectives * t_launch, with published v5e ICI numbers
     (~45 GB/s/link usable, ~1 us collective launch) and the measured
     compute — plus the same projection under a 10x-pessimistic ICI.

Also records the virtual-mesh wall-clocks (wiring sanity only, shared
-core caveat stated in the artifact).
"""

import json
import re
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuzlib.parallel.mesh import make_mesh  # noqa: E402
from tpuzlib.parallel.pipeline import build_sharded_deflate  # noqa: E402

SHARD = 1 << 18  # 256 KiB production shards (same as dryrun_multichip)
CTX = 1 << 15

# measured on the real v5e this round (tools/profile_v3_post.py):
# full v3 encode 39.6 ms / 1.05 MB batch -> per-shard (256 KiB) compute
COMPRESS_MS_PER_MIB = 37.7
T_COMPRESS_S = COMPRESS_MS_PER_MIB * (SHARD / (1 << 20)) / 1e3

ICI_BW = 45e9  # usable per-link B/s (v5e 4-link torus, conservative)
T_LAUNCH = 2e-6  # per-collective launch/sync
ICI_BW_PESS = 4.5e9  # 10x pessimistic sensitivity


_BYTES = {"u8": 1, "s8": 1, "u32": 4, "s32": 4, "f32": 4, "bf16": 2,
          "u16": 2, "s16": 2, "pred": 1, "u64": 8, "s64": 8, "f64": 8}


def _collective_census(hlo: str, ndev: int):
    """Count collective ops + per-participant payload bytes from
    compiled HLO.  Lines look like
      %ppermute.3 = u8[4096]{0} collective-permute(...)
      %all-reduce.3 = (s32[], s32[], s32[32]{0}) all-reduce(...)
    (tuple shapes possible)."""
    stats = {"ppermute_bytes": 0, "allreduce_bytes": 0, "n_collectives": 0}
    for m in re.finditer(
        r"=\s*(\([^)]*\)|\w+\[[\d,]*\](?:\{[\d,]*\})?)\s*"
        r"(collective-permute|all-reduce|all-gather|reduce-scatter)\(",
        hlo,
    ):
        shape_s, op = m.group(1), m.group(2)
        nbytes = 0
        for t in re.finditer(r"(\w+)\[([\d,]*)\]", shape_s):
            sz = 1
            for d in t.group(2).split(","):
                if d:
                    sz *= int(d)
            nbytes += sz * _BYTES.get(t.group(1), 4)
        stats["n_collectives"] += 1
        if op == "collective-permute":
            stats["ppermute_bytes"] += nbytes
        else:
            stats["allreduce_bytes"] += nbytes
    return stats


def main():
    results = {}
    for ndev in (1, 2, 4, 8):
        mesh = make_mesh(ndev, platform="cpu")
        run, ctx = build_sharded_deflate(mesh, SHARD, level=6, ctx=CTX)
        n = SHARD * ndev - 12345
        txt = open("/root/reference/test/paradiselost.txt", "rb").read()
        data = (txt * (SHARD * ndev // len(txt) + 1))[: SHARD * ndev]
        padded = np.frombuffer(data, np.uint8).copy()

        out = run(jnp.asarray(padded), n)
        jax.block_until_ready(out)
        t0 = time.time()
        out = run(jnp.asarray(padded), n)
        jax.block_until_ready(out)
        wall = time.time() - t0

        # capture compiled HLO of the inner jitted step for the census
        import tpuzlib.parallel.pipeline as pmod

        hlo = ""
        try:
            # rebuild the exact jit and lower it with the same shardings
            from jax.sharding import NamedSharding, PartitionSpec as P

            shift = jax.device_put(
                jnp.asarray(
                    pmod._shard_shift_matrix_bits(SHARD, ndev, n)
                ).reshape(ndev * 32, 32),
                NamedSharding(mesh, P("shards")),
            )
            darr = jax.device_put(
                jnp.asarray(padded), NamedSharding(mesh, P("shards"))
            )
            # the closure holds `jitted`; find it by attribute
            jitted = None
            for cell in run.__closure__ or ():
                v = cell.cell_contents
                if hasattr(v, "lower") and callable(getattr(v, "lower")):
                    jitted = v
            if jitted is not None:
                hlo = (
                    jitted.lower(darr, shift, jnp.int32(n))
                    .compile()
                    .as_text()
                )
        except Exception as e:  # pragma: no cover
            hlo = ""
            print("hlo census failed:", type(e).__name__, e)

        census = _collective_census(hlo, ndev)
        # per-shard traffic: HLO shapes are per-participant already
        traffic = census["ppermute_bytes"] + census["allreduce_bytes"]
        t_coll = traffic / ICI_BW + census["n_collectives"] * T_LAUNCH
        t_coll_pess = traffic / ICI_BW_PESS + census["n_collectives"] * (
            10 * T_LAUNCH
        )
        eff = T_COMPRESS_S / (T_COMPRESS_S + t_coll) if ndev > 1 else 1.0
        eff_pess = (
            T_COMPRESS_S / (T_COMPRESS_S + t_coll_pess) if ndev > 1 else 1.0
        )
        results[str(ndev)] = {
            "virtual_wall_s": round(wall, 3),
            "collectives": census,
            "per_shard_collective_bytes": traffic,
            "t_compress_ms_per_shard": round(T_COMPRESS_S * 1e3, 2),
            "t_collective_ms": round(t_coll * 1e3, 4),
            "projected_efficiency": round(eff, 4),
            "projected_efficiency_10x_pessimistic_ICI": round(eff_pess, 4),
        }
        print(ndev, results[str(ndev)], flush=True)

    artifact = {
        "method": (
            "per-shard compute measured on the real v5e single-chip "
            "(tools/profile_v3_post.py: full v3 encode 39.6 ms / 1.05 MB); "
            "collective traffic counted from the compiled HLO of the "
            "sharded step at each ndev on the virtual CPU mesh (ppermute "
            "halo + psum combine shapes, per participant); efficiency "
            "projected as t_c/(t_c + traffic/BW + n*launch) with "
            "BW_ICI=45 GB/s, launch=2 us, plus a 10x-pessimistic "
            "sensitivity row.  Virtual-mesh wall-clocks are wiring "
            "sanity only: N virtual devices share 2 CPU cores, so they "
            "measure host contention, not device scaling (the r3/r4 "
            "artifact mistake)."
        ),
        "shard_len": SHARD,
        "ctx": CTX,
        "per_ndev": results,
    }
    with open("SCALING_r05.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote SCALING_r05.json")


if __name__ == "__main__":
    main()
