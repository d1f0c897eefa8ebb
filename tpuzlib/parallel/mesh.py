"""Mesh construction helpers.

The codec's parallelism is one-dimensional data parallelism over
independent compressed units ("shards" axis) with nearest-neighbor halo
flow — the window context rides ICI via ppermute, checksums combine via
bit-planed psum (SURVEY.md §2 parallelism inventory)."""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int | None = None, platform: str | None = None):
    import jax
    from jax.sharding import Mesh

    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("shards",))


def make_multihost_mesh(platform: str | None = None):
    """Mesh over every chip in a multi-host slice.

    Calls jax.distributed.initialize() when launched under a multi-host
    runtime (JAX coordinator env vars present); shard placement follows
    process order so the in-order gather (pipeline.py) reproduces stream
    order across hosts — collectives ride ICI within a slice and DCN
    across hosts exactly as jax lays the mesh out."""
    import os

    import jax

    if (
        jax.process_count() == 1
        and os.environ.get("JAX_COORDINATOR_ADDRESS")
        and not jax.distributed.is_initialized()
    ):
        jax.distributed.initialize()
    return make_mesh(platform=platform)


def shard_map_compat(f, mesh, in_specs, out_specs):
    """shard_map across jax versions.

    jax 0.9 enables check_vma by default, which rejects pallas_call
    out_shapes (ShapeDtypeStruct has no vma) inside the mapped function;
    older versions spelled the flag check_rep.  The codec's shard
    residency is fully determined by in_specs/out_specs, so the varying
    -across-mesh check adds nothing here."""
    from jax import shard_map

    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            return shard_map(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw
            )
        except TypeError:
            continue
    raise RuntimeError("no compatible shard_map signature")
