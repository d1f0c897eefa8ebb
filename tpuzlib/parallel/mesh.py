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
