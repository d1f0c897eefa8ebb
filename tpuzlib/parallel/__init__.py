"""Multi-chip sharding: mesh setup, sharded codec pipelines, halo
exchange, in-mesh checksum combines, ordered gather."""

from .mesh import make_mesh
from .pipeline import build_sharded_deflate, sharded_deflate

__all__ = ["make_mesh", "build_sharded_deflate", "sharded_deflate"]
