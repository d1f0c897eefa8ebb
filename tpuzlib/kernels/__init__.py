"""Device (TPU) and vectorized-host compute kernels for tpuzlib.

Importing this package enables the persistent XLA compilation cache:
every kernel module lives here, and tunnel compiles cost minutes
(utils/jaxcache.py), so no device kernel should ever compile uncached.
"""

try:  # pragma: no cover - jax is a hard dependency in practice
    from ..utils.jaxcache import enable_compile_cache as _ecc

    _ecc()
except Exception:
    pass
