"""Device (TPU) and vectorized-host compute kernels for tpuzlib."""
