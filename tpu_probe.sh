#!/bin/bash
timeout 50 python -u -c "import jax.numpy as jnp; print('TPU-ALIVE', int(jnp.arange(8).sum()))" 2>/dev/null | grep TPU-ALIVE
