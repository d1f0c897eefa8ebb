"""DEFLATE codec core: tokenize (bitstream -> token tape) and expand
(token tape -> bytes), designed as vectorized two-pass algorithms that run
identically on numpy (host) and jax.numpy (device)."""
