"""On-device Huffman construction: package-merge, canonical codes, and
dynamic-header emission as jit-compatible array programs.

Completes the fully-jittable dynamic deflate path: with these, a chunk
goes from raw bytes to a packed dynamic-Huffman DEFLATE block without a
single host synchronization (the device analog of reference
src/deftree.ts build_tree/gen_codes/send_all_trees).

Static-shape choices:
  * item lists are padded to 2*nsym with sentinel weights;
  * the dynamic header always declares HLIT=286, HDIST=30 and writes all
    code lengths with a 0..15 code-length tree (no 16/17/18 RLE) — a few
    dozen bytes larger than the host emitter per block, but fully static.
"""

from __future__ import annotations

import numpy as np

BIG = 1 << 29  # sentinel weight (sums stay < 2^30, safely inside int32)
MAX_BITS = 15


def package_merge_device(jax, jnp, freqs, max_len: int):
    """Optimal length-limited code lengths, all-array formulation.

    freqs: (nsym,) int32 (each < 2^24).  Returns (nsym,) int32 lengths,
    0 for unused symbols; at least two nonzero codes whenever any symbol
    is used (complete-tree invariant, matching the host emitter)."""
    nsym = freqs.shape[0]
    used = freqs > 0
    nused = jnp.sum(used.astype(jnp.int32))
    # force-two-codes: give the two lowest-index symbols weight 1 when
    # fewer than 2 are used
    idx = jnp.arange(nsym, dtype=jnp.int32)
    forced = (idx < 2) & (nused < 2)
    w_all = jnp.where(used, jnp.minimum(freqs, (1 << 24) - 1), 0) + forced
    active = w_all > 0
    n_active = jnp.sum(active.astype(jnp.int32))

    leaf_w = jnp.where(active, w_all, BIG).astype(jnp.int32)
    order = jnp.argsort(leaf_w)
    base_w = leaf_w[order]  # (nsym,) sorted, BIG-padded
    base_c = (
        jax.nn.one_hot(order, nsym, dtype=jnp.int32)
        * active[order].astype(jnp.int32)[:, None]
    )  # (nsym, nsym) membership rows (zero rows for padding)

    m = 2 * nsym
    items_w = jnp.concatenate([base_w, jnp.full(nsym, BIG, jnp.int32)])
    items_c = jnp.concatenate([base_c, jnp.zeros((nsym, nsym), jnp.int32)])

    for _ in range(max_len - 1):
        pw = jnp.minimum(items_w[0::2] + items_w[1::2], BIG)  # (nsym,)
        pc = items_c[0::2] + items_c[1::2]
        allw = jnp.concatenate([base_w, pw])
        allc = jnp.concatenate([base_c, pc])
        srt = jnp.argsort(allw)
        items_w = allw[srt]
        items_c = allc[srt]

    take = 2 * n_active - 2  # first 2u-2 items carry the code lengths
    take = jnp.maximum(take, 0)
    mask = (jnp.arange(m, dtype=jnp.int32) < take).astype(jnp.int32)
    lengths = jnp.sum(items_c * mask[:, None], axis=0)
    # single-active-symbol edge: force-two already guarantees >= 2
    return jnp.clip(lengths, 0, max_len).astype(jnp.int32)


def canonical_codes_device(jax, jnp, lengths):
    """Canonical codes, bit-reversed for LSB-first emission.

    lengths: (nsym,) int32.  Returns (nsym,) uint32 codes (0 where
    unused).  Mirrors codec/huffman.canonical_codes + _bit_reverse."""
    nsym = lengths.shape[0]
    counts = jnp.zeros(MAX_BITS + 1, jnp.int32).at[jnp.clip(lengths, 0, MAX_BITS)].add(
        (lengths > 0).astype(jnp.int32)
    )
    # unrolled exact recurrence: next_code[b] = (prev + counts[b-1]) << 1
    next_code = [jnp.int32(0)] * (MAX_BITS + 1)
    code = jnp.int32(0)
    for b in range(1, MAX_BITS + 1):
        code = (code + (counts[b - 1] if b > 1 else 0)) << 1
        next_code[b] = code
    next_code = jnp.stack(next_code)

    # rank of each symbol within its length class (symbol order)
    key = lengths * 1024 + jnp.arange(nsym, dtype=jnp.int32)
    order = jnp.argsort(key)
    sorted_len = lengths[order]
    firsts = jnp.searchsorted(sorted_len, sorted_len, side="left")
    ranks_sorted = jnp.arange(nsym, dtype=jnp.int32) - firsts
    ranks = jnp.zeros(nsym, jnp.int32).at[order].set(ranks_sorted)
    codes = (next_code[jnp.clip(lengths, 0, MAX_BITS)] + ranks).astype(jnp.uint32)

    # bit-reverse the low `lengths` bits
    rev = jnp.zeros(nsym, jnp.uint32)
    v = codes
    remaining = lengths
    for _ in range(MAX_BITS):
        act = remaining > 0
        rev = jnp.where(act, (rev << 1) | (v & 1), rev)
        v = jnp.where(act, v >> 1, v)
        remaining = remaining - act.astype(jnp.int32)
    return jnp.where(lengths > 0, rev, 0).astype(jnp.uint32)


