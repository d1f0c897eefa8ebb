"""Device (TPU) inflate: two-pass parallel decode as jit kernels.

Pass 1 (per block segment): decode a candidate token at EVERY bit
position with three windowed u32 gathers against the block's flat LUTs
(the jnp mirror of codec/tokenize.decode_positions), then extract the
true symbol path by pointer doubling — all O(n)-per-position work stays
on device; the host only parses block headers (tiny, serial) and reads
back one exit scalar per segment.

Pass 2: masked token tape -> bytes by scattering token starts, cummax
token-id propagation, mod-dist source pointers and pointer-doubling
resolution to literal roots (ACEAPEX-style; see PAPERS.md).

Capability parity: device analog of reference src/infcodes.ts
inflate_fast + src/infblocks.ts window copier.
"""

from __future__ import annotations

import functools

import numpy as np

from ..codec.tables import WINDOW_SIZE


def _jnp():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _build_w32(jnp, data):
    n = data.shape[0]
    padded = jnp.concatenate([data, jnp.zeros(8, dtype=jnp.uint8)]).astype(jnp.uint32)
    w = padded[:n]
    w = w | (padded[1 : 1 + n] << jnp.uint32(8))
    w = w | (padded[2 : 2 + n] << jnp.uint32(16))
    w = w | (padded[3 : 3 + n] << jnp.uint32(24))
    return w


@functools.lru_cache()
def make_decode_segment(seg_bits: int):
    """Jitted segment decoder.

    decode(w32 u32[nbytes], start_bit i32, avail_bits i32,
           lut_lit u32[32768], lut_dist u32[32768])
      -> (litlen i32[m], dist i32[m], on_path bool[m],
          exit_code i32, next_bit i32)
    exit_code: 0=need more input, 2=EOB consumed, 3=error; when the
    segment ends mid-block the host simply calls again at next_bit.
    """
    jax, jnp = _jnp()
    m = seg_bits

    def window_at(w32, bitpos):
        return w32[jnp.clip(bitpos >> 3, 0, w32.shape[0] - 1)] >> (
            (bitpos & 7).astype(jnp.uint32)
        )

    @jax.jit
    def decode(w32, start_bit, avail_bits, lut_lit, lut_dist):
        pos = start_bit + jnp.arange(m, dtype=jnp.int32)
        w = window_at(w32, pos)
        ent = lut_lit[(w & jnp.uint32(0x7FFF)).astype(jnp.int32)]
        nb = ((ent >> jnp.uint32(15)) & jnp.uint32(0xF)).astype(jnp.int32)
        eb = ((ent >> jnp.uint32(19)) & jnp.uint32(0xF)).astype(jnp.int32)
        base = (ent & jnp.uint32(0x7FFF)).astype(jnp.int32)
        extra = (
            (w >> nb.astype(jnp.uint32))
            & ((jnp.uint32(1) << eb.astype(jnp.uint32)) - jnp.uint32(1))
        ).astype(jnp.int32)
        val = base + extra
        jump1 = nb + eb
        is_len = (ent & jnp.uint32(1 << 23)) != 0
        is_eob = (ent & jnp.uint32(1 << 24)) != 0
        inval_l = (ent >> jnp.uint32(31)) != 0

        w2 = window_at(w32, pos + jump1)
        dent = lut_dist[(w2 & jnp.uint32(0x7FFF)).astype(jnp.int32)]
        dnb = ((dent >> jnp.uint32(15)) & jnp.uint32(0xF)).astype(jnp.int32)
        deb = ((dent >> jnp.uint32(19)) & jnp.uint32(0xF)).astype(jnp.int32)
        dbase = (dent & jnp.uint32(0x7FFF)).astype(jnp.int32)
        w3 = window_at(w32, pos + jump1 + dnb)
        dextra = (w3 & ((jnp.uint32(1) << deb.astype(jnp.uint32)) - jnp.uint32(1))).astype(
            jnp.int32
        )
        dval = dbase + dextra
        inval_d = (dent >> jnp.uint32(31)) != 0

        jump = jnp.where(is_len, jump1 + dnb + deb, jump1)
        dist = jnp.where(is_len, dval, 0)
        bad = inval_l | (is_len & inval_d)

        SENT_OUT, SENT_EOB, SENT_ERR = m, m + 1, m + 2
        tgt = jnp.arange(m, dtype=jnp.int32) + jump
        consumable = (pos + jump) <= avail_bits
        nxt = jnp.where(consumable, jnp.minimum(tgt, SENT_OUT), SENT_OUT)
        nxt = jnp.where(bad, SENT_ERR, nxt)
        nxt = jnp.where(is_eob & ~bad & consumable, SENT_EOB, nxt)

        J = jnp.concatenate(
            [nxt, jnp.array([SENT_OUT, SENT_EOB, SENT_ERR], jnp.int32)]
        )
        reach = jnp.zeros(m + 3, dtype=jnp.int32).at[0].set(1)
        rounds = max(1, int(np.ceil(np.log2(m + 1))))

        def dbl(_, state):
            reach, Jk = state
            return reach.at[Jk].max(reach), Jk[Jk]

        reach, _ = jax.lax.fori_loop(0, rounds, dbl, (reach, J))
        on_path = reach[:m].astype(bool)

        # last on-path position and its classification
        idxs = jnp.arange(m, dtype=jnp.int32)
        p_last = jnp.max(jnp.where(on_path, idxs, -1))
        sent = nxt[p_last]
        err = sent == SENT_ERR
        eob = sent == SENT_EOB
        # a token that crossed the segment end while within input is
        # consumed; otherwise resume AT p_last
        crossed = (
            (sent == SENT_OUT)
            & consumable[p_last]
            & ~bad[p_last]
            & ~is_eob[p_last]
        )
        exit_code = jnp.where(err, 3, jnp.where(eob, 2, 0))
        next_bit = jnp.where(
            eob | crossed, pos[p_last] + jump[p_last], pos[p_last]
        )
        # the terminal position's token is only a data token when crossed
        emit = on_path & ((idxs != p_last) | crossed)
        litlen_tok = jnp.where(is_len, val, jnp.where(is_eob, 0, val))
        return (
            jnp.where(emit, litlen_tok, 0),
            jnp.where(emit, dist, 0),
            emit,
            exit_code,
            next_bit,
        )

    return decode


@functools.lru_cache()
def make_expand(n_tokens: int, out_cap: int):
    """Jitted masked-tape expansion against a 32 KiB window.

    expand(is_token bool[n], litlen i32[n], dist i32[n], window u8[32768],
           window_valid i32)
      -> (out u8[out_cap], total_out i32)
    """
    jax, jnp = _jnp()
    W = WINDOW_SIZE

    @jax.jit
    def expand(is_token, litlen, dist, window, window_valid):
        is_copy = is_token & (dist > 0)
        out_len = jnp.where(is_token, jnp.where(is_copy, litlen, 1), 0)
        starts = jnp.cumsum(out_len) - out_len
        total = jnp.sum(out_len)

        # propagate token id to every output byte
        tid_seed = jnp.full(out_cap, -1, jnp.int32)
        scatter_idx = jnp.where(is_token, jnp.minimum(starts, out_cap - 1), out_cap - 1)
        tid_seed = tid_seed.at[scatter_idx].max(
            jnp.where(is_token, jnp.arange(n_tokens, dtype=jnp.int32), -1)
        )
        tid = jax.lax.cummax(tid_seed)
        tid = jnp.clip(tid, 0, n_tokens - 1)

        i = jnp.arange(out_cap, dtype=jnp.int32)
        start_b = starts[tid]
        d = dist[tid]
        j = i - start_b
        is_copy_b = (d > 0) & (i < total)
        src = start_b - d + jnp.where(d > 0, j % jnp.maximum(d, 1), 0)

        # extended space: [0, W) window, [W, W+out_cap) output
        ptr = jnp.arange(W + out_cap, dtype=jnp.int32)
        ptr = ptr.at[W:].set(jnp.where(is_copy_b, src + W, ptr[W:]))
        vals = jnp.concatenate(
            [window, jnp.where(is_copy_b, 0, litlen[tid]).astype(jnp.uint8)]
        )
        rounds = max(1, int(np.ceil(np.log2(W + out_cap))))

        def dbl(_, p):
            return p[p]

        ptr = jax.lax.fori_loop(0, rounds, dbl, ptr)
        out = vals[ptr[W:]]
        return out, total

    return expand


@functools.lru_cache()
def _make_window_update(out_cap: int):
    jax, jnp = _jnp()
    W = WINDOW_SIZE

    @jax.jit
    def update(window, out, total):
        buf = jnp.concatenate([window, out])
        return jax.lax.dynamic_slice(buf, (total,), (W,))

    return update


class DeviceInflater:
    """Full-stream raw-DEFLATE decoder with all O(n) work on device.

    Host does block-header parsing (serial, tiny) and per-segment exit
    decisions; LUT gathers, path extraction and LZ expansion run as jit
    kernels.  Use for throughput paths; the host engine remains the
    byte-granular streaming implementation.
    """

    SEG_BITS = 1 << 18
    OUT_CAP = 1 << 21

    def __init__(self, dictionary: np.ndarray | None = None):
        jax, jnp = _jnp()
        self.jnp = jnp
        self.window = jnp.zeros(WINDOW_SIZE, dtype=jnp.uint8)
        if dictionary is not None and len(dictionary):
            d = dictionary[-(WINDOW_SIZE - 1):]  # 32K-1 clip (inflate.ts:489)
            w = np.zeros(WINDOW_SIZE, dtype=np.uint8)
            w[WINDOW_SIZE - len(d) :] = d
            self.window = jnp.asarray(w)
        self.pieces = []  # (device array, total scalar)

    def run(self, data: np.ndarray, start_bit: int = 0) -> tuple[int, int]:
        """Decode all blocks; returns bits consumed.

        Raises tokenize.DataError on malformed input."""
        from ..codec.tokenize import BitReader, DataError, parse_dynamic_header
        from ..codec.huffman import fixed_dist_lut, fixed_litlen_lut

        jnp = self.jnp
        w32 = _build_w32(jnp, jnp.asarray(data))
        avail_bits = len(data) * 8
        decode = make_decode_segment(self.SEG_BITS)
        expand = make_expand(self.SEG_BITS, self.OUT_CAP)
        upd = _make_window_update(self.OUT_CAP)

        bit_pos = start_bit
        last = False
        while True:
            reader = BitReader(data, bit_pos, avail_bits)
            last = bool(reader.bits(1))
            btype = reader.bits(2)
            if btype == 0:
                reader.align_byte()
                length = reader.bits(16)
                nlen = reader.bits(16)
                if length != (~nlen & 0xFFFF):
                    raise DataError("invalid stored block lengths")
                byte_pos = reader.pos >> 3
                chunk = jnp.asarray(data[byte_pos : byte_pos + length])
                self.pieces.append((chunk, length))
                cat = jnp.concatenate([self.window, chunk])[-WINDOW_SIZE:]
                self.window = cat
                bit_pos = (byte_pos + length) * 8
            elif btype in (1, 2):
                if btype == 1:
                    lut_lit, lut_dist = fixed_litlen_lut(), fixed_dist_lut()
                else:
                    lut_lit, lut_dist = parse_dynamic_header(reader)
                lit_d = jnp.asarray(lut_lit)
                dist_d = jnp.asarray(lut_dist)
                bit_pos = reader.pos
                small = None
                while True:
                    litlen, dist, emit, exit_code, next_bit = decode(
                        w32, np.int32(bit_pos), np.int32(avail_bits), lit_d, dist_d
                    )
                    out, total = expand(emit, litlen, dist, self.window, np.int32(0))
                    t = int(total)
                    if t > self.OUT_CAP:
                        # ultra-compressible segment: redo this stretch with
                        # a smaller probe so the output cap holds
                        if small is None:
                            small = (
                                make_decode_segment(self.SEG_BITS >> 5),
                                make_expand(self.SEG_BITS >> 5, self.OUT_CAP),
                            )
                        litlen, dist, emit, exit_code, next_bit = small[0](
                            w32, np.int32(bit_pos), np.int32(avail_bits), lit_d, dist_d
                        )
                        out, total = small[1](
                            emit, litlen, dist, self.window, np.int32(0)
                        )
                        t = int(total)
                        if t > self.OUT_CAP:
                            raise DataError("device segment output overflow")
                    self.pieces.append((out, t))
                    self.window = upd(self.window, out, total)
                    code = int(exit_code)
                    bit_pos = int(next_bit)
                    if code == 3:
                        raise DataError("invalid code in block")
                    if code == 2:
                        break
                    if code == 0 and bit_pos >= avail_bits:
                        raise DataError("unexpected end of stream")
            else:
                raise DataError("invalid block type")
            if last:
                return bit_pos

    def output(self) -> np.ndarray:
        """Concatenate pieces (single host pull)."""
        jnp = self.jnp
        outs = [np.asarray(p)[:t] for p, t in self.pieces]
        return np.concatenate(outs) if outs else np.empty(0, np.uint8)


def inflate_device_raw(
    data: np.ndarray, dictionary: np.ndarray | None = None
) -> np.ndarray:
    """One-shot raw-DEFLATE decode on device; returns bytes on host."""
    inf = DeviceInflater(dictionary)
    inf.run(np.asarray(data))
    return inf.output()
