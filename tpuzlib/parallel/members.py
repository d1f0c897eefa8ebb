"""Concatenated-gzip-member sharding (BASELINE config 5).

The RFC 1952 member boundary is the codec's natural data-parallel seam
(SURVEY.md §2): members compress and decompress independently, outputs
gather in order, and the whole-corpus CRC comes from the members' trailer
CRCs via the associative GF(2) combine — no byte of payload is ever
re-read for verification.

This is the host/thread flavor; parallel/pipeline.py is the in-mesh
flavor of the same sharding.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..common import mergeBuffers, u8_view
from ..kernels.crc32 import crc32_combine


def compress_members(
    data,
    level: int = 6,
    member_size: int = 4 << 20,
    max_workers: int | None = None,
):
    """Compress into concatenated gzip members (one per shard).

    Returns (wire_bytes, member_index) where member_index[i] is the byte
    offset of member i in the output — the side-channel that makes
    decompression embarrassingly parallel."""
    from ..api.deflate_api import Deflater, DeflaterOptions

    view = u8_view(data)
    nshards = max(1, -(-len(view) // member_size))
    spans = [
        (i * member_size, min((i + 1) * member_size, len(view)))
        for i in range(nshards)
    ]

    def one(span):
        lo, hi = span
        d = Deflater(DeflaterOptions(format="gzip", level=level))
        bufs = d.append(view[lo:hi])
        bufs += d.finish()
        return mergeBuffers(bufs)

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        members = list(ex.map(one, spans))
    index = np.zeros(nshards, dtype=np.int64)
    off = 0
    for i, m in enumerate(members):
        index[i] = off
        off += len(m)
    return mergeBuffers(members), index


def _decode_member(view: np.ndarray, offset: int):
    """Decode one gzip member; returns (out, end_offset, stored_crc)."""
    from ..containers.inflate_container import ContainerInflater

    c = ContainerInflater(raw=False)
    out = c.push(view[offset:])
    if not c.is_complete:
        raise ValueError("truncated gzip member at offset %d" % offset)
    consumed = len(view) - offset - (len(c.header_buf) - c.trailer_len)
    return out, offset + consumed, c.stored_checksum


def decompress_members(
    data,
    index=None,
    max_workers: int | None = None,
    verify: bool = False,
):
    """Decompress concatenated gzip members; parallel when `index` given.

    Returns (output_bytes, combined_crc32).  combined_crc32 is the CRC of
    the WHOLE decompressed corpus, derived purely from the members'
    trailer CRCs + lengths via crc32_combine (the multi-host merge)."""
    view = u8_view(data)
    outs = []
    crcs = []
    if index is None:
        off = 0
        while off < len(view):
            out, off, crc = _decode_member(view, off)
            outs.append(out)
            crcs.append(crc)
    else:
        offsets = [int(o) for o in index]
        ends = offsets[1:] + [len(view)]

        def one(span):
            off, end = span
            out, _, crc = _decode_member(view[off:end], 0)
            return out, crc

        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            for out, crc in ex.map(one, zip(offsets, ends)):
                outs.append(out)
                crcs.append(crc)

    combined = 0
    for out, crc in zip(outs, crcs):
        combined = crc32_combine(combined, crc, len(out))
    result = mergeBuffers(outs)
    if verify:
        from ..api.checksums import crc32

        if crc32(result) != combined:
            raise ValueError("Data integrity check failed")
    return result, combined
