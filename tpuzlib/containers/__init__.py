"""Container framing: raw / zlib (RFC 1950) / gzip (RFC 1952).

Header+trailer parsing and emission.  Parity with reference
src/inflate.ts (33-state header/trailer FSM) and src/sd-deflate.ts:98-165
(header/trailer writers) — redesigned as small byte-level parsers that
retry on accumulated input rather than a bit-level state machine.
"""

from .inflate_container import ContainerInflater
from .headers import (
    make_gzip_header,
    make_gzip_trailer,
    make_zlib_header,
    make_zlib_trailer,
)

__all__ = [
    "ContainerInflater",
    "make_gzip_header",
    "make_gzip_trailer",
    "make_zlib_header",
    "make_zlib_trailer",
]
