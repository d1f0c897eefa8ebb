"""Build + load the native library (ctypes).

The .so is compiled on first use with g++ -O3 and cached next to the
source; set TPUZLIB_NO_NATIVE=1 to force the pure-numpy paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tpuzlib_native.cc")
_BUILD_DIR = os.path.join(_HERE, "_build")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, "libtpuzlib_%s.so" % tag)
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = so_path + ".tmp.%d" % os.getpid()
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", "-o", tmp, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except Exception:
        return None


def get_lib():
    """Returns the loaded ctypes library or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("TPUZLIB_NO_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        c_i64 = ctypes.c_int64
        c_p8 = ctypes.POINTER(ctypes.c_uint8)
        c_p32 = ctypes.POINTER(ctypes.c_int32)
        c_pi64 = ctypes.POINTER(ctypes.c_int64)
        lib.tz_inflate_raw.restype = ctypes.c_int
        lib.tz_inflate_raw.argtypes = [
            c_p8, c_i64, c_i64, c_p8, c_i64, c_i64, c_pi64, c_pi64,
        ]
        lib.tz_deflate_tokenize.restype = c_i64
        lib.tz_deflate_tokenize.argtypes = [
            c_p8, c_i64, c_i64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            c_p32, c_p32,
            c_p32, c_p32, c_pi64, c_i64,
        ]
        lib.tz_state_new.restype = ctypes.c_void_p
        lib.tz_state_new.argtypes = []
        lib.tz_state_free.restype = None
        lib.tz_state_free.argtypes = [ctypes.c_void_p]
        lib.tz_inflate_stream.restype = ctypes.c_int
        lib.tz_inflate_stream.argtypes = [
            ctypes.c_void_p, c_p8, c_i64, c_i64, c_p8, c_i64, c_i64,
            c_pi64, c_pi64,
        ]
        lib.tz_inflate_tokenize.restype = c_i64
        lib.tz_inflate_tokenize.argtypes = [
            c_p8, c_i64, c_i64, c_i64, c_p32, c_p32, c_i64,
            c_pi64, c_p32, c_p32,
        ]
        lib.tz_expand_tokens.restype = c_i64
        lib.tz_expand_tokens.argtypes = [
            c_p32, c_p32, c_i64, c_p8, c_i64, c_i64,
        ]
        lib.tz_find_headers.restype = c_i64
        lib.tz_find_headers.argtypes = [
            c_p8, c_i64, c_i64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), c_i64,
        ]
        lib.tz_tokenize_midblock.restype = c_i64
        lib.tz_tokenize_midblock.argtypes = [
            c_p8, c_i64, c_i64,
            c_p32, ctypes.c_int32, c_p32, ctypes.c_int32,
            c_p32, c_p32, c_i64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tz_adler32.restype = ctypes.c_uint32
        lib.tz_adler32.argtypes = [c_p8, c_i64, ctypes.c_uint32]
        lib.tz_crc32.restype = ctypes.c_uint32
        lib.tz_crc32.argtypes = [c_p8, c_i64, ctypes.c_uint32]
        lib.tz_emit_chunk.restype = c_i64
        lib.tz_emit_chunk.argtypes = [
            c_p32, c_p32, c_i64,
            c_p32, c_p32,
            c_pi64, c_i64, c_i64,
            c_p8, c_i64,
            ctypes.c_int, ctypes.c_int,
            c_p8, c_i64,
        ]
        lib.tz_emit_tokens.restype = c_i64
        lib.tz_emit_tokens.argtypes = [
            c_p32, c_p32, c_i64,
            c_p32, ctypes.POINTER(ctypes.c_uint32),
            c_p32, ctypes.POINTER(ctypes.c_uint32),
            c_p8, c_i64, c_i64,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None
