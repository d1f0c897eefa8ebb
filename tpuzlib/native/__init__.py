"""Native (C++) runtime components: serial bitstream hot loops exposed
via ctypes, with graceful fallback to the pure-numpy paths."""

from .bindings import get_lib, native_available

__all__ = ["get_lib", "native_available"]
