"""Public API layer (parity with reference src/sd-zlib.ts re-exports)."""
