"""Burn-key proof-of-work grinding (reference tests/main.py:47-56).

Uses the native C++ grinder (native/pow_grinder.cpp, auto-built with g++ on
first use) when available, with a pure-Python fallback."""

from __future__ import annotations

import ctypes
import os
import subprocess

from ..field.ref import FR_MOD
from ..hash.keccak_ref import keccak256

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpowgrind.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "pow_grinder.cpp")


def _load_native():
    if not os.path.exists(_SO_PATH) or (
        os.path.exists(_SRC_PATH)
        and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
    ):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.grind_burn_key.restype = ctypes.c_longlong
    lib.grind_burn_key.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_longlong,
    ]
    lib.pow_digest.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    return lib


_LIB = None
_LIB_TRIED = False


def _lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _load_native()
        _LIB_TRIED = True
    return _LIB


def pow_digest(burn_key: int, reveal: int, extra: int) -> bytes:
    msg = (
        burn_key.to_bytes(32, "big")
        + reveal.to_bytes(32, "big")
        + extra.to_bytes(32, "big")
        + b"EIP-7503"
    )
    return keccak256(msg)


def find_burn_key(
    reveal: int,
    extra: int,
    min_zero_bytes: int = 2,
    start_key: int | None = None,
    max_iters: int = 1 << 40,
) -> int:
    """Grind burnKey until keccak(key||reveal||extra||'EIP-7503') starts with
    min_zero_bytes zero bytes."""
    import secrets

    key = start_key if start_key is not None else secrets.randbelow(FR_MOD)
    lib = _lib()
    if lib is not None:
        buf = ctypes.create_string_buffer(key.to_bytes(32, "big"), 32)
        it = lib.grind_burn_key(
            buf,
            reveal.to_bytes(32, "big"),
            extra.to_bytes(32, "big"),
            min_zero_bytes,
            max_iters,
        )
        if it < 0:
            raise RuntimeError("PoW not found within max_iters")
        return int.from_bytes(buf.raw[:32], "big")
    # pure-python fallback
    for _ in range(max_iters):
        if pow_digest(key, reveal, extra)[:min_zero_bytes] == b"\x00" * min_zero_bytes:
            return key
        key += 1
    raise RuntimeError("PoW not found within max_iters")
