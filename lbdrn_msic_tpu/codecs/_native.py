"""ctypes loader for the native codec library.

Builds `liblbdrn_native.so` from the shipped sources on first use (the
toolchain is part of the runtime image); falls back gracefully — callers
check `available()` and use the pure-Python mirrors when it is not.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO = os.path.join(_DIR, "liblbdrn_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    """Return the ctypes library or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        srcs = [
            os.path.join(_DIR, f)
            for f in ("fpzcodec.cc", "lpc.cc", "tiffcodecs.cc", "rangecoder.h")
        ]
        stale = not os.path.exists(_SO) or any(
            os.path.getmtime(s) > os.path.getmtime(_SO) for s in srcs
        )
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        # newer symbols: a stale .so copied without mtimes can lack them;
        # force one rebuild (BEFORE declaring any argtypes on the handle),
        # then degrade to fpz/LPC-only rather than break every native
        # caller (io/tiff.py guards with getattr)
        if (
            not hasattr(lib, "lbdrn_lzw_decode")
            or not hasattr(lib, "lpc_compress2")
            or not hasattr(lib, "lbdrn_assemble_residual")
        ) and _build():
            try:
                lib = ctypes.CDLL(_SO)
            except OSError:
                return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.lbdrn_free.argtypes = [ctypes.c_void_p]
        lib.lfpz_compress.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_uint64, ctypes.c_int,
            ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.lfpz_peek.argtypes = [
            u8p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int),
        ]
        lib.lfpz_decompress.argtypes = [
            u8p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
        ]
        lib.lpc_compress.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.lpc_peek.argtypes = [
            u8p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.lpc_decompress.argtypes = [
            u8p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint16), ctypes.c_uint64,
        ]
        # v2 (row-chunked) entry points — stale .so guard above rebuilt if
        # needed, but degrade gracefully if the rebuild failed
        if hasattr(lib, "lpc_compress2"):
            lib.lpc_compress2.argtypes = [
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.lpc_peek2.argtypes = [
                u8p, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.lpc_decompress_chunk.argtypes = [
                u8p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_uint64,
            ]
        for name in ("lbdrn_lzw_decode", "lbdrn_packbits_decode"):
            fn = getattr(lib, name, None)
            if fn is not None:
                fn.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
                fn.restype = ctypes.c_int64
        fn = getattr(lib, "lbdrn_assemble_residual", None)
        if fn is not None:
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_uint64,
            ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None
