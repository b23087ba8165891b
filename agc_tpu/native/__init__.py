"""Native (C++) fast paths, loaded via ctypes.

The shared library is built on demand from lz_native.cpp with g++; when no
toolchain is available the pure-Python implementations in agc_tpu.core.lz
are used instead (same token grammar, slower).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "lz_native.cpp")
_LIB = os.path.join(_DIR, "liblznative.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        cmd = [
            "g++",
            "-O3",
            "-std=c++17",
            "-shared",
            "-fPIC",
            "-march=native",
            _SRC,
            "-o",
            _LIB + ".tmp",
        ]
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0:
            # retry without -march=native
            cmd.remove("-march=native")
            res = subprocess.run(cmd, capture_output=True, timeout=120)
            if res.returncode != 0:
                return False
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:
        return False


def get_lib():
    """Return the loaded ctypes library or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.lz_create.restype = ctypes.c_void_p
        lib.lz_create.argtypes = [ctypes.c_uint32]
        lib.lz_destroy.argtypes = [ctypes.c_void_p]
        lib.lz_prepare.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
        lib.lz_assure_index.argtypes = [ctypes.c_void_p]
        lib.lz_encode.restype = ctypes.c_int64
        lib.lz_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_uint64,
            u8p,
            ctypes.c_uint64,
        ]
        lib.lz_estimate.restype = ctypes.c_uint64
        lib.lz_estimate.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_uint64,
        ]
        lib.lz_cost_vector.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_int,
            u32p,
        ]
        lib.fasta_preprocess.restype = ctypes.c_uint64
        lib.fasta_preprocess.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            u8p,
            u8p,
        ]
        for fn in (lib.lz_decode_v2, lib.lz_decode_v1):
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.c_uint64,
                ctypes.c_char_p,
                ctypes.c_uint64,
                ctypes.c_uint32,
                u8p,
                ctypes.c_uint64,
            ]
        _lib = lib
        return _lib
