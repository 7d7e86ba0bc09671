"""Native (C++) host components.

The reference implements its host hot loops in C++ (-Ofast, OpenMP); the
TPU rebuild keeps the device compute in JAX/Pallas and uses C++ for the
sequential host loops that numpy cannot vectorize well: the syncmer
scanner (per-base state machine) here, with the XOR peeling planned next.

The shared library is compiled on first use with g++ -O3 into a cache
directory and loaded via ctypes; without a working compiler everything
falls back to the numpy implementations transparently.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _cache_dir() -> str:
    d = os.environ.get(
        "TAXOR_TPU_NATIVE_CACHE",
        os.path.expanduser("~/.cache/taxor_tpu_native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _compile() -> str | None:
    src = os.path.join(os.path.dirname(__file__), "syncmer_scan.cpp")
    with open(src, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"libtaxor_native_{digest}.so")
    if os.path.exists(out):
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-std=c++17", src, "-o", out + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(out + ".tmp", out)
        return out
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.syncmer_scan.restype = ctypes.c_long
            lib.syncmer_scan.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ]
            lib.pack_reads_2bit.restype = None
            lib.pack_reads_2bit.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
                ctypes.c_long, ctypes.c_void_p,
            ]
            lib.syncmer_scan_batch.restype = None
            lib.syncmer_scan_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
                ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB
