"""Native (C++) runtime components, loaded via ctypes.

The shared library is compiled on first use with the toolchain's g++
(no pip-installable build backend needed); if compilation or loading
fails, every consumer falls back to the pure-Python implementation,
so the framework stays functional on toolchain-less machines.

Set FINITO_NO_NATIVE=1 to force the Python paths (used by tests to
compare both implementations).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastx_native.cpp")
_SO = os.path.join(_HERE, "libfinito_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _SO,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_SO)
    except (OSError, subprocess.TimeoutExpired):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (Python fallback).

    FINITO_NO_NATIVE is honored on EVERY call (not just the first), so
    tests can flip between implementations mid-process."""
    global _lib, _tried
    if os.environ.get("FINITO_NO_NATIVE"):
        return None
    if _lib is not None:
        return _lib
    if _tried:
        return _lib
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.ftx_parse.restype = ctypes.c_int
        lib.ftx_parse.argtypes = [u8p, i64, u8p, i64p, u8p, i64p, i64p]
        lib.ftx_bounds.restype = None
        lib.ftx_bounds.argtypes = [u8p, i64, i64p]
        lib.ftx_encode.restype = None
        lib.ftx_encode.argtypes = [u8p, i64, u8p]
        lib.ftx_revcomp_codes.restype = None
        lib.ftx_revcomp_codes.argtypes = [u8p, i64, u8p]
        _lib = lib
        return _lib


def parse_fastx_bytes(data: bytes):
    """Parse decompressed FASTA/FASTQ bytes natively.

    Returns (codes uint8, seq_ends int64, headers list[bytes]) or None if
    the native library is unavailable (caller falls back to Python).
    Raises ValueError on malformed input (same cases as the Python parser).
    """
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    n = buf.size
    bounds = np.zeros(3, dtype=np.int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)

    def p8(a):
        return a.ctypes.data_as(u8p)

    def p64(a):
        return a.ctypes.data_as(i64p)

    if n == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.int64), []
    lib.ftx_bounds(p8(buf), n, p64(bounds))
    max_rec, max_code, max_hdr = (int(x) for x in bounds)
    codes = np.empty(max_code, dtype=np.uint8)
    seq_ends = np.empty(max_rec, dtype=np.int64)
    hdr_bytes = np.empty(max_hdr, dtype=np.uint8)
    hdr_ends = np.empty(max_rec, dtype=np.int64)
    counts = np.zeros(3, dtype=np.int64)
    rc = lib.ftx_parse(
        p8(buf), n, p8(codes), p64(seq_ends), p8(hdr_bytes), p64(hdr_ends), p64(counts)
    )
    if rc != 0:
        msgs = {
            -1: "cannot detect FASTA/FASTQ (bad record start byte)",
            -2: "malformed FASTQ '+' line (multi-line FASTQ is not supported)",
            -3: "FASTQ quality length != sequence length",
            -4: "FASTA sequence data before first '>' header",
        }
        raise ValueError(f"native fastx parse failed: {msgs.get(rc, rc)}")
    n_rec, n_code, n_hdr = (int(x) for x in counts)
    codes = codes[:n_code].copy()
    seq_ends = seq_ends[:n_rec].copy()
    hdr_blob = hdr_bytes[:n_hdr].tobytes()
    hdr_ends = hdr_ends[:n_rec]
    headers = []
    prev = 0
    for e in hdr_ends:
        headers.append(hdr_blob[prev:int(e)])
        prev = int(e)
    return codes, seq_ends, headers
