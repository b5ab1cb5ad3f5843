"""ctypes loader for the native BAM codec (builds on first use)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_bamcodec.so")
_SRC = os.path.join(_HERE, "bamcodec.cpp")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           _SRC, "-o", _SO, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The compiled codec, building it on demand; None if unavailable."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.vapor_bgzf_decompress.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.vapor_bgzf_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t)]
        lib.vapor_bam_query.restype = ctypes.c_void_p
        lib.vapor_bam_query.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int64]
        lib.vapor_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def bgzf_decompress(data: bytes) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    out_len = ctypes.c_size_t()
    ptr = lib.vapor_bgzf_decompress(data, len(data),
                                    ctypes.byref(out_len))
    if not ptr:
        return None
    try:
        return ctypes.string_at(ptr, out_len.value)
    finally:
        lib.vapor_free(ptr)


def bam_query(decompressed: bytes, records_start: int, ref_id: int,
              beg0: int, end0: int) -> Optional[str]:
    lib = load()
    if lib is None:
        return None
    ptr = lib.vapor_bam_query(decompressed, len(decompressed),
                              records_start, ref_id, beg0, end0)
    if not ptr:
        return None
    try:
        return ctypes.string_at(ptr).decode("ascii")
    finally:
        lib.vapor_free(ptr)
