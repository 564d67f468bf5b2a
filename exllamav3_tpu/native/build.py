"""Build/load the native library via ctypes (no pybind11 in this image)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exl3_native.cpp")


def _build(so_path: str) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", so_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        return False


def get_lib():
    """Returns the loaded ctypes library or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so_path = os.path.join(os.path.dirname(_SRC), "exl3_native.so")
        if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(_SRC)
        ):
            if not _build(so_path):
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.stl_read_ranges.restype = ctypes.c_int
        lib.sam_new.restype = ctypes.c_void_p
        lib.sam_extend.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.sam_draft.restype = ctypes.c_int32
        lib.sam_draft.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_void_p]
        lib.sam_free.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "moe_ffn_int8"):
            lib.moe_ffn_int8.argtypes = (
                [ctypes.c_void_p] * 3          # x, topi, topv
                + [ctypes.c_void_p] * 9        # wg/sg/bg, wu/su/bu, wd/sd/bd
                + [ctypes.c_void_p]            # out
                + [ctypes.c_int] * 4           # T, k, h, inter
                + [ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int]
            )
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None
