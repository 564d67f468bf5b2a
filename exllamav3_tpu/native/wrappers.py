"""Python wrappers over the native C library (ctypes)."""
from __future__ import annotations

import ctypes

import numpy as np

from .build import get_lib


def native_viterbi_quantize_tiles(tiles: np.ndarray, K: int, cb: int = 0,
                                  threads: int = 0):
    """Multicore C++ Viterbi: tiles (T, 256) f32 -> (vals f32, codes uint16).
    Returns None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ..quant.quantize import _dec_table

    tiles = np.ascontiguousarray(tiles, dtype=np.float32)
    T = tiles.shape[0]
    dec = np.ascontiguousarray(_dec_table(cb), dtype=np.float32)
    codes = np.empty((T, 256), dtype=np.uint16)
    vals = np.empty((T, 256), dtype=np.float32)
    lib.viterbi_quantize_tiles(
        tiles.ctypes.data_as(ctypes.c_void_p),
        dec.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(T),
        ctypes.c_int(K),
        codes.ctypes.data_as(ctypes.c_void_p),
        vals.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(threads),
    )
    return vals, codes


class NativeSAM:
    """Suffix automaton backed by the C++ implementation."""

    def __init__(self):
        self._lib = get_lib()
        assert self._lib is not None
        self._h = self._lib.sam_new()
        self._n = 0

    def extend(self, token: int):
        self._lib.sam_extend(self._h, int(token))
        self._n += 1

    def draft(self, max_tokens: int, min_context: int = 2) -> list:
        out = np.empty(max_tokens, dtype=np.int32)
        n = self._lib.sam_draft(self._h, max_tokens, min_context,
                                out.ctypes.data_as(ctypes.c_void_p))
        return out[:n].tolist()

    def __del__(self):
        try:
            self._lib.sam_free(self._h)
        except Exception:
            pass


def make_sam():
    """Best available suffix automaton."""
    if get_lib() is not None:
        return NativeSAM()
    from ..generator.ngram import SuffixAutomaton

    return SuffixAutomaton()


def native_read_ranges(path: str, offsets, sizes, dst_arrays, threads: int = 0) -> bool:
    """Parallel pread of byte ranges into numpy buffers. False if unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    n = len(offsets)
    offs = np.asarray(offsets, dtype=np.uint64)
    szs = np.asarray(sizes, dtype=np.uint64)
    ptrs = (ctypes.c_void_p * n)(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in dst_arrays]
    )
    err = lib.stl_read_ranges(
        path.encode(), offs.ctypes.data_as(ctypes.c_void_p),
        szs.ctypes.data_as(ctypes.c_void_p), ptrs, ctypes.c_int(n),
        ctypes.c_int(threads),
    )
    return err == 0
