"""Safetensors reading/writing without torch.

A dependency-free reader (mmap + numpy) and writer covering what the
framework needs: multi-file collections indexed by key, dtype conversion,
prefix queries, tensor-group probing, and shard-aware save.

Feature reference: /root/reference/exllamav3/loader/safetensors.py
(SafetensorsCollection:185, has_tensor_group, VariantSafetensorsCollection:700)
and loader/safetensors_alt.py. The reference streams through a pinned-memory
C++ thread pool into CUDA; on TPU hosts the equivalent is mmap + device_put,
with XLA handling the H2D pipeline. A native C++ reader can be slotted in
later for cold-cache loads; mmap covers warm loads at memory bandwidth.
"""
from __future__ import annotations

import json
import mmap
import os
import struct
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled specially (numpy has no bf16)
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "U16": np.uint16,
    "U32": np.uint32,
    "U64": np.uint64,
    "BOOL": np.bool_,
    # fp8 read as raw bytes; decode with fp8_e4m3_to_f32 / fp8_e5m2_to_f32
    "F8_E4M3": np.uint8,
    "F8_E5M2": np.uint8,
}


def fp8_e4m3_to_f32(u8: np.ndarray) -> np.ndarray:
    """Decode float8 e4m3fn bytes (sign/4-bit exp bias 7/3-bit mantissa;
    no infinities, e=15&m=7 is NaN)."""
    u = u8.astype(np.uint32)
    s = (u >> 7) & 1
    e = (u >> 3) & 0xF
    m = u & 0x7
    sub = (m / 8.0) * 2.0 ** -6
    norm = (1.0 + m / 8.0) * np.exp2(e.astype(np.float64) - 7.0)
    val = np.where(e == 0, sub, norm)
    val = np.where((e == 15) & (m == 7), np.nan, val)
    return np.where(s == 1, -val, val).astype(np.float32)


_FP4_E2M1 = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0], dtype=np.float32)


def mxfp4_to_f32(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Decode MXFP4 (gpt-oss checkpoint layout): blocks (..., G, 16) uint8
    hold 32 e2m1 values per group (low nibble first), scales (..., G) uint8
    are e8m0 shared exponents (bias 127). Returns (..., G*32) f32."""
    lo = _FP4_E2M1[blocks & 0x0F]
    hi = _FP4_E2M1[blocks >> 4]
    vals = np.empty(blocks.shape[:-1] + (32,), dtype=np.float32)
    vals[..., 0::2] = lo
    vals[..., 1::2] = hi
    scale = np.exp2(scales.astype(np.float32) - 127.0)
    vals *= scale[..., None]
    return vals.reshape(blocks.shape[:-2] + (-1,))


def fp8_e5m2_to_f32(u8: np.ndarray) -> np.ndarray:
    u = u8.astype(np.uint32)
    s = (u >> 7) & 1
    e = (u >> 2) & 0x1F
    m = u & 0x3
    sub = (m / 4.0) * 2.0 ** -14
    norm = (1.0 + m / 4.0) * np.exp2(e.astype(np.float64) - 15.0)
    val = np.where(e == 0, sub, norm)
    val = np.where(e == 31, np.where(m == 0, np.inf, np.nan), val)
    return np.where(s == 1, -val, val).astype(np.float32)

_DTYPE_NAMES = {
    np.dtype(np.float64): "F64",
    np.dtype(np.float32): "F32",
    np.dtype(np.float16): "F16",
    np.dtype(np.int64): "I64",
    np.dtype(np.int32): "I32",
    np.dtype(np.int16): "I16",
    np.dtype(np.int8): "I8",
    np.dtype(np.uint8): "U8",
    np.dtype(np.uint16): "U16",
    np.dtype(np.uint32): "U32",
    np.dtype(np.bool_): "BOOL",
}


def bf16_to_f32(raw_u16: np.ndarray) -> np.ndarray:
    return (raw_u16.astype(np.uint32) << 16).view(np.float32)


def f32_to_bf16_u16(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even f32 -> bf16 bit pattern (uint16)."""
    u = x.astype(np.float32).view(np.uint32)
    rounding = ((u >> 16) & 1) + 0x7FFF
    return ((u + rounding) >> 16).astype(np.uint16)


@dataclass
class TensorInfo:
    file: str
    dtype_str: str
    shape: tuple
    start: int  # absolute byte offset in file
    end: int

    @property
    def nbytes(self) -> int:
        return self.end - self.start


class SafetensorsCollection:
    """Read-only view over all *.safetensors files in a directory."""

    def __init__(self, directory: str, load_method: str = "mmap"):
        self.directory = directory
        self.tensor_map: dict[str, TensorInfo] = {}
        self._mmaps: dict[str, mmap.mmap] = {}
        self._files: dict[str, object] = {}
        self.metadata: dict = {}
        files = sorted(
            f for f in os.listdir(directory) if f.endswith(".safetensors")
        ) if os.path.isdir(directory) else []
        for fn in files:
            self._index_file(os.path.join(directory, fn))

    def _index_file(self, path: str):
        with open(path, "rb") as f:
            (header_len,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(header_len))
        base = 8 + header_len
        for key, info in header.items():
            if key == "__metadata__":
                self.metadata.update(info)
                continue
            self.tensor_map[key] = TensorInfo(
                file=path,
                dtype_str=info["dtype"],
                shape=tuple(info["shape"]),
                start=base + info["data_offsets"][0],
                end=base + info["data_offsets"][1],
            )

    def _get_mmap(self, path: str) -> mmap.mmap:
        if path not in self._mmaps:
            f = open(path, "rb")
            self._files[path] = f
            self._mmaps[path] = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        return self._mmaps[path]

    def close(self):
        # returned arrays are zero-copy views into the mmaps; dropping our
        # references lets the GC unmap once the last view dies (calling
        # mmap.close() with live views raises BufferError)
        for m in self._mmaps.values():
            try:
                m.close()
            except BufferError:
                pass
        for f in self._files.values():
            f.close()
        self._mmaps.clear()
        self._files.clear()

    def keys(self):
        return self.tensor_map.keys()

    def has_tensor(self, key: str) -> bool:
        return key in self.tensor_map

    def has_tensor_group(self, key: str, subkeys: list) -> bool:
        """subkeys: list of str or list-of-str (alternatives), as in the
        reference's has_tensor_group (loader/safetensors.py)."""
        for sk in subkeys:
            alts = sk if isinstance(sk, (list, tuple)) else [sk]
            if not any(f"{key}.{a}" in self.tensor_map for a in alts):
                return False
        return True

    def list_prefix(self, prefix: str) -> list:
        p = prefix if prefix.endswith(".") else prefix + "."
        return [k for k in self.tensor_map if k.startswith(p) or k == prefix]

    def max_out_of(self, keys: list) -> str | None:
        present = [k for k in keys if k in self.tensor_map]
        return present[0] if present else None

    def get_shape(self, key: str) -> tuple:
        return self.tensor_map[key].shape

    def get_dtype_str(self, key: str) -> str:
        return self.tensor_map[key].dtype_str

    def get_tensor(
        self,
        key: str,
        optional: bool = False,
        out_dtype=None,
        allow_bf16: bool = False,
    ) -> np.ndarray | None:
        """Load a tensor as numpy. BF16 is widened to f32 unless allow_bf16,
        in which case the raw uint16 bit pattern is returned."""
        info = self.tensor_map.get(key)
        if info is None:
            if optional:
                return None
            raise KeyError(f"tensor not found: {key}")
        mm = self._get_mmap(info.file)
        raw = np.frombuffer(mm, dtype=np.uint8, count=info.nbytes, offset=info.start)
        if info.dtype_str == "BF16":
            u16 = raw.view(np.uint16).reshape(info.shape)
            arr = u16 if allow_bf16 else bf16_to_f32(u16)
        else:
            npdt = _DTYPES.get(info.dtype_str)
            if npdt is None:
                raise ValueError(f"unsupported dtype {info.dtype_str} for {key}")
            arr = raw.view(npdt).reshape(info.shape)
        if out_dtype is not None and arr.dtype != out_dtype:
            arr = arr.astype(out_dtype)
        return arr


class VariantSafetensorsCollection:
    """Overlay collection: per-glob overrides on top of a base collection
    (reference loader/safetensors.py:700). Used for tensor-override YAML."""

    def __init__(self, base: SafetensorsCollection):
        self.base = base
        self.overlays: list[tuple[str, SafetensorsCollection]] = []

    def add_overlay(self, pattern: str, stc: SafetensorsCollection):
        self.overlays.append((pattern, stc))

    def _resolve(self, key: str) -> SafetensorsCollection:
        import fnmatch

        for pattern, stc in reversed(self.overlays):
            if fnmatch.fnmatch(key, pattern) and stc.has_tensor(key):
                return stc
        return self.base

    def has_tensor(self, key: str) -> bool:
        return self._resolve(key).has_tensor(key)

    def has_tensor_group(self, key: str, subkeys: list) -> bool:
        for sk in subkeys:
            alts = sk if isinstance(sk, (list, tuple)) else [sk]
            if not any(self.has_tensor(f"{key}.{a}") for a in alts):
                return False
        return True

    def get_tensor(self, key: str, **kwargs):
        return self._resolve(key).get_tensor(key, **kwargs)

    def list_prefix(self, prefix: str) -> list:
        keys = set(self.base.list_prefix(prefix))
        for _, stc in self.overlays:
            keys |= set(stc.list_prefix(prefix))
        return sorted(keys)

    def keys(self):
        keys = set(self.base.keys())
        for _, stc in self.overlays:
            keys |= set(stc.keys())
        return keys

    def get_shape(self, key):
        return self._resolve(key).get_shape(key)

    def get_dtype_str(self, key):
        return self._resolve(key).get_dtype_str(key)

    def close(self):
        self.base.close()
        for _, stc in self.overlays:
            stc.close()


def save_file(tensors: dict, path: str, metadata: dict | None = None, bf16_keys=()):
    """Write a single .safetensors file from numpy arrays.

    Arrays in bf16_keys (or with a `_bf16` marker dtype of uint16 + entry in
    bf16_keys) are written as BF16 from their uint16 bit patterns.
    """
    header = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    offset = 0
    blobs = []
    for key, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if key in bf16_keys:
            assert arr.dtype == np.uint16
            dt = "BF16"
        else:
            dt = _DTYPE_NAMES.get(arr.dtype)
            if dt is None:
                raise ValueError(f"unsupported dtype {arr.dtype} for {key}")
        nb = arr.nbytes
        header[key] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nb],
        }
        blobs.append(arr.tobytes())
        offset += nb
    hjson = json.dumps(header, separators=(",", ":")).encode()
    pad = (-(8 + len(hjson))) % 8
    hjson += b" " * pad
    # atomic: a reader (e.g. conversion mid-module resume) must never see a
    # truncated file if the writer is killed mid-write
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)
    os.replace(tmp, path)
