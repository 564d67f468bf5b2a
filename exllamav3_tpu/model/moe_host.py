"""Host-offloaded MoE experts: CPU-resident int8 expert stacks + the FFN
callback the jitted step reaches through `jax.pure_callback`.

Feature reference: /root/reference/exllamav3/model/moe_cpu_host.py (the
persistent-worker CPU offload for experts that do not fit device memory) +
exllamav3_ext/cpu/moe_mul1.cpp (the AVX-512 trellis GEMV). TPU-native
re-design: instead of a spawned worker consuming a pinned-SHM job ring (a
CUDA-stream handshake that has no XLA analogue), the offloaded layer's
routed-expert compute is a host callback INSIDE the traced step —
`jax.pure_callback` gives XLA the device->host->device edge, and the device
keeps the router, shared experts and every attention/dense tensor. Host
experts are stored requantized to int8 with per-output-row scales (the same
representation the on-device serving ladder uses; the reference's worker
instead decodes the trellis per call) and the GEMV runs on the native
threadpool (native/exl3_native.cpp moe_ffn_int8), with a pure-numpy fallback
when the native lib is unavailable.

This is a CAPACITY mode, like the reference's: it trades per-layer host
round-trips for serving MoE models whose expert stacks exceed HBM. The
device-side HBM footprint of an offloaded BlockSparseMLP is just the router
(+ shared experts); host RAM holds E x (gate/up/down) int8.
"""
from __future__ import annotations

import ctypes
import threading

import numpy as np

_ACT_KINDS = {"silu": 0, "gelu": 1, "gelu_pytorch_tanh": 2, "relu2": 3,
              "silu_oai": 4}


def act_kind(activation: str) -> int | None:
    return _ACT_KINDS.get(activation)


class _HostLayer:
    __slots__ = ("wg", "sg", "bg", "wu", "su", "bu", "wd", "sd", "bd",
                 "act", "act_limit", "act_clamp", "h", "inter")

    def __init__(self, wg, sg, bg, wu, su, bu, wd, sd, bd,
                 act, act_limit, act_clamp):
        self.wg, self.sg, self.bg = wg, sg, bg
        self.wu, self.su, self.bu = wu, su, bu
        self.wd, self.sd, self.bd = wd, sd, bd
        self.act, self.act_limit, self.act_clamp = act, act_limit, act_clamp
        self.inter, self.h = wu.shape[1], wu.shape[2]


# layer index -> _HostLayer; indices are never reused within a process so a
# compiled step's baked-in lidx stays valid for the owning model's lifetime
_layers: dict[int, _HostLayer] = {}
_owners: dict[int, list[int]] = {}  # owner key (id(config)) -> layer indices
_next_idx = 0
_lock = threading.Lock()


def quantize_experts(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(E, in, out) f32 -> int8 (E, out, in) row-major per-GEMV + (E, out)
    scales. Output-row scaling matches the on-device int8 serving mode."""
    wt = np.ascontiguousarray(np.swapaxes(w, 1, 2))  # (E, out, in)
    amax = np.maximum(np.abs(wt).max(axis=2), 1e-8)  # (E, out)
    s = (amax / 127.0).astype(np.float32)
    q = np.clip(np.rint(wt / s[:, :, None]), -127, 127).astype(np.int8)
    return q, s


def register_layer(wg, wu, wd, bg=None, bu=None, bd=None,
                   activation: str = "silu", act_limit: float = 7.0,
                   act_clamp: float = 0.0, owner: int | None = None) -> int:
    """Quantize + stash one MoE layer's expert stacks ((E, in, out) f32 each;
    wg None for non-gated experts). Returns the layer index the forward
    callback uses. `owner` (e.g. id(config)) groups layers so release(owner)
    frees a model's host RAM on unload/reload instead of accumulating."""
    def q(w):
        return quantize_experts(np.asarray(w, dtype=np.float32)) \
            if w is not None else (None, None)

    qg, sg = q(wg)
    qu, su = q(wu)
    qd, sd = q(wd)

    def f32(b):
        return np.ascontiguousarray(b, dtype=np.float32) if b is not None else None

    lay = _HostLayer(qg, sg, f32(bg), qu, su, f32(bu), qd, sd, f32(bd),
                     activation, float(act_limit), float(act_clamp))
    global _next_idx
    with _lock:
        idx = _next_idx
        _next_idx += 1
        _layers[idx] = lay
        if owner is not None:
            _owners.setdefault(owner, []).append(idx)
        return idx


def release(owner: int):
    """Drop every layer registered under `owner` (model unload / reload)."""
    with _lock:
        for idx in _owners.pop(owner, ()):
            _layers.pop(idx, None)


def reset():
    """Drop every registered layer (tests / model reloads)."""
    with _lock:
        _layers.clear()
        _owners.clear()


def host_ram_bytes() -> int:
    tot = 0
    for l in _layers.values():
        for a in (l.wg, l.wu, l.wd, l.sg, l.su, l.sd, l.bg, l.bu, l.bd):
            if a is not None:
                tot += a.nbytes
    return tot


def _np_quantize_rows(x: np.ndarray):
    amax = np.maximum(np.abs(x).max(axis=-1, keepdims=True), 1e-8)
    s = amax / 127.0
    return np.clip(np.rint(x / s), -127, 127).astype(np.int8), s[..., 0]


def _np_act(kind: str, v: np.ndarray) -> np.ndarray:
    if kind == "gelu":
        from math import sqrt
        try:
            from scipy.special import erf  # pragma: no cover
            return 0.5 * v * (1.0 + erf(v / sqrt(2.0)))
        except Exception:
            # tanh approximation is within float32 noise of erf here
            kind = "gelu_pytorch_tanh"
    if kind == "gelu_pytorch_tanh":
        return 0.5 * v * (1.0 + np.tanh(0.7978845608028654
                                        * (v + 0.044715 * v ** 3)))
    if kind == "relu2":
        return np.square(np.maximum(v, 0.0))
    return v / (1.0 + np.exp(-v))  # silu


def _forward_np(lay: _HostLayer, x, topi, topv):
    """Numpy reference path (also the fallback without the native lib):
    identical int8 math to moe_ffn_int8."""
    T, k = topi.shape
    out = np.zeros((T, lay.h), dtype=np.float32)
    x8, qx = _np_quantize_rows(x)
    for t in range(T):
        for s in range(k):
            w = float(topv[t, s])
            if w == 0.0:
                continue
            e = int(topi[t, s])
            xi = x8[t].astype(np.int32)
            u = (lay.wu[e].astype(np.int32) @ xi).astype(np.float32) \
                * (qx[t] * lay.su[e])
            if lay.bu is not None:
                u = u + lay.bu[e]
            if lay.wg is None:
                a = _np_act(lay.act, u)
            else:
                g = (lay.wg[e].astype(np.int32) @ xi).astype(np.float32) \
                    * (qx[t] * lay.sg[e])
                if lay.bg is not None:
                    g = g + lay.bg[e]
                if lay.act == "silu_oai":
                    gc = np.minimum(g, lay.act_limit)
                    uc = np.clip(u, -lay.act_limit, lay.act_limit)
                    a = (uc + 1.0) * gc / (1.0 + np.exp(-gc * 1.702))
                elif lay.act_clamp:
                    a = np.minimum(_np_act(lay.act, g), lay.act_clamp) \
                        * np.clip(u, -lay.act_clamp, lay.act_clamp)
                else:
                    a = _np_act(lay.act, g) * u
            a8, qa = _np_quantize_rows(a[None, :])
            y = (lay.wd[e].astype(np.int32) @ a8[0].astype(np.int32)) \
                .astype(np.float32) * (float(qa[0]) * lay.sd[e])
            if lay.bd is not None:
                y = y + lay.bd[e]
            out[t] += w * y
    return out


def _lib():
    from ..native.build import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "moe_ffn_int8"):
        return None
    return lib


def forward(lidx: int, x: np.ndarray, topi: np.ndarray,
            topv: np.ndarray) -> np.ndarray:
    """Routed-expert FFN for layer `lidx`: x (T, h) f32, topi/topv (T, k).
    Returns (T, h) f32. Called from inside the traced step via
    jax.pure_callback."""
    lay = _layers[lidx]
    x = np.ascontiguousarray(x, dtype=np.float32)
    topi = np.ascontiguousarray(topi, dtype=np.int32)
    topv = np.ascontiguousarray(topv, dtype=np.float32)
    T, k = topi.shape
    lib = _lib()
    akind = act_kind(lay.act)
    if lib is None or akind is None:
        return _forward_np(lay, x, topi, topv)
    out = np.zeros((T, lay.h), dtype=np.float32)

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None

    lib.moe_ffn_int8(
        p(x), p(topi), p(topv),
        p(lay.wg), p(lay.sg), p(lay.bg),
        p(lay.wu), p(lay.su), p(lay.bu),
        p(lay.wd), p(lay.sd), p(lay.bd),
        p(out), ctypes.c_int(T), ctypes.c_int(k),
        ctypes.c_int(lay.h), ctypes.c_int(lay.inter),
        ctypes.c_int(akind if lay.act != "silu_oai" else 4),
        ctypes.c_float(lay.act_limit), ctypes.c_float(lay.act_clamp),
        ctypes.c_int(0))
    return out
