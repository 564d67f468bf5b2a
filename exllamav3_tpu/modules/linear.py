"""Linear layer: EXL3-quantized or dense checkpoints behind one interface.

Feature reference: /root/reference/exllamav3/modules/linear.py (load_exl3:435,
load_fp16:179, capture_H:531) and modules/quant/exl3.py (forward:114,
reconstruct_hgemm:161).

TPU-native runtime representations for EXL3 tensors ("linear_mode"):
  * "reconstruct": keep the packed trellis; every forward decodes the full
    weight then matmuls (XLA fuses the Hadamards). Minimal HBM, VPU-heavy —
    used for golden tests and very low-memory configs.
  * "bf16": decode once at load into a bf16 weight (original basis). Fastest
    matmul, 2 bytes/weight.
  * "int8": decode once at load, requantize per-output-channel to int8 —
    1 byte/weight with negligible extra error below the trellis noise floor.
    Matmul runs through the fused Pallas dequant kernel (ops/q_matmul.py).
  * "int4": decode once at load, requantize to grouped int4 (per-64-row
    scales, two weights per byte) — 0.5 byte/weight, the format's own HBM
    budget at 4 bpw, with an in-kernel ~3.5-VPU-op/weight unpack
    (ops/q_matmul.py int4_matmul) — the SERVING mode for 4-bpw models.
  * "int3"/"int5"/"int6": packed int-B planes in int32 words (0.4/0.69/0.81
    byte/weight incl. group scales) — the quality-vs-bytes Pareto between
    int4 and int8 (int4 requant measurably costs quality at 4 bpw; int6 is
    near-lossless at 19% fewer bytes than int8). ops/q_matmul.py intb_*.
  * "fused": keep packed trellis, Pallas kernel decodes 16x16 tiles in VMEM
    and feeds the MXU directly (ops/exl3_gemm.py) — 0.5 byte/weight at any
    bpw but ~14 VPU ops/weight (capacity mode).

The EXL3 *file format* is identical to the reference; the runtime
representation is chosen per deployment (HBM budget vs decode cost), which is
the TPU answer to the reference's GEMM/GEMV/int8-GEMV CUDA kernel family.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx
from ..quant.reconstruct import (
    reconstruct_full_jnp,
    exl3_matmul_ref_jnp,
    codebook_id,
)
from ..quant.hadamard import had_right_jnp
from ..loader.safetensors import bf16_to_f32


@functools.lru_cache(maxsize=None)
def _load_transform(mode: str, K: int, cb: int, bits: int = 0):
    """ONE jitted trellis -> runtime-representation transform per mode.

    Model load previously ran the reconstruct + requant/pack chain as eager
    jnp ops — each op a separate dispatch, which across ~226 linears of an
    8B model puts hundreds of tunnel round-trips on the load path (230 s
    measured in BENCH_r02). Fusing the whole transform into one jit call
    per (shape, mode) leaves exactly one dispatch per linear."""
    from ..quant.reconstruct import reconstruct_full_jnp

    if mode == "bf16":
        def f(tr, suh, svh):
            return reconstruct_full_jnp(tr, suh, svh, K, cb,
                                        dtype=jnp.bfloat16)
    elif mode == "int8":
        def f(tr, suh, svh):
            w = reconstruct_full_jnp(tr, suh, svh, K, cb, dtype=jnp.float32)
            scale = jnp.max(jnp.abs(w), axis=0) / 127.0 + 1e-12
            q = jnp.clip(jnp.round(w / scale[None, :]),
                         -127, 127).astype(jnp.int8)
            return q, scale.astype(jnp.float32)
    elif mode == "int4":
        from ..ops.q_matmul import int4_pack_jnp

        def f(tr, suh, svh):
            w = reconstruct_full_jnp(tr, suh, svh, K, cb, dtype=jnp.float32)
            return int4_pack_jnp(w)
    elif mode == "intb":
        from ..ops.q_matmul import intb_pack_jnp

        def f(tr, suh, svh):
            w = reconstruct_full_jnp(tr, suh, svh, K, cb, dtype=jnp.float32)
            return intb_pack_jnp(w, bits)
    else:
        raise ValueError(mode)
    return jax.jit(f)


class Linear(Module):
    def __init__(
        self,
        config,
        key: str,
        in_features: int,
        out_features: int,
        qmap: str | None = None,
        alt_key: str | None = None,
        fkey: str | None = None,
        frange: tuple | None = None,
        out_dtype=None,
        softcap: float = 0.0,
        post_scale: float = 1.0,
        pad_to: int = 128,
    ):
        super().__init__(config, key, qmap)
        self.in_features = in_features
        self.out_features = out_features
        self.alt_key = alt_key
        self.fkey = fkey  # fused source tensor (e.g. qkv_proj) for dense ckpts
        self.frange = frange  # (start, end) output-feature slice of fkey
        self.out_dtype = out_dtype
        self.softcap = softcap
        self.post_scale = post_scale
        self.pad_to = pad_to
        self.quant_type: str | None = None
        self.K = None
        self.cb = 0

    # -- loading -----------------------------------------------------------

    def load(self, params: dict) -> None:
        stc = self.config.stc
        keys = [self.key] + ([self.alt_key] if self.alt_key else [])
        for k in keys:
            if stc.has_tensor_group(k, [["suh", "su"], ["svh", "sv"], "trellis"]):
                self._load_exl3(params, k)
                return
        for k in keys:
            if stc.has_tensor(k + ".weight"):
                self._load_dense(params, k)
                return
        if self.fkey and stc.has_tensor(self.fkey + ".weight"):
            self._load_dense(params, self.fkey, frange=self.frange)
            return
        raise ValueError(f"no tensors found for linear {self.key}")

    def _load_exl3(self, params: dict, key: str) -> None:
        stc = self.config.stc
        trellis = stc.get_tensor(key + ".trellis")
        suh = stc.get_tensor(key + ".suh", optional=True)
        svh = stc.get_tensor(key + ".svh", optional=True)
        if suh is None:
            suh = _unpack_signs(stc.get_tensor(key + ".su"))
        if svh is None:
            svh = _unpack_signs(stc.get_tensor(key + ".sv"))
        bias = stc.get_tensor(key + ".bias", optional=True)
        mcg = stc.has_tensor(key + ".mcg")
        mul1 = stc.has_tensor(key + ".mul1")
        self.cb = codebook_id(mcg, mul1)
        self.K = trellis.shape[-1] // 16
        self.quant_type = "exl3"

        mode = self.config.infer_params.linear_mode
        if mode == "auto":
            # Model.load resolves "auto" once per model via the footprint
            # ladder (model/model.py select_linear_mode); a standalone Linear
            # (tests, HF integration) gets the ladder's top tier directly
            mode = "int8"
        self.mode = mode

        p: dict = {}
        suh = suh.astype(np.float32)
        svh = svh.astype(np.float32)
        if mode == "reconstruct":
            p["trellis"] = jnp.asarray(np.ascontiguousarray(trellis))
            p["suh"] = jnp.asarray(suh)
            p["svh"] = jnp.asarray(svh)
        elif mode == "fused":
            from ..ops.exl3_gemm import prepare_trellis_words

            p["words"] = jnp.asarray(
                prepare_trellis_words(np.ascontiguousarray(trellis))
            )
            p["suh"] = jnp.asarray(suh)
            p["svh"] = jnp.asarray(svh)
        elif mode == "bf16":
            p["weight"] = _load_transform("bf16", self.K, self.cb)(
                jnp.asarray(np.ascontiguousarray(trellis)),
                jnp.asarray(suh), jnp.asarray(svh))
        elif mode in ("int8", "int4", "int3", "int5", "int6"):
            # conversion-time serving tensors (Hessian-aware LDLQ codes in
            # the shared-rotated basis, convert.py --serving_bits) beat any
            # load-time round-to-nearest requant — prefer them when present
            # at the requested width (EXL3TPU_SQ=0 disables)
            if mode != "int8" and _use_sq():
                sq = stc.get_tensor(key + ".sq", optional=True)
                if sq is not None:
                    from ..ops.q_matmul import INTB_GROUP, intb_bits_from_shapes

                    sqs = stc.get_tensor(key + ".sq_scale", optional=True)
                    bits = intb_bits_from_shapes(sq.shape[0], sqs.shape[0])
                    if bits == int(mode[3:]):
                        p["weight_sq"] = jnp.asarray(
                            np.ascontiguousarray(sq))
                        p["scale_sq"] = jnp.asarray(
                            sqs.astype(np.float32), dtype=jnp.bfloat16)
                        self.qbits = bits
                        if bias is not None:
                            p["bias"] = jnp.asarray(bias.astype(np.float32))
                        params[self.key] = p
                        return
            from ..ops.q_matmul import INT4_GROUP

            tr_d = jnp.asarray(np.ascontiguousarray(trellis))
            suh_d = jnp.asarray(suh)
            svh_d = jnp.asarray(svh)
            k_rows = trellis.shape[0] * 16
            if mode == "int4" and k_rows % (2 * INT4_GROUP) == 0:
                packed, scale4 = _load_transform("int4", self.K, self.cb)(
                    tr_d, suh_d, svh_d)
                p["weight_q4"] = packed
                p["scale4"] = scale4
            elif (mode in ("int3", "int5", "int6")
                  # tiny layers are a rounding error in total bytes and the
                  # k-pad overhead dominates (W*group-1 rows worst case):
                  # they go int8 instead. EXL3TPU_INTB_MIN_K lowers the gate
                  # (quality evals on small synthetic models).
                  and k_rows >= _intb_min_k()):
                bits = int(mode[3:])
                packed, scaleb = _load_transform("intb", self.K, self.cb,
                                                 bits)(tr_d, suh_d, svh_d)
                p["weight_qb"] = packed
                p["scale_qb"] = scaleb
                self.qbits = bits
            else:
                # int8, or layers whose in_features don't tile the int4
                # groups (tiny heads): per-output-channel int8
                q, scale = _load_transform("int8", self.K, self.cb)(
                    tr_d, suh_d, svh_d)
                p["weight_q"] = q
                p["scale"] = scale
        else:
            raise ValueError(f"unknown linear_mode {mode}")
        if bias is not None:
            p["bias"] = jnp.asarray(bias.astype(np.float32))
        params[self.key] = p

    def _load_dense(self, params: dict, key: str, frange: tuple | None = None) -> None:
        stc = self.config.stc
        w = read_dense_weight(stc, key)
        bias = stc.get_tensor(key + ".bias", optional=True)
        if frange is not None:  # slice of a fused tensor, HF (out, in) rows
            w = w[frange[0] : frange[1]]
            if bias is not None:
                bias = bias[frange[0] : frange[1]]
        # HF stores (out, in); we use (in, out)
        w = np.ascontiguousarray(w.T)
        self.quant_type = "fp16"
        self.mode = "dense"
        p = {"weight": jnp.asarray(w, dtype=jnp.bfloat16)}
        if bias is not None:
            p["bias"] = jnp.asarray(bias.astype(np.float32))
        params[self.key] = p

    # -- forward -------------------------------------------------------------

    def forward(self, x, params: dict, ctx: ForwardCtx):
        p = params[self.key]
        if ctx.capture is not None and self.qmap is not None:
            self._capture_h(x, ctx)
        if ctx.capture_dev is not None and self.qmap is not None:
            ctx.capture_dev.setdefault(self.qmap, []).append(
                x.reshape(-1, self.in_features))
        bias = p.get("bias")
        out_dtype = self.out_dtype or x.dtype

        if "words" in p:
            from ..ops.exl3_gemm import exl3_matmul

            y = exl3_matmul(
                x, p["words"], p["suh"], p["svh"], self.K, self.cb,
                bias=bias, out_dtype=jnp.float32,
            )
        elif "trellis" in p:
            y = exl3_matmul_ref_jnp(
                x, p["trellis"], p["suh"], p["svh"], self.K, self.cb,
                bias=bias, out_dtype=jnp.float32,
            )
        elif "weight_q4" in p:
            from ..ops.q_matmul import int4_matmul

            y = int4_matmul(x, p["weight_q4"], p["scale4"], bias=bias)
        elif "weight_qb" in p:
            from ..ops.q_matmul import intb_matmul

            y = intb_matmul(x, p["weight_qb"], p["scale_qb"],
                            bits=getattr(self, "qbits", None), bias=bias)
        elif "weight_sq" in p:
            from ..ops.q_matmul import intb_matmul

            # serving tensors live in the shared-rotated basis: rotate the
            # activations (one 128-block Hadamard, ~k*128 MACs/row) and the
            # packed codes reconstruct H128-W directly — no output transform
            xr = had_right_jnp(x)
            y = intb_matmul(xr, p["weight_sq"], p["scale_sq"],
                            bits=getattr(self, "qbits", None), bias=bias)
        elif "weight_q" in p:
            from ..ops.q_matmul import int8_matmul

            y = int8_matmul(x, p["weight_q"], p["scale"], bias=bias)
        else:
            y = jnp.dot(
                x.astype(jnp.bfloat16), p["weight"], preferred_element_type=jnp.float32
            )
            if bias is not None:
                y = y + bias
        if "lora_a" in p:
            xa = jnp.dot(x.astype(jnp.bfloat16), p["lora_a"],
                         preferred_element_type=jnp.float32)
            y = y + jnp.dot(xa.astype(jnp.bfloat16), p["lora_b"],
                            preferred_element_type=jnp.float32) * p["lora_scale"]
        if self.softcap:
            y = jnp.tanh(y / self.softcap) * self.softcap
        if self.post_scale != 1.0:
            y = y * self.post_scale
        return y.astype(out_dtype)

    def _capture_h(self, x, ctx: ForwardCtx):
        """Accumulate H += x^T x for this module's qmap (eager mode only)."""
        from ..quant.quantize import HessianData

        hd = ctx.capture.setdefault(self.qmap, HessianData(k=self.in_features))
        hd.accumulate(np.asarray(jax.device_get(x), dtype=np.float32))

    # -- conversion helper ----------------------------------------------------

    def get_weight_f32(self, params: dict) -> np.ndarray:
        """Dense (in, out) f32 weight for quantization/eval."""
        p = params[self.key]
        if "words" in p:
            from ..ops.exl3_gemm import words_to_trellis

            w = reconstruct_full_jnp(
                words_to_trellis(p["words"]), p["suh"], p["svh"], self.K,
                self.cb, dtype=jnp.float32,
            )
            return np.asarray(jax.device_get(w))
        if "trellis" in p:
            w = reconstruct_full_jnp(
                p["trellis"], p["suh"], p["svh"], self.K, self.cb, dtype=jnp.float32
            )
            return np.asarray(jax.device_get(w))
        if "weight_q4" in p:
            from ..ops.q_matmul import int4_unpack_jnp

            return np.asarray(
                jax.device_get(int4_unpack_jnp(p["weight_q4"], p["scale4"])))
        if "weight_qb" in p:
            from ..ops.q_matmul import intb_bits_from_shapes, intb_unpack_jnp

            bits = getattr(self, "qbits", None) or intb_bits_from_shapes(
                p["weight_qb"].shape[0], p["scale_qb"].shape[0])
            return np.asarray(jax.device_get(intb_unpack_jnp(
                p["weight_qb"], p["scale_qb"], bits, self.in_features)))
        if "weight_sq" in p:
            from ..ops.q_matmul import intb_bits_from_shapes, intb_unpack_jnp
            from ..quant.hadamard import had_left_np

            bits = getattr(self, "qbits", None) or intb_bits_from_shapes(
                p["weight_sq"].shape[0], p["scale_sq"].shape[0])
            w_rot = np.asarray(jax.device_get(intb_unpack_jnp(
                p["weight_sq"], p["scale_sq"], bits, self.in_features)))
            return had_left_np(w_rot)  # H128 is symmetric orthonormal
        if "weight_q" in p:
            return np.asarray(
                jax.device_get(p["weight_q"].astype(jnp.float32) * p["scale"][None, :])
            )
        return np.asarray(jax.device_get(p["weight"].astype(jnp.float32)))


def _intb_min_k() -> int:
    from ..util.env import env_int

    return env_int("EXL3TPU_INTB_MIN_K", 512)


def _use_sq() -> bool:
    from ..util.env import env_bool

    return env_bool("EXL3TPU_SQ", True)


def read_dense_weight(stc, key: str) -> np.ndarray:
    """HF-layout (out, in) f32 weight from bf16/f16/f32 or fp8-block
    checkpoints (reference modules/linear.py:179-380 — fp8 weights carry a
    weight_scale_inv block grid, typically 128x128)."""
    from ..loader.safetensors import fp8_e4m3_to_f32, fp8_e5m2_to_f32

    dt = stc.get_dtype_str(key + ".weight")
    if dt == "BF16":
        w = bf16_to_f32(stc.get_tensor(key + ".weight", allow_bf16=True))
    elif dt in ("F8_E4M3", "F8_E5M2"):
        raw = stc.get_tensor(key + ".weight")
        w = (fp8_e4m3_to_f32 if dt == "F8_E4M3" else fp8_e5m2_to_f32)(raw)
        si = stc.get_tensor(key + ".weight_scale_inv", optional=True)
        if si is None:
            si = stc.get_tensor(key + ".weight_scale", optional=True)
        if si is not None:
            if si.dtype == np.uint16:
                si = bf16_to_f32(si)
            si = si.astype(np.float32)
            if si.ndim == 2:
                r, c = w.shape
                sr, sc = si.shape
                w = (w.reshape(sr, r // sr, sc, c // sc)
                     * si.reshape(sr, 1, sc, 1)).reshape(r, c)
            else:
                w = w * si
    else:
        w = stc.get_tensor(key + ".weight").astype(np.float32)
    return w


def _unpack_signs(packed_i16: np.ndarray) -> np.ndarray:
    """Packed sign bitfield -> +-1.0 f32 (reference exl3.py:142-158)."""
    bits = packed_i16.view(np.uint16).astype(np.uint32)
    masks = (1 << np.arange(16, dtype=np.uint32))
    expanded = (bits[..., None] & masks) > 0
    return (1.0 - expanded.astype(np.float32) * 2.0).reshape(-1)
