"""RMSNorm / LayerNorm modules.

Feature reference: /root/reference/exllamav3/modules/rmsnorm.py,
layernorm.py. On TPU these are plain jnp expressions XLA fuses into the
surrounding matmuls (the reference needed fused CUDA kernels: norm.cu).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx


def rms_norm(x, weight, eps: float, constant_bias: float = 0.0):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    y = y * (weight.astype(jnp.float32) + constant_bias)
    return y.astype(x.dtype)


class RMSNorm(Module):
    def __init__(self, config, key: str, rms_norm_eps: float = 1e-6,
                 constant_bias: float = 0.0, out_dtype=None, dim: int | None = None,
                 span_heads: bool = False, unweighted: bool = False,
                 tensor_suffix: bool = True, constant_scale: float = 1.0):
        super().__init__(config, key)
        self.eps = rms_norm_eps
        self.dim = dim
        self.unweighted = unweighted  # pure normalization, no weight tensor
        # Gemma4 MoE router norm: weight stored WITHOUT the .weight suffix,
        # and the normalized value scales by a constant (hidden**-0.5)
        self.tensor_suffix = tensor_suffix
        self.constant_scale = constant_scale
        self.constant_bias = constant_bias  # +1 for Gemma-style norms
        # Olmo2/3, MiniMax-M2: q/k norms normalize over ALL heads flattened
        # (reference rmsnorm.py span_heads)
        self.span_heads = span_heads
        self.out_dtype = out_dtype

    def load(self, params: dict) -> None:
        if self.unweighted:
            return
        wkey = self.key + ".weight" if self.tensor_suffix else self.key
        w = self.config.stc.get_tensor(wkey, allow_bf16=True)
        if w.dtype == np.uint16:
            from ..loader.safetensors import bf16_to_f32

            w = bf16_to_f32(w)
        params[self.key] = {"weight": jnp.asarray(w.astype(np.float32))}

    def _w(self, params):
        if self.unweighted:
            return jnp.float32(1.0)
        return params[self.key]["weight"]

    def forward(self, x, params: dict, ctx: ForwardCtx):
        # unweighted = pure normalization; constant_bias shifts the WEIGHT
        # and is ignored without one (reference rmsnorm.py forward_torch:76)
        cb = 0.0 if self.unweighted else self.constant_bias
        if self.span_heads and x.ndim >= 2:
            shape = x.shape
            xf = x.reshape(shape[:-2] + (shape[-2] * shape[-1],))
            y = rms_norm(xf, self._w(params), self.eps, cb).reshape(shape)
        else:
            y = rms_norm(x, self._w(params), self.eps, cb)
        if self.constant_scale != 1.0:
            y = (y.astype(jnp.float32) * self.constant_scale).astype(y.dtype)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y


class GatedRMSNorm(Module):
    """RMSNorm modulated by a gate (reference modules/gated_rmsnorm.py).

    Default (GDN / Qwen3-Next): y = rmsnorm(x) * w * silu(gate).
    gate_first (Mamba2 group norm): x viewed as (..., groups, numel/groups),
    y = groupnorm(x * silu(gate)) * w with the weight row per group.
    """

    def __init__(self, config, key: str, rms_norm_eps: float = 1e-6,
                 constant_bias: float = 0.0, groups: int = 1,
                 gate_first: bool = False, out_dtype=None, dim: int | None = None):
        super().__init__(config, key)
        self.eps = rms_norm_eps
        self.constant_bias = constant_bias
        self.groups = groups
        self.gate_first = gate_first
        self.out_dtype = out_dtype
        self.dim = dim

    def load(self, params: dict) -> None:
        w = self.config.stc.get_tensor(self.key + ".weight", allow_bf16=True)
        if w.dtype == np.uint16:
            from ..loader.safetensors import bf16_to_f32

            w = bf16_to_f32(w)
        params[self.key] = {"weight": jnp.asarray(w.astype(np.float32))}

    def forward(self, x, params: dict, ctx: ForwardCtx, gate=None):
        w = params[self.key]["weight"] + self.constant_bias
        xf = x.astype(jnp.float32)
        if self.gate_first:
            assert gate is not None
            xf = xf * jax.nn.silu(gate.astype(jnp.float32))
            var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            y = xf * jax.lax.rsqrt(var + self.eps)
            wv = w.reshape(self.groups, -1) if self.groups > 1 else w
            y = y * wv
        else:
            var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            y = xf * jax.lax.rsqrt(var + self.eps) * w
            if gate is not None:
                y = y * jax.nn.silu(gate.astype(jnp.float32))
        y = y.astype(x.dtype)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y


class LayerNorm(Module):
    def __init__(self, config, key: str, eps: float = 1e-5, out_dtype=None,
                 dim: int | None = None):
        super().__init__(config, key)
        self.eps = eps
        self.dim = dim
        self.out_dtype = out_dtype

    def load(self, params: dict) -> None:
        stc = self.config.stc
        p = {"weight": jnp.asarray(stc.get_tensor(self.key + ".weight").astype(np.float32))}
        b = stc.get_tensor(self.key + ".bias", optional=True)
        if b is not None:
            p["bias"] = jnp.asarray(b.astype(np.float32))
        params[self.key] = p

    def forward(self, x, params: dict, ctx: ForwardCtx):
        p = params[self.key]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + self.eps) * p["weight"]
        if "bias" in p:
            y = y + p["bias"]
        y = y.astype(x.dtype)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y
