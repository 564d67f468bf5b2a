"""mHC manifold-constrained hyper-connections (DeepSeek-V4).

Feature reference: /root/reference/exllamav3/modules/hyperconnections.py
(ExpandStreams:19, HyperConnection:52, HyperHead:209). The residual is
carried as hc_mult parallel f32 streams (B, S, H, D): ExpandStreams
broadcasts the embedding into the streams, each sublayer site mixes them
through a HyperConnection (sigmoid pre/post weights + Sinkhorn-normalized
combine matrix), and HyperHead collapses them before the final norm. The
reference fuses this into two CUDA kernels; on TPU the chain is elementwise
+ one thin matmul per site, which XLA fuses around the adjacent matmuls.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx


def _rms_flat(x, eps):
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps)


class ExpandStreams(Module):
    """Broadcast the embedding into hc_mult parallel residual streams, f32."""

    def __init__(self, config, key: str, hc_mult: int):
        super().__init__(config, key)
        self.hc_mult = hc_mult

    def forward(self, x, params: dict, ctx: ForwardCtx):
        xf = x.astype(jnp.float32)
        return jnp.broadcast_to(
            xf[..., None, :], xf.shape[:-1] + (self.hc_mult, xf.shape[-1]))


class HyperConnection(Module):
    """mHC mixer for one sublayer site. Owns raw f32 tensors {key}_fn
    ((2+H)*H, H*D), {key}_base ((2+H)*H,), {key}_scale (3,). Not a standalone
    graph module: TransformerBlock calls mix()/apply() around its sites."""

    def __init__(self, config, key: str, hc_mult: int, hidden_size: int,
                 sinkhorn_iters: int, hc_eps: float, rms_norm_eps: float):
        super().__init__(config, key)
        self.hc_mult = hc_mult
        self.hidden_size = hidden_size
        self.sinkhorn_iters = sinkhorn_iters
        self.hc_eps = hc_eps
        self.rms_eps = rms_norm_eps

    def load(self, params: dict) -> None:
        stc = self.config.stc
        params[self.key] = {
            t: jnp.asarray(
                stc.get_tensor(f"{self.key}_{t}").astype(np.float32))
            for t in ("fn", "base", "scale")
        }

    def mix(self, streams, params: dict):
        """streams (B, S, H, D) f32 -> (post (B,S,H), comb (B,S,H,H),
        collapsed (B,S,D))."""
        p = params[self.key]
        hc = self.hc_mult
        flat = _rms_flat(streams.reshape(streams.shape[:-2] + (-1,)),
                         self.rms_eps)
        mix = flat @ p["fn"].T  # (B, S, (2+H)*H)
        pre_w, post_w, comb_w = jnp.split(mix, [hc, 2 * hc], axis=-1)
        pre_b, post_b, comb_b = jnp.split(p["base"], [hc, 2 * hc])
        pre_s, post_s, comb_s = p["scale"][0], p["scale"][1], p["scale"][2]

        pre = jax.nn.sigmoid(pre_w * pre_s + pre_b) + self.hc_eps
        post = 2.0 * jax.nn.sigmoid(post_w * post_s + post_b)
        comb = comb_w.reshape(comb_w.shape[:-1] + (hc, hc)) * comb_s \
            + comb_b.reshape(hc, hc)
        comb = jax.nn.softmax(comb, axis=-1) + self.hc_eps
        comb = comb / (jnp.sum(comb, axis=-2, keepdims=True) + self.hc_eps)
        for _ in range(self.sinkhorn_iters - 1):
            comb = comb / (jnp.sum(comb, axis=-1, keepdims=True) + self.hc_eps)
            comb = comb / (jnp.sum(comb, axis=-2, keepdims=True) + self.hc_eps)
        collapsed = jnp.sum(pre[..., None] * streams, axis=-2)
        return post, comb, collapsed

    def apply(self, streams, y, post, comb):
        """Residual update for one site: x <- post ⊗ y + combᵀ x."""
        yf = y.astype(jnp.float32)
        return post[..., None] * yf[..., None, :] + jnp.einsum(
            "...ij,...id->...jd", comb, streams)

    def forward(self, x, params: dict, ctx: ForwardCtx):
        raise RuntimeError("HyperConnection is not a standalone module; use mix()")


class HyperHead(Module):
    """Final mHC stream collapse before the model norm. Tensors {key}_fn
    (H, H*D), {key}_base, {key}_scale."""

    def __init__(self, config, key: str, hc_mult: int, rms_norm_eps: float,
                 hc_eps: float):
        super().__init__(config, key)
        self.hc_mult = hc_mult
        self.rms_eps = rms_norm_eps
        self.hc_eps = hc_eps

    def load(self, params: dict) -> None:
        stc = self.config.stc
        params[self.key] = {
            t: jnp.asarray(
                stc.get_tensor(f"{self.key}_{t}").astype(np.float32))
            for t in ("fn", "base", "scale")
        }

    def forward(self, x, params: dict, ctx: ForwardCtx):
        p = params[self.key]
        flat = _rms_flat(x.reshape(x.shape[:-2] + (-1,)), self.rms_eps)
        mixes = flat @ p["fn"].T  # (B, S, H)
        pre = jax.nn.sigmoid(mixes * p["scale"] + p["base"]) + self.hc_eps
        return jnp.sum(pre[..., None] * x, axis=-2).astype(jnp.bfloat16)
