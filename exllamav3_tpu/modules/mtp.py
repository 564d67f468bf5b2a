"""MTP (multi-token prediction) input layer.

Feature reference: /root/reference/exllamav3/modules/arch_specific/
qwen3_5_mtp.py (Qwen3_5MTPInputLayer:13 — the incoming target hidden state
and the next token's embedding are RMS-normed, concatenated
[embedding | hidden] and projected 2H -> H by fc). DeepSeek's nextn heads
use the same shape with enorm/hnorm/eh_proj names.
"""
from __future__ import annotations

import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .norms import RMSNorm


class MTPInputLayer(Module):
    def __init__(
        self,
        config,
        key: str,
        hidden_size: int,
        rms_norm_eps: float,
        key_pre_fc_norm_hidden: str,
        key_pre_fc_norm_embedding: str,
        key_fc: str,
        constant_bias: float = 0.0,
        out_dtype=None,
    ):
        super().__init__(config, key)
        self.hidden_size = hidden_size
        self.out_dtype = out_dtype
        self.norm_h = RMSNorm(config, key_pre_fc_norm_hidden, rms_norm_eps,
                              constant_bias=constant_bias)
        self.norm_e = RMSNorm(config, key_pre_fc_norm_embedding, rms_norm_eps,
                              constant_bias=constant_bias)
        self.fc = Linear(config, key_fc, 2 * hidden_size, hidden_size)
        self.modules = [self.norm_h, self.norm_e, self.fc]

    def forward(self, x, params: dict, ctx: ForwardCtx):
        """x: token embeddings (B, S, H); ctx.extras["target_hidden"]:
        (B, S, H) target residual stream aligned one position earlier."""
        th = ctx.extras["target_hidden"]
        e = self.norm_e.forward(x, params, ctx)
        h = self.norm_h.forward(th.astype(x.dtype), params, ctx)
        y = jnp.concatenate([e, h.astype(e.dtype)], axis=-1)
        y = self.fc.forward(y, params, ctx)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y
