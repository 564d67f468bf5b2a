"""ShortConv: LFM2-style gated short convolution layer.

Feature reference: /root/reference/exllamav3/modules/short_conv.py
(ShortConv:215, forward: in_proj -> [B|C|x] thirds, conv over B*x with NO
activation, y = C * conv_out -> out_proj; per-slot conv tail state).
"""
from __future__ import annotations

import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .gated_delta_net import _get_f32
from ..ops.recurrence import causal_conv1d


class ShortConv(Module):
    is_kv_cache_user = True
    is_recurrent = True

    def __init__(
        self,
        config,
        key: str,
        layer_idx: int,
        hidden_size: int,
        conv_kernel_size: int,
        key_in: str = "in_proj",
        key_conv: str = "conv",
        key_out: str = "out_proj",
        qmap: str | None = None,
        out_dtype=None,
    ):
        super().__init__(config, key, qmap)
        self.layer_idx = layer_idx
        self.hidden_size = hidden_size
        self.conv_kernel_size = conv_kernel_size
        self.conv_dim = hidden_size
        self.out_dtype = out_dtype
        self.key_conv1d = f"{key}.{key_conv}"
        self.in_proj = Linear(config, f"{key}.{key_in}", hidden_size,
                              3 * hidden_size, qmap=qmap and qmap + ".input")
        self.out_proj = Linear(config, f"{key}.{key_out}", hidden_size,
                               hidden_size, qmap=qmap and qmap + ".output")
        self.modules = [self.in_proj, self.out_proj]

    def new_cache_layer(self, spec) -> dict:
        n = spec.recurrent_slots or (
            spec.batch_size if spec.layout == "linear" else 33)
        return {
            "conv": jnp.zeros((n, self.conv_dim, self.conv_kernel_size - 1),
                              jnp.float32),
        }

    def load(self, params: dict) -> None:
        super().load(params)
        stc = self.config.stc
        cw = _get_f32(stc, self.key_conv1d + ".weight")
        p = {"conv_w": jnp.asarray(cw.reshape(self.conv_dim, -1))}
        cb = _get_f32(stc, self.key_conv1d + ".bias", optional=True)
        if cb is not None:
            p["conv_b"] = jnp.asarray(cb)
        params[self.key] = p

    def forward(self, x, params: dict, ctx: ForwardCtx):
        B, S, _ = x.shape
        p = params[self.key]
        bcx = self.in_proj.forward(x, params, ctx)
        b, c, xin = jnp.split(bcx, 3, axis=-1)

        layer = ctx.cache[self.key] if ctx.cache is not None else None
        slots = None
        valid_len = None
        if layer is not None:
            slots = ctx.state_slots if ctx.state_slots is not None \
                else jnp.arange(B, dtype=jnp.int32)
            conv_state = layer["conv"][slots]
            if ctx.cache_seqlens is not None:
                expect = ctx.cache_seqlens[:, None] + jnp.arange(S, dtype=jnp.int32)
                mask = (ctx.positions == expect).astype(jnp.float32)
                valid_len = jnp.sum(mask, axis=-1).astype(jnp.int32)
        else:
            conv_state = None

        conv_in = (b.astype(jnp.float32) * xin.astype(jnp.float32))
        hist = ctx.extras.get("recurrent_history")
        if hist is not None:
            from ..ops.recurrence import conv_history

            hist[self.key] = {"conv": conv_history(conv_in, conv_state,
                                                   self.conv_kernel_size)}
        y, new_conv = causal_conv1d(conv_in, p["conv_w"], p.get("conv_b"),
                                    conv_state, valid_len=valid_len,
                                    activation=False)
        if layer is not None:
            ctx.cache[self.key] = {"conv": layer["conv"].at[slots].set(new_conv)}

        y = (c.astype(jnp.float32) * y).astype(x.dtype)
        y = self.out_proj.forward(y, params, ctx)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y
