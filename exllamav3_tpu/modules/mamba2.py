"""Mamba2 SSM layer (NemotronH and other hybrid architectures).

Feature reference: /root/reference/exllamav3/modules/mamba2.py (Mamba2:60,
forward:356 — in_proj split [z | xBC | dt], dt = clamp(softplus(dt+bias)),
g = dt * A with A = -exp(A_log), conv+silu over xBC, plain GLA recurrence
with q=C, k=B, v=x*dt, D skip connection, grouped gate-first norm).

Same recurrence machinery as GatedDeltaNet (ops/recurrence.py) with
delta_rule=False and beta=1. State per sequence slot: conv tail
(conv_dim, ksize-1) and S (num_heads, state_size, head_dim) f32.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .norms import GatedRMSNorm
from .gated_delta_net import _get_f32
from ..ops.recurrence import causal_conv1d, gated_recurrence


class Mamba2(Module):
    is_kv_cache_user = True
    is_recurrent = True

    def __init__(
        self,
        config,
        key: str,
        layer_idx: int,
        hidden_size: int,
        num_heads: int,
        head_dim: int,
        num_groups: int,
        state_size: int,
        rms_norm_eps: float,
        conv_kernel_size: int,
        dt_limit: tuple = (0.0, float("inf")),
        key_in: str = "in_proj",
        key_conv1d: str = "conv1d",
        key_a_log: str = "A_log",
        key_dt_bias: str = "dt_bias",
        key_d: str = "D",
        key_norm: str = "norm",
        key_o: str = "out_proj",
        qmap: str | None = None,
        out_dtype=None,
    ):
        super().__init__(config, key, qmap)
        self.layer_idx = layer_idx
        self.hidden_size = hidden_size
        self.num_v_heads = num_heads
        self.num_k_heads = num_groups
        self.k_head_dim = state_size
        self.v_head_dim = head_dim
        self.num_v_groups = num_heads // num_groups
        self.conv_kernel_size = conv_kernel_size
        self.dt_limit = dt_limit
        self.v_dim = num_heads * head_dim
        self.k_dim = num_groups * state_size
        self.conv_dim = self.v_dim + 2 * self.k_dim
        self.proj_dim = 2 * self.v_dim + 2 * self.k_dim + num_heads
        self.out_dtype = out_dtype
        self.key_a_log = f"{key}.{key_a_log}"
        self.key_dt_bias = f"{key}.{key_dt_bias}"
        self.key_d = f"{key}.{key_d}"
        self.key_conv1d = f"{key}.{key_conv1d}"

        self.in_proj = Linear(config, f"{key}.{key_in}", hidden_size,
                              self.proj_dim, qmap=qmap and qmap + ".input")
        self.norm = GatedRMSNorm(config, f"{key}.{key_norm}", rms_norm_eps,
                                 groups=num_groups, gate_first=True,
                                 dim=self.v_dim)
        self.o_proj = Linear(config, f"{key}.{key_o}", self.v_dim, hidden_size,
                             qmap=qmap and qmap + ".output", out_dtype=out_dtype)
        self.modules = [self.in_proj, self.norm, self.o_proj]

    def new_cache_layer(self, spec) -> dict:
        n = spec.recurrent_slots or (
            spec.batch_size if spec.layout == "linear" else 33)
        return {
            "conv": jnp.zeros((n, self.conv_dim, self.conv_kernel_size - 1),
                              jnp.float32),
            "S": jnp.zeros((n, self.num_v_heads, self.k_head_dim,
                            self.v_head_dim), jnp.float32),
        }

    def load(self, params: dict) -> None:
        super().load(params)
        stc = self.config.stc
        p = {
            "a_log": jnp.asarray(_get_f32(stc, self.key_a_log)),
            "dt_bias": jnp.asarray(_get_f32(stc, self.key_dt_bias)),
            "d_skip": jnp.asarray(_get_f32(stc, self.key_d)),
        }
        cw = _get_f32(stc, self.key_conv1d + ".weight")
        p["conv_w"] = jnp.asarray(cw.reshape(self.conv_dim, -1))
        cb = _get_f32(stc, self.key_conv1d + ".bias", optional=True)
        if cb is not None:
            p["conv_b"] = jnp.asarray(cb)
        params[self.key] = p

    def forward(self, x, params: dict, ctx: ForwardCtx):
        B, S, _ = x.shape
        dtp = x.dtype
        p = params[self.key]
        Hv, Hk, dk, dv, G = (self.num_v_heads, self.num_k_heads,
                             self.k_head_dim, self.v_head_dim, self.num_v_groups)

        proj = self.in_proj.forward(x, params, ctx)
        z = proj[..., : self.v_dim]
        xbc = proj[..., self.v_dim : self.v_dim + self.conv_dim]
        dt_raw = proj[..., self.v_dim + self.conv_dim :]  # (B, S, Hv)

        # discretization: dt = clamp(softplus(dt + bias)); g = dt * A
        dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + p["dt_bias"])
        lo, hi = self.dt_limit
        if lo > 0.0 or hi != float("inf"):
            dt = jnp.clip(dt, lo, hi)

        # mask padded tail tokens (bucketed prefill): dt=0 -> no write, and
        # g = dt*A = 0 -> decay 1 -> state unchanged
        mask = valid_len = None
        if ctx.cache is not None and ctx.cache_seqlens is not None:
            expect = ctx.cache_seqlens[:, None] + jnp.arange(S, dtype=jnp.int32)
            mask = (ctx.positions == expect).astype(jnp.float32)
            valid_len = jnp.sum(mask, axis=-1).astype(jnp.int32)
            dt = dt * mask[..., None]
        g = -dt * jnp.exp(p["a_log"])  # log decay per head

        layer = ctx.cache[self.key] if ctx.cache is not None else None
        slots = None
        if layer is not None:
            slots = ctx.state_slots if ctx.state_slots is not None \
                else jnp.arange(B, dtype=jnp.int32)
            conv_state = layer["conv"][slots]
            S0 = layer["S"][slots]
        else:
            conv_state = None
            S0 = jnp.zeros((B, Hv, dk, dv), jnp.float32)

        hist = ctx.extras.get("recurrent_history")
        if hist is not None:
            from ..ops.recurrence import conv_history

            conv_hist = conv_history(xbc, conv_state, self.conv_kernel_size)
        xbc, new_conv = causal_conv1d(xbc, p["conv_w"], p.get("conv_b"),
                                      conv_state, valid_len=valid_len)
        x_v = xbc[..., : self.v_dim].reshape(B, S, Hv, dv)
        Bm = xbc[..., self.v_dim : self.v_dim + self.k_dim].reshape(B, S, Hk, dk)
        Cm = xbc[..., self.v_dim + self.k_dim :].reshape(B, S, Hk, dk)

        q = jnp.repeat(Cm, G, axis=2)
        k = jnp.repeat(Bm, G, axis=2)
        v = x_v.astype(jnp.float32) * dt[..., None]
        ones = jnp.ones_like(g)
        if hist is not None:
            o, S_T, S_hist = gated_recurrence(q, k, v, g, ones, S0, scale=1.0,
                                              delta_rule=False,
                                              return_history=True)
            hist[self.key] = {"conv": conv_hist, "S": S_hist}
        elif S >= 32:
            from ..ops.recurrence import gated_recurrence_chunked

            o, S_T = gated_recurrence_chunked(q, k, v, g, ones, S0, scale=1.0,
                                              delta_rule=False)
        else:
            o, S_T = gated_recurrence(q, k, v, g, ones, S0, scale=1.0,
                                      delta_rule=False)
        o = o + p["d_skip"][None, None, :, None] * x_v.astype(jnp.float32)

        if layer is not None:
            ctx.cache[self.key] = {
                "conv": layer["conv"].at[slots].set(new_conv),
                "S": layer["S"].at[slots].set(S_T),
            }

        # grouped, gated norm: y = groupnorm(y * silu(z)) * w
        gs = self.v_dim // Hk
        o = o.reshape(B, S, Hk, gs).astype(dtp)
        z = z.reshape(B, S, Hk, gs)
        o = self.norm.forward(o, params, ctx, gate=z)
        o = o.reshape(B, S, self.v_dim)
        y = self.o_proj.forward(o, params, ctx)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y
