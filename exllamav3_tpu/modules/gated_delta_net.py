"""GatedDeltaNet: gated delta-rule linear attention (Qwen3-Next, Qwen3.5,
Kimi-Linear style layers).

Feature reference: /root/reference/exllamav3/modules/gated_delta_net.py
(GatedDeltaNet:299, fused qkvz/ba split :685-713, forward :754) and
gated_delta_net_fn/gated_delta_rule.py (torch_recurrent_gated_delta_rule:45
— the semantic spec this module reproduces). The reference runs CUDA-graph
C++ decode paths and fla/triton chunked prefill; here the recurrence is a
lax.scan (ops/recurrence.py) inside the jitted step, with conv + recurrent
state carried in the cache pytree keyed by stable per-job slots.

Math: beta = sigmoid(b) * beta_scale; g = -softplus(a + dt_bias) * exp(A_log)
(log decay per v-head). q/k/v pass a depthwise causal conv (+silu); q, k are
l2-normalized per head and broadcast from k-heads to v-heads; the gated delta
rule scans over time; output is gate-normalized (rmsnorm * silu(z)) and
projected.

State per sequence slot: conv tail (conv_dim, ksize-1) f32 and S
(num_v_heads, dk, dv) f32. The state advances destructively — speculative
rewind and prefix-cache skipping are disabled by the generator for models
containing this module (the reference records per-token history instead;
that lands with the chunked kernel).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .norms import GatedRMSNorm
from ..ops.recurrence import causal_conv1d, gated_recurrence, l2norm
from ..loader.safetensors import bf16_to_f32


def _get_f32(stc, key, optional=False):
    t = stc.get_tensor(key, optional=optional, allow_bf16=True)
    if t is None:
        return None
    if t.dtype == np.uint16:
        t = bf16_to_f32(t)
    return t.astype(np.float32)


class GatedDeltaNet(Module):
    is_kv_cache_user = True
    is_recurrent = True

    def __init__(
        self,
        config,
        key: str,
        layer_idx: int,
        hidden_size: int,
        k_head_dim: int,
        v_head_dim: int,
        num_k_heads: int,
        num_v_heads: int,
        rms_norm_eps: float,
        conv_kernel_size: int,
        beta_scale: float = 1.0,
        key_a_log: str = "A_log",
        key_dt_bias: str = "dt_bias",
        key_conv1d: str = "conv1d",
        key_conv1d_q: str | None = None,  # OlmoHybrid: per-q/k/v conv weights
        key_conv1d_k: str | None = None,
        key_conv1d_v: str | None = None,
        key_fused_qkvz: str | None = None,
        key_fused_ba: str | None = None,
        key_qkv: str | None = None,
        key_qkv_alt: list | None = None,  # fallback separate q/k/v projections
        key_z: str | None = None,
        key_b: str | None = None,
        key_a: str | None = None,
        key_norm: str = "norm",
        key_o: str = "out_proj",
        qmap: str | None = None,
        out_dtype=None,
    ):
        super().__init__(config, key, qmap)
        self.layer_idx = layer_idx
        self.hidden_size = hidden_size
        self.k_head_dim = k_head_dim
        self.v_head_dim = v_head_dim
        self.num_k_heads = num_k_heads
        self.num_v_heads = num_v_heads
        self.num_v_groups = num_v_heads // num_k_heads
        self.conv_kernel_size = conv_kernel_size
        self.beta_scale = beta_scale
        self.k_dim = k_head_dim * num_k_heads
        self.v_dim = v_head_dim * num_v_heads
        self.conv_dim = 2 * self.k_dim + self.v_dim
        self.out_dtype = out_dtype
        self.key_a_log = f"{key}.{key_a_log}"
        self.key_dt_bias = f"{key}.{key_dt_bias}"
        self.key_conv1d = f"{key}.{key_conv1d}"
        self.keys_conv_qkv = None
        if key_conv1d_q:
            self.keys_conv_qkv = (f"{key}.{key_conv1d_q}",
                                  f"{key}.{key_conv1d_k}",
                                  f"{key}.{key_conv1d_v}")

        fdim_qkvz = 2 * self.k_dim + 2 * self.v_dim
        qmap_in = qmap and qmap + ".input"
        self.qkvz_proj = self.qkv_proj = self.z_proj = None
        self.ba_proj = self.b_proj = self.a_proj = None
        self.qkv_alt_linears = None
        if key_fused_qkvz:
            self.qkvz_proj = Linear(config, f"{key}.{key_fused_qkvz}",
                                    hidden_size, fdim_qkvz, qmap=qmap_in)
        else:
            use_alt = (key_qkv_alt and not config.stc.has_tensor_group(
                f"{key}.{key_qkv}",
                [["suh", "su"], ["svh", "sv"], "trellis"])
                and not config.stc.has_tensor(f"{key}.{key_qkv}.weight"))
            if use_alt:
                dims = (self.k_dim, self.k_dim, self.v_dim)
                self.qkv_alt_linears = [
                    Linear(config, f"{key}.{ak}", hidden_size, dim,
                           qmap=qmap_in)
                    for ak, dim in zip(key_qkv_alt, dims)
                ]
            else:
                self.qkv_proj = Linear(config, f"{key}.{key_qkv}", hidden_size,
                                       2 * self.k_dim + self.v_dim, qmap=qmap_in)
            self.z_proj = Linear(config, f"{key}.{key_z}", hidden_size,
                                 self.v_dim, qmap=qmap_in)
        if key_fused_ba:
            self.ba_proj = Linear(config, f"{key}.{key_fused_ba}", hidden_size,
                                  2 * num_v_heads)
        else:
            self.b_proj = Linear(config, f"{key}.{key_b}", hidden_size, num_v_heads)
            self.a_proj = Linear(config, f"{key}.{key_a}", hidden_size, num_v_heads)
        self.norm = GatedRMSNorm(config, f"{key}.{key_norm}", rms_norm_eps,
                                 dim=v_head_dim)
        self.o_proj = Linear(config, f"{key}.{key_o}", self.v_dim, hidden_size,
                             qmap=qmap and qmap + ".output", out_dtype=out_dtype)
        self.modules = [m for m in (
            self.qkvz_proj, self.qkv_proj, self.z_proj, self.ba_proj,
            self.b_proj, self.a_proj, self.norm, self.o_proj) if m]
        if self.qkv_alt_linears:
            self.modules += self.qkv_alt_linears

    # -- cache -----------------------------------------------------------------

    def new_cache_layer(self, spec) -> dict:
        n = spec.recurrent_slots or (
            spec.batch_size if spec.layout == "linear" else 33)
        return {
            "conv": jnp.zeros((n, self.conv_dim, self.conv_kernel_size - 1),
                              jnp.float32),
            "S": jnp.zeros((n, self.num_v_heads, self.k_head_dim,
                            self.v_head_dim), jnp.float32),
        }

    # -- loading ------------------------------------------------------------------

    def load(self, params: dict) -> None:
        super().load(params)
        stc = self.config.stc
        p = {
            "a_log": jnp.asarray(_get_f32(stc, self.key_a_log)),
            "dt_bias": jnp.asarray(_get_f32(stc, self.key_dt_bias)),
        }
        if self.keys_conv_qkv and stc.has_tensor(self.keys_conv_qkv[0] + ".weight"):
            # separate per-q/k/v depthwise conv weights: fuse in channel order
            cw = np.concatenate([
                _get_f32(stc, k + ".weight").reshape(-1, self.conv_kernel_size)
                for k in self.keys_conv_qkv], axis=0)
            p["conv_w"] = jnp.asarray(cw)
        else:
            cw = _get_f32(stc, self.key_conv1d + ".weight")  # (conv_dim, 1, ks)
            p["conv_w"] = jnp.asarray(cw.reshape(self.conv_dim, -1))
            cb = _get_f32(stc, self.key_conv1d + ".bias", optional=True)
            if cb is not None:
                p["conv_b"] = jnp.asarray(cb)
        params[self.key] = p

    # -- projections -----------------------------------------------------------------

    def _split_inputs(self, x, params, ctx):
        """-> q, k (B,S,Hk,dk); v, z (B,S,Hv,dv); b, a (B,S,Hv)."""
        B, S, _ = x.shape
        Hk, Hv, dk, dv, G = (self.num_k_heads, self.num_v_heads,
                             self.k_head_dim, self.v_head_dim, self.num_v_groups)
        if self.qkvz_proj is not None:
            # fused layout interleaves per k-head: [q|k|v_group|z_group]
            qkvz = self.qkvz_proj.forward(x, params, ctx)
            qkvz = qkvz.reshape(B, S, Hk, 2 * dk + 2 * G * dv)
            q = qkvz[..., :dk]
            k = qkvz[..., dk : 2 * dk]
            v = qkvz[..., 2 * dk : 2 * dk + G * dv].reshape(B, S, Hv, dv)
            z = qkvz[..., 2 * dk + G * dv :].reshape(B, S, Hv, dv)
        elif self.qkv_alt_linears:
            q = self.qkv_alt_linears[0].forward(x, params, ctx).reshape(B, S, Hk, dk)
            k = self.qkv_alt_linears[1].forward(x, params, ctx).reshape(B, S, Hk, dk)
            v = self.qkv_alt_linears[2].forward(x, params, ctx).reshape(B, S, Hv, dv)
            z = self.z_proj.forward(x, params, ctx).reshape(B, S, Hv, dv)
        else:
            qkv = self.qkv_proj.forward(x, params, ctx)
            q = qkv[..., : self.k_dim].reshape(B, S, Hk, dk)
            k = qkv[..., self.k_dim : 2 * self.k_dim].reshape(B, S, Hk, dk)
            v = qkv[..., 2 * self.k_dim :].reshape(B, S, Hv, dv)
            z = self.z_proj.forward(x, params, ctx).reshape(B, S, Hv, dv)
        if self.ba_proj is not None:
            ba = self.ba_proj.forward(x, params, ctx).reshape(B, S, Hk, 2 * G)
            b = ba[..., :G].reshape(B, S, Hv)
            a = ba[..., G:].reshape(B, S, Hv)
        else:
            b = self.b_proj.forward(x, params, ctx)
            a = self.a_proj.forward(x, params, ctx)
        return q, k, v, z, b, a

    # -- forward --------------------------------------------------------------------

    def forward(self, x, params: dict, ctx: ForwardCtx):
        B, S, _ = x.shape
        dt = x.dtype
        p = params[self.key]
        Hk, Hv, dk, dv, G = (self.num_k_heads, self.num_v_heads,
                             self.k_head_dim, self.v_head_dim, self.num_v_groups)

        q, k, v, z, b, a = self._split_inputs(x, params, ctx)

        # decay / write strength (reference gdn.cu fused op)
        beta = jax.nn.sigmoid(b.astype(jnp.float32)) * self.beta_scale
        g = -jax.nn.softplus(a.astype(jnp.float32) + p["dt_bias"]) * jnp.exp(p["a_log"])

        # mask padded tail tokens (bucketed prefill): a real token sits at
        # position cache_seqlens + its row offset; padding does not. Masked
        # steps get beta=0, g=0 (decay 1) -> state unchanged.
        mask = valid_len = None
        if ctx.cache is not None and ctx.cache_seqlens is not None:
            expect = ctx.cache_seqlens[:, None] + jnp.arange(S, dtype=jnp.int32)
            mask = (ctx.positions == expect).astype(jnp.float32)  # (B, S)
            valid_len = jnp.sum(mask, axis=-1).astype(jnp.int32)
            beta = beta * mask[..., None]
            g = g * mask[..., None]

        # depthwise conv over [q_flat | k_flat | v_flat] with carried tail
        mixed = jnp.concatenate(
            [q.reshape(B, S, -1), k.reshape(B, S, -1), v.reshape(B, S, -1)],
            axis=-1)
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

            conv_hist = conv_history(mixed, conv_state, self.conv_kernel_size)
        mixed, new_conv = causal_conv1d(mixed, p["conv_w"], p.get("conv_b"),
                                        conv_state, valid_len=valid_len)
        q = mixed[..., : self.k_dim].reshape(B, S, Hk, dk)
        k = mixed[..., self.k_dim : 2 * self.k_dim].reshape(B, S, Hk, dk)
        v = mixed[..., 2 * self.k_dim :].reshape(B, S, Hv, dv)

        # l2-normalize q/k, broadcast k-heads to v-heads
        q = jnp.repeat(l2norm(q), G, axis=2)
        k = jnp.repeat(l2norm(k), G, axis=2)

        if hist is not None:
            o, S_T, S_hist = gated_recurrence(
                q, k, v, g, beta, S0, scale=1.0 / math.sqrt(dk),
                delta_rule=True, return_history=True)
            hist[self.key] = {"conv": conv_hist, "S": S_hist}
        elif S >= 32:
            from ..ops.recurrence import gated_recurrence_chunked

            o, S_T = gated_recurrence_chunked(
                q, k, v, g, beta, S0, scale=1.0 / math.sqrt(dk),
                delta_rule=True)
        else:
            o, S_T = gated_recurrence(q, k, v, g, beta, S0,
                                      scale=1.0 / math.sqrt(dk), delta_rule=True)

        if layer is not None:
            ctx.cache[self.key] = {
                "conv": layer["conv"].at[slots].set(new_conv),
                "S": layer["S"].at[slots].set(S_T),
            }

        o = self.norm.forward(o.astype(dt), params, ctx, gate=z)
        o = o.reshape(B, S, self.v_dim)
        y = self.o_proj.forward(o, params, ctx)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y
