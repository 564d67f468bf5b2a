"""Transformer block: residual wiring around attn/mlp with optional post-norms.

Feature reference: /root/reference/exllamav3/modules/transformer.py
(TransformerBlock:10). Residuals accumulate in f32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx


class TransformerBlock(Module):
    def __init__(
        self,
        config,
        key: str,
        layer_idx: int,
        attn_norm: Module | None = None,
        attn: Module | None = None,
        attn_post_norm: Module | None = None,
        mlp_norm: Module | None = None,
        mlp: Module | None = None,
        mlp_post_norm: Module | None = None,
        residual_scale: float = 1.0,
        ve_gate: Module | None = None,
        resid_lambda: float | None = None,
        x0_lambda: float | None = None,
        backout_extract: bool = False,
        backout_lambda: float | None = None,
        attn_hc=None,
        mlp_hc=None,
        key_layer_scalar: str | None = None,
    ):
        super().__init__(config, key)
        self.layer_idx = layer_idx
        self.attn_norm = attn_norm
        self.attn = attn
        self.attn_post_norm = attn_post_norm
        self.mlp_norm = mlp_norm
        self.mlp = mlp
        self.mlp_post_norm = mlp_post_norm
        self.residual_scale = residual_scale
        # nanochat spaghetti wiring (reference modules/transformer.py
        # _apply_resid_lambda:147, _extract_backout:158, _apply_backout:165,
        # _compute_ve_addend:172): per-layer residual/x0 scalars against the
        # post-embedding hidden x0, a mid-stack extract whose scaled copy is
        # subtracted after the last block, and a sigmoid gate over the first
        # kv_heads channels modulating the value-embedding addend.
        self.ve_gate = ve_gate
        self.resid_lambda = resid_lambda
        self.x0_lambda = x0_lambda
        self.backout_extract = backout_extract
        self.backout_lambda = backout_lambda
        # DeepSeek-V4 mHC: when hyper-connections are present the residual is
        # an (B,S,H,D) stream stack; each site mixes/collapses around its
        # sublayer (reference modules/transformer.py attn_hc/mlp_hc)
        self.attn_hc = attn_hc
        self.mlp_hc = mlp_hc
        # Gemma4: learned scalar on the whole block output (reference
        # transformer.py key_layer_scalar:30)
        self.key_layer_scalar = key_layer_scalar
        self.layer_scalar = None
        self.modules = [
            m
            for m in (attn_norm, attn, attn_post_norm, mlp_norm, mlp,
                      mlp_post_norm, ve_gate, attn_hc, mlp_hc)
            if m is not None
        ]

    def load(self, params: dict) -> None:
        super().load(params)
        if self.key_layer_scalar:
            t = self.config.stc.get_tensor(f"{self.key}.{self.key_layer_scalar}")
            import numpy as _np

            from ..loader.safetensors import bf16_to_f32 as _b2f

            if t.dtype == _np.uint16:
                t = _b2f(t)
            self.layer_scalar = float(t.reshape(-1)[0])

    def forward(self, x, params: dict, ctx: ForwardCtx):
        if self.resid_lambda is not None:
            if self.layer_idx == 0:
                ctx.extras["nc_x0"] = x.astype(jnp.float32)
            xl = (self.resid_lambda * x.astype(jnp.float32)
                  + self.x0_lambda * ctx.extras["nc_x0"])
            x = xl.astype(x.dtype)
        if self.backout_extract:
            ctx.extras["nc_backout"] = x.astype(jnp.float32)
        if self.ve_gate is not None:
            ve = ctx.extras[f"nc_ve_raw.{self.layer_idx}"]  # (B,S,nkv,hd)
            y = x[..., : ve.shape[-2]]
            g = jax.nn.sigmoid(
                self.ve_gate.forward(y, params, ctx).astype(jnp.float32)) * 3.0
            ctx.extras[f"nc_ve.{self.layer_idx}"] = g[..., None] * ve
        if self.attn_hc is not None or self.mlp_hc is not None:
            if self.attn is not None:
                post, comb, y = self.attn_hc.mix(x, params)
                h = y.astype(jnp.bfloat16)
                if self.attn_norm is not None:
                    h = self.attn_norm.forward(h, params, ctx)
                h = self.attn.forward(h, params, ctx)
                x = self.attn_hc.apply(x, h, post, comb)
            if self.mlp is not None:
                post, comb, y = self.mlp_hc.mix(x, params)
                h = y.astype(jnp.bfloat16)
                if self.mlp_norm is not None:
                    h = self.mlp_norm.forward(h, params, ctx)
                h = self.mlp.forward(h, params, ctx)
                x = self.mlp_hc.apply(x, h, post, comb)
            return x
        res = x.astype(jnp.float32)
        if self.attn is not None:
            h = self.attn_norm.forward(x, params, ctx) if self.attn_norm else x
            h = self.attn.forward(h, params, ctx)
            if self.attn_post_norm is not None:
                h = self.attn_post_norm.forward(h, params, ctx)
            res = res + h.astype(jnp.float32) * self.residual_scale
            x = res.astype(x.dtype)
        if self.mlp is not None:
            if getattr(self.mlp, "alt_residual_channel", False):
                # Gemma4 MoE: the routed side reads the pre-norm residual
                ctx.extras["moe_residual"] = x
            h = self.mlp_norm.forward(x, params, ctx) if self.mlp_norm else x
            h = self.mlp.forward(h, params, ctx)
            if self.mlp_post_norm is not None:
                h = self.mlp_post_norm.forward(h, params, ctx)
            res = res + h.astype(jnp.float32) * self.residual_scale
            x = res.astype(x.dtype)
        if self.backout_lambda is not None:
            res = res - self.backout_lambda * ctx.extras["nc_backout"]
            x = res.astype(x.dtype)
        if self.layer_scalar is not None:
            x = (x.astype(jnp.float32) * self.layer_scalar).astype(x.dtype)
        return x


class ParallelDecoderBlock(Module):
    """Cohere-style block: one input norm feeds attention AND the MLP in
    parallel; both outputs add to the residual (reference
    modules/transformer.py ParallelDecoderBlock)."""

    def __init__(self, config, key: str, layer_idx: int, input_norm: Module,
                 attn: Module, mlp: Module):
        super().__init__(config, key)
        self.layer_idx = layer_idx
        self.input_norm = input_norm
        self.attn = attn
        self.mlp = mlp
        self.modules = [input_norm, attn, mlp]

    def forward(self, x, params: dict, ctx: ForwardCtx):
        res = x.astype(jnp.float32)
        h = self.input_norm.forward(x, params, ctx)
        a = self.attn.forward(h, params, ctx)
        m = self.mlp.forward(h, params, ctx)
        res = res + a.astype(jnp.float32) + m.astype(jnp.float32)
        return res.astype(x.dtype)
