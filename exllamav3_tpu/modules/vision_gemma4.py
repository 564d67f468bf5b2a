"""Gemma4 vision tower: linear patch embedder with separable learned x/y
position embeddings, rotate_dims=2 rope (x/y streams over split head
halves), unit-scale attention with V-norms, k×k average pooling to soft
tokens, and the embed_vision projection into the text width.

Feature reference: /root/reference/exllamav3/architecture/gemma4.py
(Gemma4VisionModel:480) and modules/arch_specific/gemma4.py
(Gemma4VisionPatchEmbedder:10, Gemma4VisionPooler:97). Patches row-major
over the (rows, cols) grid; position ids are (x=col, y=row).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .norms import LayerNorm, RMSNorm, rms_norm


def _neox_half(x, sin, cos):
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[None, :, None, :] + rot * sin[None, :, None, :]


class Gemma4VisionTower(Module):
    def __init__(self, config, key: str = "model.vision_tower",
                 proj_key: str = "model.embed_vision",
                 depth: int = 27, hidden: int = 1152, heads: int = 16,
                 kv_heads: int | None = None, head_dim: int | None = None,
                 intermediate: int = 4304, patch_size: int = 16,
                 pooling_kernel_size: int = 2,
                 position_embedding_size: int = 64,
                 out_hidden: int = 2048, eps: float = 1e-6,
                 text_rms_eps: float = 1e-6,
                 rope_theta: float = 100.0, standardize: bool = False):
        super().__init__(config, key)
        self.hidden = hidden
        self.heads = heads
        self.kv_heads = kv_heads or heads
        self.head_dim = head_dim or hidden // heads
        self.patch_size = patch_size
        self.pool_k = pooling_kernel_size
        self.pos_size = position_embedding_size
        self.out_hidden = out_hidden
        self.rope_theta = rope_theta
        self.standardize = standardize
        self.text_rms_eps = text_rms_eps
        self.input_proj = Linear(config, f"{key}.patch_embedder.input_proj",
                                 3 * patch_size ** 2, hidden)
        self.blocks = []
        for i in range(depth):
            bk = f"{key}.encoder.layers.{i}"
            blk = Module(config, bk)
            blk.attn_norm = RMSNorm(config, f"{bk}.input_layernorm", eps,
                                    dim=hidden)
            blk.attn_post = RMSNorm(config, f"{bk}.post_attention_layernorm",
                                    eps, dim=hidden)
            blk.mlp_norm = RMSNorm(config, f"{bk}.pre_feedforward_layernorm",
                                   eps, dim=hidden)
            blk.mlp_post = RMSNorm(config, f"{bk}.post_feedforward_layernorm",
                                   eps, dim=hidden)
            hd = self.head_dim
            blk.q = Linear(config, f"{bk}.self_attn.q_proj.linear", hidden,
                           heads * hd)
            blk.k = Linear(config, f"{bk}.self_attn.k_proj.linear", hidden,
                           self.kv_heads * hd)
            blk.v = Linear(config, f"{bk}.self_attn.v_proj.linear", hidden,
                           self.kv_heads * hd)
            blk.o = Linear(config, f"{bk}.self_attn.o_proj.linear",
                           heads * hd, hidden)
            blk.q_norm = RMSNorm(config, f"{bk}.self_attn.q_norm", eps,
                                 dim=hd)
            blk.k_norm = RMSNorm(config, f"{bk}.self_attn.k_norm", eps,
                                 dim=hd)
            from .mlp import GatedMLP

            blk.mlp = GatedMLP(config, f"{bk}.mlp", hidden, intermediate,
                               key_up="up_proj.linear",
                               key_gate="gate_proj.linear",
                               key_down="down_proj.linear",
                               activation="gelu")
            blk.modules = [blk.attn_norm, blk.attn_post, blk.mlp_norm,
                           blk.mlp_post, blk.q, blk.k, blk.v, blk.o,
                           blk.q_norm, blk.k_norm, blk.mlp]
            self.blocks.append(blk)
        self.proj = Linear(config, f"{proj_key}.embedding_projection",
                           hidden, out_hidden)
        self.modules = [self.input_proj] + self.blocks + [self.proj]

    def load(self, params: dict) -> None:
        super().load(params)
        from .gated_delta_net import _get_f32

        stc = self.config.stc
        p = {
            "pos": jnp.asarray(_get_f32(
                stc, f"{self.key}.patch_embedder.position_embedding_table"),
                jnp.float32)  # (2, size, D)
        }
        if self.standardize:
            p["std_bias"] = jnp.asarray(
                _get_f32(stc, f"{self.key}.std_bias"), jnp.float32)
            p["std_scale"] = jnp.asarray(
                _get_f32(stc, f"{self.key}.std_scale"), jnp.float32)
        params[self.key] = p

    def _sin_cos_xy(self, rows: int, cols: int):
        """rotate_dims=2 rope: each head half is NEOX-rotated with its own
        stream (x=col first, y=row second); inv_freq over head_dim/2."""
        hd2 = self.head_dim // 2
        inv = 1.0 / (self.rope_theta ** (np.arange(0, hd2, 2) / hd2))
        xs = np.tile(np.arange(cols), rows)[:, None] * inv[None]
        ys = np.repeat(np.arange(rows), cols)[:, None] * inv[None]
        ex = np.concatenate([xs, xs], axis=-1)
        ey = np.concatenate([ys, ys], axis=-1)
        return (jnp.asarray(np.sin(ex), jnp.float32),
                jnp.asarray(np.cos(ex), jnp.float32),
                jnp.asarray(np.sin(ey), jnp.float32),
                jnp.asarray(np.cos(ey), jnp.float32))

    def forward(self, pixels, params: dict, ctx: ForwardCtx):
        """pixels (B, H, W, 3) in [0, 1] -> (B, T/k², out_hidden)."""
        p = params[self.key]
        B, H, W, C = pixels.shape
        P, k = self.patch_size, self.pool_k
        rows, cols = H // P, W // P
        x = pixels.reshape(B, rows, P, cols, P, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, rows * cols, P * P * C)
        x = 2.0 * (x - 0.5)  # reference patch_embedder forward
        x = self.input_proj.forward(x.astype(jnp.bfloat16), params, ctx) \
            .astype(jnp.float32)
        pos_x = np.tile(np.arange(cols), rows)
        pos_y = np.repeat(np.arange(rows), cols)
        x = x + p["pos"][0][jnp.asarray(pos_x)] + p["pos"][1][jnp.asarray(pos_y)]
        x = x.astype(jnp.bfloat16)

        sx, cx, sy, cy = self._sin_cos_xy(rows, cols)
        T, Hh, Hk, hd = rows * cols, self.heads, self.kv_heads, self.head_dim
        for blk in self.blocks:
            h = blk.attn_norm.forward(x, params, ctx)
            q = blk.q.forward(h, params, ctx).reshape(B, T, Hh, hd)
            kk = blk.k.forward(h, params, ctx).reshape(B, T, Hk, hd)
            v = blk.v.forward(h, params, ctx).reshape(B, T, Hk, hd)
            q = blk.q_norm.forward(q, params, ctx)
            kk = blk.k_norm.forward(kk, params, ctx)
            v = rms_norm(v, jnp.ones((hd,), jnp.float32), blk.k_norm.eps)
            hd2 = hd // 2

            def rot(t):
                tf = t.astype(jnp.float32)
                a = _neox_half(tf[..., :hd2], sx, cx)
                b = _neox_half(tf[..., hd2:], sy, cy)
                return jnp.concatenate([a, b], axis=-1)

            q, kk = rot(q), rot(kk)
            G = Hh // Hk
            qg = q.reshape(B, T, Hk, G, hd)
            scores = jnp.einsum("bskgd,btkd->bkgst", qg,
                                kk.astype(jnp.float32))  # sm_scale = 1.0
            pr = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bkgst,btkd->bskgd", pr, v.astype(jnp.float32))
            o = o.reshape(B, T, Hh * hd).astype(x.dtype)
            a = blk.o.forward(o, params, ctx)
            a = blk.attn_post.forward(a, params, ctx)
            x = (x.astype(jnp.float32) + a.astype(jnp.float32)) \
                .astype(jnp.bfloat16)
            m = blk.mlp.forward(blk.mlp_norm.forward(x, params, ctx),
                                params, ctx)
            m = blk.mlp_post.forward(m, params, ctx)
            x = (x.astype(jnp.float32) + m.astype(jnp.float32)) \
                .astype(jnp.bfloat16)

        # k×k average pooling over the patch grid (reference pooler:156)
        D = self.hidden
        y = x.astype(jnp.float32).reshape(B, rows // k, k, cols // k, k, D)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, k * k, D).mean(axis=2)
        y = y * (D ** 0.5)
        if self.standardize:
            y = (y - p["std_bias"]) * p["std_scale"]
        # embed_vision: unweighted gemma norm + projection into text width
        y = y * jax.lax.rsqrt(
            jnp.mean(jnp.square(y), axis=-1, keepdims=True)
            + self.text_rms_eps)
        return self.proj.forward(y.astype(jnp.bfloat16), params, ctx)


class Gemma4UnifiedVisionEmbedder(Module):
    """Gemma4-Unified vision embedder (reference arch_specific/gemma4.py
    Gemma4UnifiedVisionEmbedder:188 + architecture/gemma4.py
    Gemma4UnifiedVisionModel:735): no ViT — patches go through
    LN -> dense -> LN, get separable (x, y) learned position embeddings
    (pos_embedding (max, 2, D): table[x, 0] + table[y, 1]), a position norm,
    then merge into pooling_kernel² groups, an unweighted pre-projection RMS
    and the embed_vision projection into the text width."""

    def __init__(self, config, key: str = "model.vision_embedder",
                 proj_key: str = "model.embed_vision",
                 patch_size: int = 16, mm_embed_dim: int = 1152,
                 output_proj_dims: int | None = None,
                 pooling_kernel_size: int = 2, out_hidden: int = 2048,
                 norm_eps: float = 1e-6):
        super().__init__(config, key)
        self.patch_size = patch_size
        self.patch_dim = 3 * patch_size ** 2
        self.mm_embed_dim = mm_embed_dim
        self.pool_k = pooling_kernel_size
        self.output_proj_dims = output_proj_dims or (
            mm_embed_dim * pooling_kernel_size ** 2)
        self.norm_eps = norm_eps
        self.patch_ln1 = LayerNorm(config, f"{key}.patch_ln1", eps=norm_eps,
                                   dim=self.patch_dim)
        self.patch_dense = Linear(config, f"{key}.patch_dense",
                                  self.patch_dim, mm_embed_dim)
        self.patch_ln2 = LayerNorm(config, f"{key}.patch_ln2", eps=norm_eps,
                                   dim=mm_embed_dim)
        self.pos_norm = LayerNorm(config, f"{key}.pos_norm", eps=norm_eps,
                                  dim=mm_embed_dim)
        self.proj = Linear(config, f"{proj_key}.embedding_projection",
                           self.output_proj_dims, out_hidden)
        self.modules = [self.patch_ln1, self.patch_dense, self.patch_ln2,
                        self.pos_norm, self.proj]

    def load(self, params: dict) -> None:
        super().load(params)
        from .gated_delta_net import _get_f32

        pos = _get_f32(self.config.stc, f"{self.key}.pos_embedding")
        params[self.key] = {"pos": jnp.asarray(pos, jnp.float32)}  # (M, 2, D)

    def forward(self, pixels, params: dict, ctx: ForwardCtx):
        """pixels (B, H, W, 3) normalized -> (B, T/k², text_hidden)."""
        p = params[self.key]
        B, H, W, C = pixels.shape
        P, k = self.patch_size, self.pool_k
        rows, cols = H // P, W // P
        x = pixels.reshape(B, rows, P, cols, P, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, rows * cols, P * P * C).astype(jnp.float32)
        x = self.patch_ln1.forward(x.astype(jnp.bfloat16), params, ctx)
        x = self.patch_dense.forward(x, params, ctx)
        x = self.patch_ln2.forward(x, params, ctx).astype(jnp.float32)
        pos_x = np.tile(np.arange(cols), rows)
        pos_y = np.repeat(np.arange(rows), cols)
        x = x + p["pos"][jnp.asarray(pos_x), 0] + p["pos"][jnp.asarray(pos_y), 1]
        x = self.pos_norm.forward(x.astype(jnp.bfloat16), params, ctx)
        # merge k×k patch blocks into one soft token, block-row-major
        D = self.mm_embed_dim
        y = x.reshape(B, rows // k, k, cols // k, k, D)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, (rows // k) * (cols // k), k * k * D)
        y = y[..., : self.output_proj_dims].astype(jnp.float32)
        y = y * jax.lax.rsqrt(
            jnp.mean(jnp.square(y), axis=-1, keepdims=True) + self.norm_eps)
        return self.proj.forward(y.astype(jnp.bfloat16), params, ctx)
