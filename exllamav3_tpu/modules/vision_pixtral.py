"""Pixtral vision tower (Mistral3 / Ministral3): ViT with RMSNorm blocks,
2D rope with interleaved h/w frequency assignment, a 2x2 patch merger and a
two-layer gelu projector.

Feature reference: /root/reference/exllamav3/architecture/mistral3.py
(Mistral3VisionModel:268 — rope table :391, bidirectional attention) and
modules/arch_specific/mistral3.py (Mistral3PatchMerger:9 — F.unfold merge,
channel-major block layout). Patches are row-major; the merger groups each
m×m block channel-major ((D, i, j) flattening) to match the reference's
unfold layout.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .norms import RMSNorm
from .mlp import GatedMLP


class PixtralVisionTower(Module):
    def __init__(self, config, key: str = "vision_tower",
                 mm_key: str = "multi_modal_projector", depth: int = 24,
                 hidden: int = 1024, heads: int = 16, intermediate: int = 4096,
                 patch_size: int = 14, spatial_merge_size: int = 2,
                 out_hidden: int = 5120, eps: float = 1e-5,
                 rope_theta: float = 10000.0):
        super().__init__(config, key)
        self.hidden = hidden
        self.heads = heads
        self.head_dim = hidden // heads
        self.patch_size = patch_size
        self.merge = spatial_merge_size
        self.out_hidden = out_hidden
        self.rope_theta = rope_theta
        self.ln_pre = RMSNorm(config, f"{key}.ln_pre", eps, dim=hidden)
        self.blocks = []
        for i in range(depth):
            bk = f"{key}.transformer.layers.{i}"
            blk = Module(config, bk)
            blk.norm1 = RMSNorm(config, f"{bk}.attention_norm", eps, dim=hidden)
            blk.norm2 = RMSNorm(config, f"{bk}.ffn_norm", eps, dim=hidden)
            blk.q = Linear(config, f"{bk}.attention.q_proj", hidden, hidden)
            blk.k = Linear(config, f"{bk}.attention.k_proj", hidden, hidden)
            blk.v = Linear(config, f"{bk}.attention.v_proj", hidden, hidden)
            blk.o = Linear(config, f"{bk}.attention.o_proj", hidden, hidden)
            blk.mlp = GatedMLP(config, f"{bk}.feed_forward", hidden,
                               intermediate, activation="silu")
            blk.modules = [blk.norm1, blk.norm2, blk.q, blk.k, blk.v, blk.o,
                           blk.mlp]
            self.blocks.append(blk)
        m = spatial_merge_size
        self.mm_norm = RMSNorm(config, f"{mm_key}.norm", eps, dim=hidden)
        self.merging = Linear(config, f"{mm_key}.patch_merger.merging_layer",
                              hidden * m * m, hidden)
        self.mm_fc1 = Linear(config, f"{mm_key}.linear_1", hidden, out_hidden)
        self.mm_fc2 = Linear(config, f"{mm_key}.linear_2", out_hidden,
                             out_hidden)
        self.modules = ([self.ln_pre] + self.blocks
                        + [self.mm_norm, self.merging, self.mm_fc1,
                           self.mm_fc2])

    def load(self, params: dict) -> None:
        super().load(params)
        from .gated_delta_net import _get_f32

        pw = _get_f32(self.config.stc, f"{self.key}.patch_conv.weight")
        D = pw.shape[0]  # (D, 3, P, P)
        params[self.key] = {
            "patch_w": jnp.asarray(pw.transpose(2, 3, 1, 0).reshape(-1, D),
                                   jnp.bfloat16)
        }

    def _sin_cos(self, gh: int, gw: int):
        """Pixtral rope: first head_dim/4 angles h-driven by EVEN frequency
        indices, second w-driven by ODD indices (reference mistral3.py:391)."""
        hd = self.head_dim
        freqs = 1.0 / (self.rope_theta ** (np.arange(0, hd, 2) / hd))
        fh = np.outer(np.arange(gh), freqs[0::2])       # (gh, hd/4)
        fw = np.outer(np.arange(gw), freqs[1::2])       # (gw, hd/4)
        ang = np.concatenate([
            np.broadcast_to(fh[:, None, :], (gh, gw, fh.shape[1])),
            np.broadcast_to(fw[None, :, :], (gh, gw, fw.shape[1])),
        ], axis=-1).reshape(gh * gw, hd // 2)
        emb = np.concatenate([ang, ang], axis=-1)
        return jnp.asarray(np.sin(emb), jnp.float32), jnp.asarray(
            np.cos(emb), jnp.float32)

    def forward(self, pixels, params: dict, ctx: ForwardCtx):
        """pixels (B, H, W, 3) normalized -> (B, T/m², text_hidden)."""
        from .vision_qwen import _rope2d

        p = params[self.key]
        B, H, W, C = pixels.shape
        P, m = self.patch_size, self.merge
        gh, gw = H // P, W // P
        x = pixels.reshape(B, gh, P, gw, P, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, P * P * C)
        x = jnp.dot(x.astype(jnp.bfloat16), p["patch_w"],
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x = self.ln_pre.forward(x, params, ctx)

        sin, cos = self._sin_cos(gh, gw)
        T, D, Hh, hd = gh * gw, self.hidden, self.heads, self.head_dim
        for blk in self.blocks:
            h = blk.norm1.forward(x, params, ctx)
            q = blk.q.forward(h, params, ctx).reshape(B, T, Hh, hd)
            k = blk.k.forward(h, params, ctx).reshape(B, T, Hh, hd)
            v = blk.v.forward(h, params, ctx).reshape(B, T, Hh, hd)
            q = _rope2d(q, sin, cos)
            k = _rope2d(k, sin, cos)
            scores = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32),
                                k.astype(jnp.float32)) / math.sqrt(hd)
            pr = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bhst,bthd->bshd", pr, v.astype(jnp.float32))
            x = x + blk.o.forward(o.reshape(B, T, D).astype(x.dtype),
                                  params, ctx).astype(x.dtype)
            x = x + blk.mlp.forward(blk.norm2.forward(x, params, ctx),
                                    params, ctx).astype(x.dtype)

        x = self.mm_norm.forward(x, params, ctx)
        # merge m×m blocks channel-major ((D, i, j): reference F.unfold)
        y = x.reshape(B, gh // m, m, gw // m, m, D)
        y = y.transpose(0, 1, 3, 5, 2, 4).reshape(
            B, (gh // m) * (gw // m), D * m * m)
        y = self.merging.forward(y, params, ctx)
        h = jax.nn.gelu(self.mm_fc1.forward(y, params, ctx).astype(jnp.float32),
                        approximate=False).astype(jnp.bfloat16)
        return self.mm_fc2.forward(h, params, ctx)
