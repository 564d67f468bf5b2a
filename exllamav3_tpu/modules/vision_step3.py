"""Step-3.7 vision tower: CLIP-style ViT (LayerNorms, fused in_proj,
quick-gelu MLP, per-block LayerScale gammas), optional 2D GPTJ rope with a
rescaled theta, bilinear-resampled absolute position embeddings, a two-conv
stride-2 downsampler and a linear projector into the text width.

Feature reference: /root/reference/exllamav3/architecture/step3_7.py
(Step3_7VisionModel) and modules/arch_specific/step3_7.py
(Step3_7Downsampler:12, Step3_7PosEmbedding:113); rope grid:
architecture/mm_processing/step3_7.py:144 (w-freqs first, then h-freqs,
GPTJ interleave)."""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .norms import LayerNorm


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _gptj_rot(x, sin, cos):
    """GPTJ interleaved rotation over the full head_dim; sin/cos (T, hd/2)."""
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., 0::2], xf[..., 1::2]
    s = sin[None, :, None, :]
    c = cos[None, :, None, :]
    o1 = x1 * c - x2 * s
    o2 = x2 * c + x1 * s
    return jnp.stack([o1, o2], axis=-1).reshape(xf.shape).astype(x.dtype)


class Step3VisionTower(Module):
    def __init__(self, config, key: str = "model.vision_model",
                 projector_key: str = "model.vit_large_projector",
                 depth: int = 63, width: int = 1792, heads: int = 16,
                 mlp_ratio: float = 8960 / 1536, patch_size: int = 14,
                 image_size: int = 728, out_hidden: int = 4096,
                 eps: float = 1e-5, use_rope2d: bool = True,
                 rope_theta: float = 10000.0,
                 rope_theta_rescale: float = 1.0,
                 ls_init: float = 0.1):
        super().__init__(config, key)
        self.width = width
        self.heads = heads
        self.head_dim = width // heads
        self.patch_size = patch_size
        self.base_grid = image_size // patch_size
        self.out_hidden = out_hidden
        self.use_rope2d = use_rope2d
        hd = self.head_dim
        # reference step3_7.py: theta * rescale ** (hd / (hd - 2))
        self.rope_theta = rope_theta * rope_theta_rescale ** (hd / (hd - 2))
        self.ln_pre = LayerNorm(config, f"{key}.ln_pre", eps=eps, dim=width)
        self.blocks = []
        interm = int(width * mlp_ratio)
        for i in range(depth):
            bk = f"{key}.transformer.resblocks.{i}"
            blk = Module(config, bk)
            blk.ln_1 = LayerNorm(config, f"{bk}.ln_1", eps=eps, dim=width)
            blk.ln_2 = LayerNorm(config, f"{bk}.ln_2", eps=eps, dim=width)
            blk.in_proj = Linear(config, f"{bk}.attn.in_proj", width,
                                 3 * width)
            blk.out_proj = Linear(config, f"{bk}.attn.out_proj", width, width)
            blk.c_fc = Linear(config, f"{bk}.mlp.c_fc", width, interm)
            blk.c_proj = Linear(config, f"{bk}.mlp.c_proj", interm, width)
            blk.modules = [blk.ln_1, blk.ln_2, blk.in_proj, blk.out_proj,
                           blk.c_fc, blk.c_proj]
            self.blocks.append(blk)
        self.projector = Linear(config, projector_key, width * 4, out_hidden)
        self.modules = [self.ln_pre] + self.blocks + [self.projector]

    def load(self, params: dict) -> None:
        super().load(params)
        from .gated_delta_net import _get_f32

        stc = self.config.stc
        pw = _get_f32(stc, f"{self.key}.conv1.weight")  # (W, 3, P, P)
        D = pw.shape[0]
        p = {"patch_w": jnp.asarray(pw.transpose(2, 3, 1, 0).reshape(-1, D),
                                    jnp.bfloat16)}
        pb = stc.get_tensor(f"{self.key}.conv1.bias", optional=True)
        if pb is not None:
            p["patch_b"] = jnp.asarray(pb.astype(np.float32))
        p["pos"] = jnp.asarray(
            _get_f32(stc, f"{self.key}.positional_embedding"), jnp.float32)
        for tag in ("1", "2"):
            p[f"ds_w{tag}"] = jnp.asarray(_get_f32(
                stc, f"{self.key}.vit_downsampler{tag}.weight"), jnp.bfloat16)
            b = stc.get_tensor(f"{self.key}.vit_downsampler{tag}.bias",
                               optional=True)
            if b is not None:
                p[f"ds_b{tag}"] = jnp.asarray(b.astype(np.float32))
        # per-block LayerScale gammas
        for blk in self.blocks:
            for tag in ("ls_1", "ls_2"):
                g = _get_f32(stc, f"{blk.key}.{tag}.gamma")
                p[f"{blk.key}.{tag}"] = jnp.asarray(g, jnp.float32)
        params[self.key] = p

    def _pos_embed(self, table, gh: int, gw: int):
        """Bilinear resample of the (base², W) table onto (gh, gw)."""
        side = self.base_grid
        if (gh, gw) == (side, side):
            return table
        t2 = table.reshape(side, side, -1)

        def taps(n, size):
            c = (np.arange(n) + 0.5) * size / n - 0.5
            i0 = np.clip(np.floor(c).astype(int), 0, size - 1)
            i1 = np.clip(i0 + 1, 0, size - 1)
            f = np.clip(c - i0, 0.0, 1.0)
            return i0, i1, f.astype(np.float32)

        y0, y1, fy = taps(gh, side)
        x0, x1, fx = taps(gw, side)
        a = t2[jnp.asarray(y0)][:, jnp.asarray(x0)]
        b = t2[jnp.asarray(y0)][:, jnp.asarray(x1)]
        c = t2[jnp.asarray(y1)][:, jnp.asarray(x0)]
        d = t2[jnp.asarray(y1)][:, jnp.asarray(x1)]
        fx = jnp.asarray(fx)[None, :, None]
        fy = jnp.asarray(fy)[:, None, None]
        out = (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
               + c * (1 - fx) * fy + d * fx * fy)
        return out.reshape(gh * gw, -1)

    def _sin_cos(self, gh: int, gw: int):
        """2D GPTJ rope: first hd/4 angle channels w-driven, then h-driven
        (reference mm_processing/step3_7.py:158 swaps (h, w) -> (w, h))."""
        hd2 = self.head_dim // 2
        inv = 1.0 / (self.rope_theta ** (np.arange(0, hd2, 2) / hd2))
        hs = np.repeat(np.arange(gh), gw)[:, None] * inv[None]
        ws = np.tile(np.arange(gw), gh)[:, None] * inv[None]
        ang = np.concatenate([ws, hs], axis=-1)  # (T, hd/2)
        return jnp.asarray(np.sin(ang), jnp.float32), jnp.asarray(
            np.cos(ang), jnp.float32)

    def forward(self, pixels, params: dict, ctx: ForwardCtx):
        """pixels (B, H, W, 3) normalized -> (B, (g/4)², text_hidden)."""
        p = params[self.key]
        B, H, W, C = pixels.shape
        P = self.patch_size
        gh, gw = H // P, W // P
        x = pixels.reshape(B, gh, P, gw, P, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, P * P * C)
        x = jnp.dot(x.astype(jnp.bfloat16), p["patch_w"],
                    preferred_element_type=jnp.float32)
        if "patch_b" in p:
            x = x + p["patch_b"]
        x = (x + self._pos_embed(p["pos"], gh, gw)).astype(jnp.bfloat16)
        x = self.ln_pre.forward(x, params, ctx)

        sin, cos = self._sin_cos(gh, gw) if self.use_rope2d else (None, None)
        T, D, Hh, hd = gh * gw, self.width, self.heads, self.head_dim
        for blk in self.blocks:
            h = blk.ln_1.forward(x, params, ctx)
            qkv = blk.in_proj.forward(h, params, ctx).reshape(B, T, 3, Hh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if self.use_rope2d:
                q = _gptj_rot(q, sin, cos)
                k = _gptj_rot(k, sin, cos)
            scores = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32),
                                k.astype(jnp.float32)) / math.sqrt(hd)
            pr = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bhst,bthd->bshd", pr, v.astype(jnp.float32))
            a = blk.out_proj.forward(o.reshape(B, T, D).astype(x.dtype),
                                     params, ctx)
            x = x + (a.astype(jnp.float32)
                     * p[f"{blk.key}.ls_1"]).astype(x.dtype)
            m = _quick_gelu(blk.c_fc.forward(blk.ln_2.forward(x, params, ctx),
                                             params, ctx).astype(jnp.float32))
            m = blk.c_proj.forward(m.astype(jnp.bfloat16), params, ctx)
            x = x + (m.astype(jnp.float32)
                     * p[f"{blk.key}.ls_2"]).astype(x.dtype)

        # two 3x3 stride-2 convs over the (gh, gw) grid
        y = x.astype(jnp.bfloat16).reshape(B, gh, gw, D)
        for tag in ("1", "2"):
            w = p[f"ds_w{tag}"]  # (out, in, 3, 3)
            y = jax.lax.conv_general_dilated(
                y, jnp.transpose(w, (2, 3, 1, 0)).astype(jnp.bfloat16),
                window_strides=(2, 2), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            if f"ds_b{tag}" in p:
                y = y + p[f"ds_b{tag}"]
            y = y.astype(jnp.bfloat16)
        y = y.reshape(B, -1, y.shape[-1])
        return self.projector.forward(y, params, ctx)
