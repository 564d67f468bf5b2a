"""GLM-4V vision tower: ViT with RMSNorm blocks, bicubic-interpolated
learned position embeddings, 2D rope, a spm×spm downsample conv and a gated
merger MLP.

Feature reference: /root/reference/exllamav3/architecture/glm4v.py
(Glm4vVisionModel:~150) and modules/arch_specific/glm4v.py
(Glm4VPosEmbedding:9 — grid_sample bicubic, Glm4VVisionPatchMerger:107).
Patch sequence is merge-block-major (each spm² consecutive patches form one
2D merge block), matching the reference position-id construction; the
bicubic resampling uses static tap indices/weights computed at trace time
(torch grid_sample semantics: A=-0.75 cubic kernel, align_corners=False,
border padding)."""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .norms import RMSNorm, LayerNorm
from .mlp import GatedMLP


def _cubic_w(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution weights for the 4 taps around fractional t."""
    # offsets of taps relative to floor: -1, 0, 1, 2 -> distances
    d = np.stack([t + 1.0, t, 1.0 - t, 2.0 - t])
    ad = np.abs(d)
    w_near = (a + 2) * ad ** 3 - (a + 3) * ad ** 2 + 1
    w_far = a * ad ** 3 - 5 * a * ad ** 2 + 8 * a * ad - 4 * a
    return np.where(ad <= 1, w_near, np.where(ad < 2, w_far, 0.0))


def bicubic_taps(coords: np.ndarray, size: int):
    """Per-coordinate 4-tap (index, weight) arrays for 1D bicubic sampling
    at pixel-space positions with border clamping."""
    x0 = np.floor(coords).astype(int)
    t = coords - x0
    w = _cubic_w(t)  # (4, N)
    idx = np.stack([x0 - 1, x0, x0 + 1, x0 + 2])
    idx = np.clip(idx, 0, size - 1)
    return idx, w


class Glm4vVisionTower(Module):
    def __init__(self, config, key: str = "model.visual", depth: int = 24,
                 hidden: int = 1536, heads: int = 12, intermediate: int = 10944,
                 patch_size: int = 14, temporal_patch_size: int = 2,
                 spatial_merge_size: int = 2, out_hidden: int = 4096,
                 image_size: int = 336, rms_norm_eps: float = 1e-5,
                 rope_theta: float = 10000.0):
        super().__init__(config, key)
        self.hidden = hidden
        self.heads = heads
        self.head_dim = hidden // heads
        self.patch_size = patch_size
        self.temporal_patch_size = temporal_patch_size
        self.merge = spatial_merge_size
        self.out_hidden = out_hidden
        self.grid_side = image_size // patch_size
        self.rope_theta = rope_theta
        self.post_conv_norm = RMSNorm(config, f"{key}.post_conv_layernorm",
                                      rms_norm_eps, dim=hidden)
        self.blocks = []
        for i in range(depth):
            bk = f"{key}.blocks.{i}"
            blk = Module(config, bk)
            blk.norm1 = RMSNorm(config, f"{bk}.norm1", rms_norm_eps,
                                dim=hidden)
            blk.norm2 = RMSNorm(config, f"{bk}.norm2", rms_norm_eps,
                                dim=hidden)
            blk.qkv = Linear(config, f"{bk}.attn.qkv", hidden, 3 * hidden)
            blk.proj = Linear(config, f"{bk}.attn.proj", hidden, hidden)
            blk.mlp = GatedMLP(config, f"{bk}.mlp", hidden, intermediate,
                               activation="silu")
            blk.modules = [blk.norm1, blk.norm2, blk.qkv, blk.proj, blk.mlp]
            self.blocks.append(blk)
        self.post_norm = RMSNorm(config, f"{key}.post_layernorm",
                                 rms_norm_eps, dim=hidden)
        mk = f"{key}.merger"
        self.m_proj = Linear(config, f"{mk}.proj", out_hidden, out_hidden)
        self.m_norm = LayerNorm(config, f"{mk}.post_projection_norm",
                                eps=1e-6, dim=out_hidden)
        self.m_gate = Linear(config, f"{mk}.gate_proj", out_hidden, intermediate)
        self.m_up = Linear(config, f"{mk}.up_proj", out_hidden, intermediate)
        self.m_down = Linear(config, f"{mk}.down_proj", intermediate, out_hidden)
        self.modules = ([self.post_conv_norm] + self.blocks
                        + [self.post_norm, self.m_proj, self.m_norm,
                           self.m_gate, self.m_up, self.m_down])

    def load(self, params: dict) -> None:
        super().load(params)
        from .gated_delta_net import _get_f32

        stc = self.config.stc
        pw = _get_f32(stc, f"{self.key}.patch_embed.proj.weight")
        D = pw.shape[0]
        pw = pw.transpose(2, 3, 4, 1, 0).reshape(-1, D)
        p = {"patch_w": jnp.asarray(pw, jnp.bfloat16)}
        pb = stc.get_tensor(f"{self.key}.patch_embed.proj.bias", optional=True)
        if pb is not None:
            p["patch_b"] = jnp.asarray(pb.astype(np.float32))
        pos = _get_f32(stc, f"{self.key}.embeddings.position_embedding.weight")
        p["pos"] = jnp.asarray(pos, jnp.float32)  # (side², D)
        dw = _get_f32(stc, f"{self.key}.downsample.weight")  # (out, D, m, m)
        p["down_w"] = jnp.asarray(
            dw.transpose(2, 3, 1, 0).reshape(-1, dw.shape[0]), jnp.bfloat16)
        db = stc.get_tensor(f"{self.key}.downsample.bias", optional=True)
        if db is not None:
            p["down_b"] = jnp.asarray(db.astype(np.float32))
        params[self.key] = p

    # -- static per-(gh,gw) geometry -------------------------------------------

    def _coords(self, gh: int, gw: int):
        """Block-major (h, w) patch coordinates (reference glm4v.py pos-id
        construction)."""
        m = self.merge
        h = np.arange(gh)[:, None] * np.ones((1, gw), int)
        w = np.ones((gh, 1), int) * np.arange(gw)[None, :]

        def bm(a):
            return a.reshape(gh // m, m, gw // m, m).transpose(0, 2, 1, 3) \
                .reshape(-1)

        return bm(h), bm(w)

    def _pos_embed(self, pos_table, hc, wc, gh: int, gw: int):
        side = self.grid_side
        # grid_sample pixel mapping, align_corners=False
        ix = (wc + 0.5) * side / gw - 0.5
        iy = (hc + 0.5) * side / gh - 0.5
        xi, xw = bicubic_taps(ix, side)
        yi, yw = bicubic_taps(iy, side)
        out = 0.0
        for r in range(4):
            for c in range(4):
                flat = yi[r] * side + xi[c]
                out = out + pos_table[jnp.asarray(flat)] * jnp.asarray(
                    (yw[r] * xw[c]).astype(np.float32))[:, None]
        return out

    def _sin_cos(self, hc, wc):
        d4 = self.head_dim // 4
        inv = 1.0 / (self.rope_theta ** (np.arange(d4) / d4))
        fh = hc[:, None] * inv[None]
        fw = wc[:, None] * inv[None]
        freqs = np.concatenate([fh, fw], axis=-1)
        emb = np.concatenate([freqs, freqs], axis=-1)
        return jnp.asarray(np.sin(emb), jnp.float32), jnp.asarray(
            np.cos(emb), jnp.float32)

    def forward(self, pixels, params: dict, ctx: ForwardCtx):
        """pixels (B, H, W, 3) normalized -> (B, T/m², out_hidden)."""
        from .vision_qwen import _rope2d

        p = params[self.key]
        B, H, W, C = pixels.shape
        P, Tp, m = self.patch_size, self.temporal_patch_size, self.merge
        gh, gw = H // P, W // P
        # block-major patchification: (bh, bw, i, j) raster
        x = pixels.reshape(B, gh // m, m, P, gw // m, m, P, C)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            B, gh * gw, 1, P * P * C)
        x = jnp.tile(x, (1, 1, Tp, 1)).reshape(B, gh * gw, Tp * P * P * C)
        x = jnp.dot(x.astype(jnp.bfloat16), p["patch_w"],
                    preferred_element_type=jnp.float32)
        if "patch_b" in p:
            x = x + p["patch_b"]
        x = self.post_conv_norm.forward(x.astype(jnp.bfloat16), params, ctx)

        hc, wc = self._coords(gh, gw)
        x = (x.astype(jnp.float32)
             + self._pos_embed(p["pos"], hc, wc, gh, gw)).astype(jnp.bfloat16)
        sin, cos = self._sin_cos(hc.astype(np.float64), wc.astype(np.float64))

        T, D, Hh, hd = gh * gw, self.hidden, self.heads, self.head_dim
        for blk in self.blocks:
            h = blk.norm1.forward(x, params, ctx)
            qkv = blk.qkv.forward(h, params, ctx).reshape(B, T, 3, Hh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q = _rope2d(q, sin, cos)
            k = _rope2d(k, sin, cos)
            scores = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32),
                                k.astype(jnp.float32)) / math.sqrt(hd)
            pr = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bhst,bthd->bshd", pr, v.astype(jnp.float32))
            x = x + blk.proj.forward(o.reshape(B, T, D).astype(x.dtype),
                                     params, ctx).astype(x.dtype)
            x = x + blk.mlp.forward(blk.norm2.forward(x, params, ctx),
                                    params, ctx).astype(x.dtype)

        x = self.post_norm.forward(x, params, ctx)
        # downsample conv: each m² consecutive (block-major) patches -> one
        # output row; (i, j) raster matches the conv kernel layout
        y = x.reshape(B, T // (m * m), m * m * D)
        y = jnp.dot(y.astype(jnp.bfloat16), p["down_w"],
                    preferred_element_type=jnp.float32)
        if "down_b" in p:
            y = y + p["down_b"]
        y = y.astype(jnp.bfloat16)
        # merger: proj -> LN -> gelu(tanh) -> swiglu -> down
        h = self.m_proj.forward(y, params, ctx)
        h = self.m_norm.forward(h, params, ctx)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True) \
            .astype(jnp.bfloat16)
        g = jax.nn.silu(self.m_gate.forward(h, params, ctx).astype(jnp.float32))
        u = self.m_up.forward(h, params, ctx).astype(jnp.float32)
        return self.m_down.forward((g * u).astype(jnp.bfloat16), params, ctx)
