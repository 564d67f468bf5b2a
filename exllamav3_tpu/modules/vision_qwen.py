"""Qwen2.5-VL vision tower: ViT with 2D rotary embeddings, windowed
attention (8x8-patch windows, a few full-attention layers) and a 2x2
spatial-merge MLP projector.

Feature reference: /root/reference/exllamav3/modules/arch_specific/
qwen2_5_vl.py and architecture/qwen2_5_vl.py:176 (key_prefix "visual").
HF key layout:

  visual.patch_embed.proj.weight            (D, 3, Tp, P, P) conv
  visual.blocks.N.{norm1,norm2}.weight      RMSNorm
  visual.blocks.N.attn.qkv.{weight,bias}    fused (3D, D)
  visual.blocks.N.attn.proj.{weight,bias}
  visual.blocks.N.mlp.{gate,up,down}_proj   SwiGLU (+biases)
  visual.merger.ln_q.weight
  visual.merger.mlp.{0,2}.{weight,bias}     (4D -> 4D -> out_hidden)

Window partitioning is expressed as an attention mask over window ids
(equivalent to HF's reorder-into-contiguous-windows trick, minus the
permutation). Patches are row-major over the (gh, gw) grid; the merger
groups 2x2 blocks in block-row-major order.
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

NEG_INF = -1e30


class QwenVisionBlock(Module):
    def __init__(self, config, key: str, hidden: int, heads: int,
                 intermediate: int, eps: float):
        super().__init__(config, key)
        self.hidden = hidden
        self.heads = heads
        self.head_dim = hidden // heads
        self.norm1 = RMSNorm(config, f"{key}.norm1", eps, dim=hidden)
        self.norm2 = RMSNorm(config, f"{key}.norm2", eps, dim=hidden)
        self.qkv = Linear(config, f"{key}.attn.qkv", hidden, 3 * hidden)
        self.proj = Linear(config, f"{key}.attn.proj", hidden, hidden)
        self.mlp = GatedMLP(config, f"{key}.mlp", hidden, intermediate,
                            activation="silu")
        self.modules = [self.norm1, self.norm2, self.qkv, self.proj, self.mlp]

    def forward_vision(self, x, params, ctx, sin, cos, win_mask):
        B, T, D = x.shape
        H, hd = self.heads, self.head_dim
        h = self.norm1.forward(x, params, ctx)
        qkv = self.qkv.forward(h, params, ctx).reshape(B, T, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _rope2d(q, sin, cos)
        k = _rope2d(k, sin, cos)
        scores = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / math.sqrt(hd)
        if win_mask is not None:
            scores = jnp.where(win_mask[None, None], scores, NEG_INF)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhst,bthd->bshd", p, v.astype(jnp.float32))
        x = x + self.proj.forward(o.reshape(B, T, D).astype(x.dtype),
                                  params, ctx)
        x = x + self.mlp.forward(self.norm2.forward(x, params, ctx),
                                 params, ctx).astype(x.dtype)
        return x


def _rope2d(x, sin, cos):
    """NEOX-style rotation over the full head_dim with 2D (h|w) frequency
    halves baked into sin/cos (T, head_dim)."""
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    x1, x2 = xf[..., : d // 2], xf[..., d // 2 :]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos[None, :, None, :] + rot * sin[None, :, None, :]).astype(x.dtype)


class Qwen25VisionTower(Module):
    def __init__(self, config, key: str = "visual", depth: int = 32,
                 hidden: int = 1280, heads: int = 16, intermediate: int = 3420,
                 patch_size: int = 14, temporal_patch_size: int = 2,
                 spatial_merge_size: int = 2, window_size: int = 112,
                 fullatt_block_indexes: tuple = (7, 15, 23, 31),
                 out_hidden: int = 3584, eps: float = 1e-6,
                 rope_theta: float = 10000.0):
        super().__init__(config, key)
        self.hidden = hidden
        self.heads = heads
        self.head_dim = hidden // heads
        self.patch_size = patch_size
        self.temporal_patch_size = temporal_patch_size
        self.merge = spatial_merge_size
        self.window_patches = window_size // patch_size  # e.g. 8
        self.fullatt = set(fullatt_block_indexes)
        self.out_hidden = out_hidden
        self.rope_theta = rope_theta
        self.blocks = [
            QwenVisionBlock(config, f"{key}.blocks.{i}", hidden, heads,
                            intermediate, eps)
            for i in range(depth)
        ]
        self.ln_q = RMSNorm(config, f"{key}.merger.ln_q", eps, dim=hidden)
        m = spatial_merge_size ** 2
        self.merge_fc1 = Linear(config, f"{key}.merger.mlp.0", hidden * m,
                                hidden * m)
        self.merge_fc2 = Linear(config, f"{key}.merger.mlp.2", hidden * m,
                                out_hidden)
        self.modules = self.blocks + [self.ln_q, self.merge_fc1, self.merge_fc2]

    def load(self, params: dict) -> None:
        super().load(params)
        from .gated_delta_net import _get_f32

        pw = _get_f32(self.config.stc, f"{self.key}.patch_embed.proj.weight")
        D = pw.shape[0]  # (D, 3, Tp, P, P) -> unfold matmul (Tp*P*P*3, D)
        pw = pw.transpose(2, 3, 4, 1, 0).reshape(-1, D)
        params[self.key] = {"patch_w": jnp.asarray(pw, dtype=jnp.bfloat16)}

    def _sin_cos(self, gh: int, gw: int):
        """2D rotary tables (T, head_dim): first half h-frequencies, second
        half w-frequencies, each duplicated NEOX-style."""
        d4 = self.head_dim // 4
        inv = 1.0 / (self.rope_theta ** (np.arange(d4) / d4))
        hs = np.arange(gh)[:, None] * inv[None]  # (gh, d4)
        ws = np.arange(gw)[:, None] * inv[None]
        fh = np.broadcast_to(hs[:, None, :], (gh, gw, d4))
        fw = np.broadcast_to(ws[None, :, :], (gh, gw, d4))
        freqs = np.concatenate([fh, fw], axis=-1).reshape(gh * gw, 2 * d4)
        emb = np.concatenate([freqs, freqs], axis=-1)  # (T, head_dim)
        return jnp.asarray(np.sin(emb), jnp.float32), jnp.asarray(
            np.cos(emb), jnp.float32)

    def _window_mask(self, gh: int, gw: int):
        wp = self.window_patches
        h_id = np.arange(gh) // wp
        w_id = np.arange(gw) // wp
        wid = (h_id[:, None] * (gw // wp + 1) + w_id[None, :]).reshape(-1)
        return jnp.asarray(wid[:, None] == wid[None, :])

    def forward(self, pixels, params: dict, ctx: ForwardCtx):
        """pixels: (B, H, W, 3) normalized -> (B, mm_tokens, out_hidden)."""
        p = params[self.key]
        B, H, W, C = pixels.shape
        P, Tp = self.patch_size, self.temporal_patch_size
        gh, gw = H // P, W // P
        x = pixels.reshape(B, gh, P, gw, P, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, 1, P * P * C)
        # images replicate along the temporal patch dim (HF convention)
        x = jnp.tile(x, (1, 1, Tp, 1)).reshape(B, gh * gw, Tp * P * P * C)
        x = jnp.dot(x.astype(jnp.bfloat16), p["patch_w"],
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        sin, cos = self._sin_cos(gh, gw)
        win_mask = self._window_mask(gh, gw)
        for i, blk in enumerate(self.blocks):
            mask = None if i in self.fullatt else win_mask
            x = blk.forward_vision(x, params, ctx, sin, cos, mask)

        x = self.ln_q.forward(x, params, ctx)
        m = self.merge
        D = self.hidden
        x = x.reshape(B, gh // m, m, gw // m, m, D)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, (gh // m) * (gw // m),
                                                  m * m * D)
        h = jax.nn.gelu(self.merge_fc1.forward(x, params, ctx))
        return self.merge_fc2.forward(h.astype(jnp.bfloat16), params, ctx)


class Qwen3VLPatchMerger(Module):
    """norm -> (T/m², m²·D) -> fc1 -> gelu(tanh) -> fc2 (reference
    arch_specific/qwen3_vl.py Qwen3VLVisionPatchMerger:197). With
    use_postshuffle_norm the LayerNorm runs over the merged m²·D rows
    (deepstack taps)."""

    def __init__(self, config, key: str, hidden: int, merge: int,
                 out_hidden: int, use_postshuffle_norm: bool = False):
        super().__init__(config, key)
        from .norms import LayerNorm

        self.hidden = hidden
        self.merge = merge
        self.in_size = hidden * merge * merge
        self.use_postshuffle_norm = use_postshuffle_norm
        self.norm = LayerNorm(
            config, f"{key}.norm", eps=1e-6,
            dim=self.in_size if use_postshuffle_norm else hidden)
        self.fc1 = Linear(config, f"{key}.linear_fc1", self.in_size,
                          self.in_size)
        self.fc2 = Linear(config, f"{key}.linear_fc2", self.in_size,
                          out_hidden)
        self.modules = [self.norm, self.fc1, self.fc2]

    def forward_merge(self, x, params, ctx, gh: int, gw: int):
        B, T, D = x.shape
        m = self.merge
        if not self.use_postshuffle_norm:
            x = self.norm.forward(x, params, ctx)
        y = x.reshape(B, gh // m, m, gw // m, m, D)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, (gh // m) * (gw // m), self.in_size)
        if self.use_postshuffle_norm:
            y = self.norm.forward(y, params, ctx)
        h = jax.nn.gelu(self.fc1.forward(y, params, ctx), approximate=True)
        return self.fc2.forward(h.astype(jnp.bfloat16), params, ctx)


class Qwen3VisionTower(Module):
    """Qwen3-VL ViT (reference architecture/qwen3_vl.py Qwen3VLVisionModel:152):
    conv patch embed + bilinear-interpolated learned position embeddings,
    full-attention LayerNorm blocks with non-gated gelu MLPs and fused qkv,
    a final 2x2 patch merger, and deepstack mergers tapping intermediate
    blocks whose outputs are added into the first text layers."""

    def __init__(self, config, key: str = "model.visual", depth: int = 27,
                 hidden: int = 1152, heads: int = 16, intermediate: int = 4304,
                 patch_size: int = 16, temporal_patch_size: int = 2,
                 spatial_merge_size: int = 2, out_hidden: int = 2048,
                 num_position_embeddings: int = 2304,
                 deepstack_visual_indexes: tuple = (8, 16, 24),
                 rope_theta: float = 10000.0, eps: float = 1e-6):
        super().__init__(config, key)
        from .norms import LayerNorm
        from .mlp import MLP

        self.hidden = hidden
        self.heads = heads
        self.head_dim = hidden // heads
        self.patch_size = patch_size
        self.temporal_patch_size = temporal_patch_size
        self.merge = spatial_merge_size
        self.out_hidden = out_hidden
        self.num_pos = num_position_embeddings
        self.grid_side = int(round(num_position_embeddings ** 0.5))
        self.deepstack_indexes = tuple(deepstack_visual_indexes)
        self.rope_theta = rope_theta
        self.blocks = []
        for i in range(depth):
            bk = f"{key}.blocks.{i}"
            blk = Module(config, bk)
            blk.norm1 = LayerNorm(config, f"{bk}.norm1", eps=eps, dim=hidden)
            blk.norm2 = LayerNorm(config, f"{bk}.norm2", eps=eps, dim=hidden)
            blk.qkv = Linear(config, f"{bk}.attn.qkv", hidden, 3 * hidden)
            blk.proj = Linear(config, f"{bk}.attn.proj", hidden, hidden)
            blk.mlp = MLP(config, f"{bk}.mlp", hidden, intermediate,
                          key_up="linear_fc1", key_down="linear_fc2",
                          activation="gelu_pytorch_tanh")
            blk.modules = [blk.norm1, blk.norm2, blk.qkv, blk.proj, blk.mlp]
            self.blocks.append(blk)
        self.merger = Qwen3VLPatchMerger(config, f"{key}.merger", hidden,
                                         spatial_merge_size, out_hidden)
        self.ds_mergers = [
            Qwen3VLPatchMerger(config, f"{key}.deepstack_merger_list.{j}",
                               hidden, spatial_merge_size, out_hidden,
                               use_postshuffle_norm=True)
            for j in range(len(self.deepstack_indexes))
        ]
        self.modules = self.blocks + [self.merger] + self.ds_mergers

    def load(self, params: dict) -> None:
        super().load(params)
        from .gated_delta_net import _get_f32

        pw = _get_f32(self.config.stc, f"{self.key}.patch_embed.proj.weight")
        D = pw.shape[0]
        pw = pw.transpose(2, 3, 4, 1, 0).reshape(-1, D)
        pb = self.config.stc.get_tensor(
            f"{self.key}.patch_embed.proj.bias", optional=True)
        pos = _get_f32(self.config.stc, f"{self.key}.pos_embed.weight")
        params[self.key] = {
            "patch_w": jnp.asarray(pw, jnp.bfloat16),
            "pos": jnp.asarray(pos, jnp.float32),
        }
        if pb is not None:
            params[self.key]["patch_b"] = jnp.asarray(
                pb.astype(np.float32))

    def _pos_embed(self, pos_table, gh: int, gw: int):
        """Bilinear interpolation of the (side², D) learned grid onto
        (gh, gw) (reference fast_pos_embed_interpolate:38), row-major."""
        side = self.grid_side
        hi = np.linspace(0, side - 1, gh)
        wi = np.linspace(0, side - 1, gw)
        h0, w0 = hi.astype(int), wi.astype(int)
        h1 = np.clip(h0 + 1, None, side - 1)
        w1 = np.clip(w0 + 1, None, side - 1)
        dh, dw = hi - h0, wi - w0
        idx = [
            (h0[:, None] * side + w0[None, :]).reshape(-1),
            (h0[:, None] * side + w1[None, :]).reshape(-1),
            (h1[:, None] * side + w0[None, :]).reshape(-1),
            (h1[:, None] * side + w1[None, :]).reshape(-1),
        ]
        wts = [
            ((1 - dh)[:, None] * (1 - dw)[None, :]).reshape(-1),
            ((1 - dh)[:, None] * dw[None, :]).reshape(-1),
            (dh[:, None] * (1 - dw)[None, :]).reshape(-1),
            (dh[:, None] * dw[None, :]).reshape(-1),
        ]
        out = sum(pos_table[jnp.asarray(ix)] * jnp.asarray(w, jnp.float32)[:, None]
                  for ix, w in zip(idx, wts))
        return out  # (gh*gw, D)

    def _sin_cos(self, gh: int, gw: int):
        d4 = self.head_dim // 4
        inv = 1.0 / (self.rope_theta ** (np.arange(d4) / d4))
        hs = np.arange(gh)[:, None] * inv[None]
        ws = np.arange(gw)[:, None] * inv[None]
        fh = np.broadcast_to(hs[:, None, :], (gh, gw, d4))
        fw = np.broadcast_to(ws[None, :, :], (gh, gw, d4))
        freqs = np.concatenate([fh, fw], axis=-1).reshape(gh * gw, 2 * d4)
        emb = np.concatenate([freqs, freqs], axis=-1)
        return jnp.asarray(np.sin(emb), jnp.float32), jnp.asarray(
            np.cos(emb), jnp.float32)

    def forward(self, pixels, params: dict, ctx: ForwardCtx):
        """pixels (B, H, W, 3) normalized -> (main (B, T_mm, out_hidden),
        deepstack [(B, T_mm, out_hidden)] per tap)."""
        p = params[self.key]
        B, H, W, C = pixels.shape
        P, Tp = self.patch_size, self.temporal_patch_size
        gh, gw = H // P, W // P
        x = pixels.reshape(B, gh, P, gw, P, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, 1, P * P * C)
        x = jnp.tile(x, (1, 1, Tp, 1)).reshape(B, gh * gw, Tp * P * P * C)
        x = jnp.dot(x.astype(jnp.bfloat16), p["patch_w"],
                    preferred_element_type=jnp.float32)
        if "patch_b" in p:
            x = x + p["patch_b"]
        x = (x + self._pos_embed(p["pos"], gh, gw)).astype(jnp.bfloat16)

        sin, cos = self._sin_cos(gh, gw)
        deepstack = []
        for i, blk in enumerate(self.blocks):
            T, D, Hh, hd = gh * gw, self.hidden, self.heads, self.head_dim
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
            if i in self.deepstack_indexes:
                j = self.deepstack_indexes.index(i)
                deepstack.append(self.ds_mergers[j].forward_merge(
                    x, params, ctx, gh, gw))
        main = self.merger.forward_merge(x, params, ctx, gh, gw)
        return main, deepstack
