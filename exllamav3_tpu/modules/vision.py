"""SigLIP-style vision tower + Gemma3 multimodal projector.

Feature reference: /root/reference/exllamav3/modules/arch_specific/ vision
towers consumed by architecture/gemma3.py (Gemma3ForConditionalGeneration).
Structure (HF key layout):

  vision_tower.vision_model.embeddings.patch_embedding.{weight,bias}
  vision_tower.vision_model.embeddings.position_embedding.weight
  vision_tower.vision_model.encoder.layers.N.{layer_norm1,layer_norm2}
  vision_tower.vision_model.encoder.layers.N.self_attn.{q,k,v,out}_proj
  vision_tower.vision_model.encoder.layers.N.mlp.{fc1,fc2}
  vision_tower.vision_model.post_layernorm
  multi_modal_projector.mm_input_projection_weight
  multi_modal_projector.mm_soft_emb_norm.weight

The tower is bidirectional (no cache, no mask); patches come from a conv
that is expressed as an unfold+matmul so the MXU does the work. The Gemma3
projector average-pools the patch grid down to mm_tokens_per_image, RMS-
normalizes and projects into the text hidden size.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .norms import LayerNorm, RMSNorm
from .mlp import ACT2FN


class VisionEncoderLayer(Module):
    def __init__(self, config, key: str, hidden: int, heads: int,
                 intermediate: int, eps: float, act: str):
        super().__init__(config, key)
        self.hidden = hidden
        self.heads = heads
        self.head_dim = hidden // heads
        self.act = act
        self.ln1 = LayerNorm(config, f"{key}.layer_norm1", eps, dim=hidden)
        self.ln2 = LayerNorm(config, f"{key}.layer_norm2", eps, dim=hidden)
        self.q = Linear(config, f"{key}.self_attn.q_proj", hidden, hidden)
        self.k = Linear(config, f"{key}.self_attn.k_proj", hidden, hidden)
        self.v = Linear(config, f"{key}.self_attn.v_proj", hidden, hidden)
        self.o = Linear(config, f"{key}.self_attn.out_proj", hidden, hidden)
        self.fc1 = Linear(config, f"{key}.mlp.fc1", hidden, intermediate)
        self.fc2 = Linear(config, f"{key}.mlp.fc2", intermediate, hidden)
        self.modules = [self.ln1, self.ln2, self.q, self.k, self.v, self.o,
                        self.fc1, self.fc2]

    def forward(self, x, params: dict, ctx: ForwardCtx):
        B, T, H = x.shape
        h = self.ln1.forward(x, params, ctx)
        q = self.q.forward(h, params, ctx).reshape(B, T, self.heads, self.head_dim)
        k = self.k.forward(h, params, ctx).reshape(B, T, self.heads, self.head_dim)
        v = self.v.forward(h, params, ctx).reshape(B, T, self.heads, self.head_dim)
        scores = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / math.sqrt(self.head_dim)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhst,bthd->bshd", p, v.astype(jnp.float32))
        o = o.reshape(B, T, H).astype(x.dtype)
        x = x + self.o.forward(o, params, ctx)
        h = self.ln2.forward(x, params, ctx)
        h = ACT2FN[self.act](self.fc1.forward(h, params, ctx).astype(jnp.float32))
        x = x + self.fc2.forward(h.astype(x.dtype), params, ctx)
        return x


class SiglipVisionTower(Module):
    def __init__(self, config, key: str = "vision_tower.vision_model",
                 hidden: int = 1152, heads: int = 16, layers: int = 27,
                 intermediate: int = 4304, image_size: int = 896,
                 patch_size: int = 14, eps: float = 1e-6,
                 act: str = "gelu_pytorch_tanh"):
        super().__init__(config, key)
        self.hidden = hidden
        self.image_size = image_size
        self.patch_size = patch_size
        self.patches_per_side = image_size // patch_size
        self.num_patches = self.patches_per_side ** 2
        self.layers = [
            VisionEncoderLayer(config, f"{key}.encoder.layers.{i}", hidden,
                               heads, intermediate, eps, act)
            for i in range(layers)
        ]
        self.post_ln = LayerNorm(config, f"{key}.post_layernorm", eps, dim=hidden)
        self.modules = self.layers + [self.post_ln]

    def load(self, params: dict) -> None:
        super().load(params)
        stc = self.config.stc
        from .gated_delta_net import _get_f32

        pw = _get_f32(stc, f"{self.key}.embeddings.patch_embedding.weight")
        # HF conv weight (D, 3, P, P) -> unfold matmul (P*P*3, D)
        D = pw.shape[0]
        pw = pw.transpose(2, 3, 1, 0).reshape(-1, D)
        p = {
            "patch_w": jnp.asarray(pw, dtype=jnp.bfloat16),
            "patch_b": jnp.asarray(_get_f32(
                stc, f"{self.key}.embeddings.patch_embedding.bias")),
            "pos": jnp.asarray(_get_f32(
                stc, f"{self.key}.embeddings.position_embedding.weight"),
                dtype=jnp.bfloat16),
        }
        params[self.key] = p

    def forward(self, pixels, params: dict, ctx: ForwardCtx):
        """pixels: (B, H, W, 3) f32 normalized. -> (B, num_patches, hidden)."""
        p = params[self.key]
        B, H, W, C = pixels.shape
        P = self.patch_size
        gh, gw = H // P, W // P
        x = pixels.reshape(B, gh, P, gw, P, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, P * P * C)
        x = jnp.dot(x.astype(jnp.bfloat16), p["patch_w"],
                    preferred_element_type=jnp.float32)
        x = (x + p["patch_b"]).astype(jnp.bfloat16)
        x = x + p["pos"][: x.shape[1]]
        for layer in self.layers:
            x = layer.forward(x, params, ctx)
        return self.post_ln.forward(x, params, ctx)


class Gemma3MultimodalProjector(Module):
    """Average-pool the patch grid to mm_tokens_per_image, RMS-norm, project
    to the text hidden size (HF Gemma3MultiModalProjector)."""

    def __init__(self, config, key: str = "multi_modal_projector",
                 vision_hidden: int = 1152, text_hidden: int = 2560,
                 patches_per_side: int = 64, mm_tokens_per_image: int = 256,
                 eps: float = 1e-6):
        super().__init__(config, key)
        self.vision_hidden = vision_hidden
        self.text_hidden = text_hidden
        self.pps = patches_per_side
        self.tokens_per_side = int(math.sqrt(mm_tokens_per_image))
        self.norm = RMSNorm(config, f"{key}.mm_soft_emb_norm", eps,
                            dim=vision_hidden)
        self.modules = [self.norm]

    def load(self, params: dict) -> None:
        super().load(params)
        from .gated_delta_net import _get_f32

        w = _get_f32(self.config.stc, f"{self.key}.mm_input_projection_weight")
        params[self.key] = {"proj": jnp.asarray(w, dtype=jnp.bfloat16)}

    def forward(self, x, params: dict, ctx: ForwardCtx):
        """x: (B, num_patches, vision_hidden) -> (B, mm_tokens, text_hidden)."""
        B, T, D = x.shape
        side = int(math.sqrt(T))
        k = side // self.tokens_per_side
        x = x.reshape(B, side, side, D)
        x = x.reshape(B, self.tokens_per_side, k, self.tokens_per_side, k, D)
        x = jnp.mean(x.astype(jnp.float32), axis=(2, 4))
        x = x.reshape(B, self.tokens_per_side ** 2, D)
        x = self.norm.forward(x, params, ctx)
        return jnp.dot(x.astype(jnp.bfloat16), params[self.key]["proj"],
                       preferred_element_type=jnp.float32)
