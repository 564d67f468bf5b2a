"""Value embeddings (nanochat): per-layer token-indexed V addends.

Feature reference: /root/reference/exllamav3/modules/value_embeddings.py
(ValueEmbeddings:12) and architecture/nanochat.py. The reference keeps these
tables CPU-resident and streams per-layer lookups to the GPU; on TPU the
tables live in HBM with the rest of the params and the lookups are plain
gathers XLA schedules alongside the embedding — the module runs once, before
the token embedding, and stashes every target layer's (B, S, kv_heads,
head_dim) lookup in ctx.extras for the blocks to gate and add to V.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .module import Module, ForwardCtx


class ValueEmbeddings(Module):
    def __init__(self, config, key: str, target_layers: list[int],
                 vocab_size: int, kv_head_dim: int, num_kv_heads: int):
        super().__init__(config, key)
        self.target_layers = list(target_layers)
        self.vocab_size = vocab_size
        self.kv_head_dim = kv_head_dim
        self.num_kv_heads = num_kv_heads

    def load(self, params: dict) -> None:
        from ..loader.safetensors import bf16_to_f32

        for li in self.target_layers:
            w = self.config.stc.get_tensor(f"{self.key}.{li}.weight",
                                           allow_bf16=True)
            if w.dtype == np.uint16:
                w = bf16_to_f32(w)
            params[f"{self.key}.{li}"] = {
                "weight": jnp.asarray(w.astype(np.float32), jnp.bfloat16)
            }

    def forward(self, x, params: dict, ctx: ForwardCtx):
        """x: (B, S) int32 token ids (this module sits BEFORE the token
        embedding). Returns ids unchanged; lookups go to ctx.extras."""
        for li in self.target_layers:
            w = params[f"{self.key}.{li}"]["weight"]
            ve = jnp.take(w, x, axis=0)  # (B, S, kv_dim)
            ctx.extras[f"nc_ve_raw.{li}"] = ve.reshape(
                x.shape + (self.num_kv_heads, self.kv_head_dim)
            ).astype(jnp.float32)
        return x
