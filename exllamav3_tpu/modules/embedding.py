"""Token embedding (feature reference: /root/reference/exllamav3/modules/embedding.py).

Multimodal embedding substitution: token ids >= MM_BASE index into a per-call
extra-embeddings table supplied via ctx.extras["mm_embeddings"].
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .module import Module, ForwardCtx
from ..loader.safetensors import bf16_to_f32

MM_BASE = 1_000_000_000


class Embedding(Module):
    def __init__(self, config, key: str, vocab_size: int, hidden_size: int,
                 scale: float = 1.0, out_dtype=None):
        super().__init__(config, key)
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.scale = scale  # Gemma multiplies by sqrt(hidden_size)
        self.out_dtype = out_dtype

    def load(self, params: dict) -> None:
        w = self.config.stc.get_tensor(self.key + ".weight", allow_bf16=True)
        if w.dtype == np.uint16:
            w = bf16_to_f32(w)
        params[self.key] = {"weight": jnp.asarray(w.astype(np.float32), dtype=jnp.bfloat16)}

    def forward(self, ids, params: dict, ctx: ForwardCtx):
        w = params[self.key]["weight"]
        mm = ctx.extras.get("mm_embeddings")
        if mm is not None and mm.ndim == 3:
            mm = mm[0]  # stacked deepstack layout: row 0 = token embeddings
        if mm is not None:
            # multimodal ids arrive remapped to [vocab, vocab + n_mm) —
            # the host remaps the >= 1e9 dynamic ids (int64) into int32
            # range before feeding the device (generator prefill)
            is_mm = ids >= self.vocab_size
            tok = jnp.where(is_mm, 0, ids)
            x = w[tok]
            mm_idx = jnp.clip(jnp.where(is_mm, ids - self.vocab_size, 0), 0,
                              mm.shape[0] - 1)
            x_mm = mm[mm_idx]
            x = jnp.where(is_mm[..., None], x_mm.astype(x.dtype), x)
        else:
            x = w[ids]
        if self.scale != 1.0:
            x = (x.astype(jnp.float32) * self.scale).astype(x.dtype)
        if self.out_dtype is not None:
            x = x.astype(self.out_dtype)
        return x
