"""Deepstack embedding injection (Qwen3-VL / Qwen3.5-VL).

Feature reference: /root/reference/exllamav3/modules/arch_specific/
qwen3_vl.py (DeepstackEmbed:136). The vision tower taps intermediate block
outputs, merges them to text width, and the first N text layers ADD the
tap rows to the hidden state at the image-token positions. The rows ride
in the stacked mm_embeddings table (row 1 + tap index; row 0 is the token
embedding table)."""
from __future__ import annotations

import jax.numpy as jnp

from .module import Module, ForwardCtx


class DeepstackEmbed(Module):
    def __init__(self, config, key: str, deepstack_index: int,
                 vocab_size: int):
        super().__init__(config, key)
        self.deepstack_index = deepstack_index
        self.vocab_size = vocab_size

    def forward(self, x, params: dict, ctx: ForwardCtx):
        mm = ctx.extras.get("mm_embeddings")
        if mm is None or mm.ndim != 3 or \
                mm.shape[0] <= 1 + self.deepstack_index:
            return x
        ids = ctx.extras.get("input_ids")
        if ids is None:
            return x
        is_mm = ids >= self.vocab_size
        idx = jnp.clip(jnp.where(is_mm, ids - self.vocab_size, 0), 0,
                       mm.shape[1] - 1)
        add = mm[1 + self.deepstack_index][idx]
        return x + jnp.where(is_mm[..., None], add, 0.0).astype(x.dtype)
