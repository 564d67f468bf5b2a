"""Multimodal embeddings: dynamic token IDs and payload container.

Feature reference: /root/reference/exllamav3/tokenizer/mm_embedding.py
(MMTokenAllocator:9 — dynamic ids from 1e9; MMEmbedding:24 — embeddings +
token alias + metadata). Token ids >= MM_BASE index the per-call embedding
table the Embedding module substitutes (modules/embedding.py).
"""
from __future__ import annotations

import numpy as np

FIRST_MM_EMBEDDING_INDEX = 1_000_000_000


class MMTokenAllocator:
    def __init__(self):
        self.next_token_index = FIRST_MM_EMBEDDING_INDEX

    def allocate(self, num_tokens: int) -> int:
        idx = self.next_token_index
        self.next_token_index += num_tokens
        return idx


global_allocator = MMTokenAllocator()


class MMEmbedding:
    """One multimodal payload (image etc.): embeddings plus the dynamic
    token ids that reference them."""

    def __init__(self, embeddings: np.ndarray, text_alias: str | None = None,
                 metadata: dict | None = None, deepstack: list | None = None):
        self.embeddings = np.asarray(embeddings)
        self.mm_length = int(self.embeddings.shape[0])
        self.text_alias = text_alias
        self.metadata = metadata or {}
        # Qwen3-VL deepstack: per-tap feature rows ADDED to the hidden state
        # at this payload's token positions in the first len(deepstack) text
        # layers (reference arch_specific/qwen3_vl.py DeepstackEmbed:136)
        self.deepstack = ([np.asarray(d) for d in deepstack]
                          if deepstack else None)
        self.first_index = global_allocator.allocate(self.mm_length)
        self.last_index = self.first_index + self.mm_length

    @property
    def token_ids(self) -> np.ndarray:
        return np.arange(self.first_index, self.last_index, dtype=np.int64)


def build_mm_table(embeddings: list, hidden_size: int,
                   pad_to: int | None = None):
    """Dense (N, hidden) table + base index for a list of MMEmbedding, in
    dynamic-id order, for ctx.extras["mm_embeddings"]. IDs must be offset by
    the FIRST embedding's first_index before lookup."""
    if not embeddings:
        return None, 0
    base = min(e.first_index for e in embeddings)
    end = max(e.last_index for e in embeddings)
    n = end - base
    n_ds = max((len(e.deepstack) if e.deepstack else 0) for e in embeddings)
    if n_ds:
        # stacked layout: row 0 = token embeddings, rows 1.. = deepstack taps
        table = np.zeros((1 + n_ds, pad_to or n, hidden_size), np.float32)
        for e in embeddings:
            table[0, e.first_index - base : e.last_index - base] = e.embeddings
            for j, d in enumerate(e.deepstack or ()):
                table[1 + j, e.first_index - base : e.last_index - base] = d
        return table, base
    table = np.zeros((pad_to or n, hidden_size), dtype=np.float32)
    for e in embeddings:
        table[e.first_index - base : e.last_index - base] = e.embeddings
    return table, base
