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
                 metadata: dict | None = None, deepstack: list | None = None,
                 grid_thw: tuple | None = None, mrope_merge_size: int = 2,
                 token_string: list | None = None):
        self.embeddings = np.asarray(embeddings)
        self.mm_length = int(self.embeddings.shape[0])
        self.text_alias = text_alias
        self.metadata = metadata or {}
        # interleaved layout (reference mm_embedding.py token_string): a
        # list of literal token ids with -1 marking embedding slots, e.g.
        # Step-3.7's <patch_start> [-1 x patch_token_len] <patch_end> runs.
        # token_ids substitutes the dynamic ids into the -1 positions.
        if token_string is not None:
            n_slots = sum(1 for t in token_string if t == -1)
            assert n_slots == self.mm_length, \
                f"token_string has {n_slots} slots for {self.mm_length} rows"
        self.token_string = token_string
        # Qwen3-VL deepstack: per-tap feature rows ADDED to the hidden state
        # at this payload's token positions in the first len(deepstack) text
        # layers (reference arch_specific/qwen3_vl.py DeepstackEmbed:136)
        self.deepstack = ([np.asarray(d) for d in deepstack]
                          if deepstack else None)
        # MRoPE: the image's (t, h, w) patch grid and spatial merge size,
        # used to build the 3 position streams for this payload's tokens
        self.grid_thw = tuple(grid_thw) if grid_thw else None
        self.mrope_merge_size = mrope_merge_size
        self.first_index = global_allocator.allocate(self.mm_length)
        self.last_index = self.first_index + self.mm_length

    @property
    def token_ids(self) -> np.ndarray:
        if self.token_string is None:
            return np.arange(self.first_index, self.last_index,
                             dtype=np.int64)
        out = np.asarray(self.token_string, dtype=np.int64)
        out[out == -1] = np.arange(self.first_index, self.last_index,
                                   dtype=np.int64)
        return out


def mrope_position_streams(ids: np.ndarray, embeddings: list,
                           start_value: int = 0) -> tuple:
    """(t, h, w) rope position streams for one prompt (HF
    get_rope_index semantics, reference generator mrope handling): text
    tokens advance all three streams together; an image span with llm grid
    (t, h, w) sets stream values st+t_idx / st+h_idx / st+w_idx and the
    running value continues at st + max(grid) afterwards. Returns
    ((S, 3) int32 streams, delta) where delta = next_value - len(ids) is
    the constant decode-time offset."""
    by_id = {}
    for e in embeddings or ():
        if e.grid_thw:
            by_id[e.first_index] = e
    S = len(ids)
    out = np.zeros((S, 3), np.int64)
    run = start_value
    i = 0
    while i < S:
        tok = int(ids[i])
        e = by_id.get(tok)
        if e is not None:
            m = e.mrope_merge_size
            t, h, w = e.grid_thw
            lh, lw = h // m, w // m
            n = t * lh * lw
            ti = np.repeat(np.arange(t), lh * lw)
            hi = np.tile(np.repeat(np.arange(lh), lw), t)
            wi = np.tile(np.arange(lw), t * lh)
            out[i : i + n, 0] = run + ti
            out[i : i + n, 1] = run + hi
            out[i : i + n, 2] = run + wi
            run = run + max(t, lh, lw)
            i += n
        else:
            out[i] = run
            run += 1
            i += 1
    return out.astype(np.int32), int(run - S)


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
