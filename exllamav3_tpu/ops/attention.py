"""Attention math: dense reference + paged variant.

These are the jnp reference implementations (mask-based, GQA-aware). The
Pallas flash/paged kernels in ops/flash_attention.py replace them on the hot
path; the dispatcher keeps the same signatures so modules don't care.

Feature reference: /root/reference/exllamav3/modules/attention_fn/ (dispatch
across triton/FA2/xformers/SDPA backends — on TPU one family suffices).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import PAGE_SIZE

NEG_INF = -1e30


def _gqa_scores(q, k):
    """q: (B,S,Hq,D), k: (B,T,Hk,D) -> scores (B,Hk,G,S,T) f32."""
    B, S, Hq, D = q.shape
    Hk = k.shape[2]
    G = Hq // Hk
    qg = q.reshape(B, S, Hk, G, D)
    return jnp.einsum(
        "bskgd,btkd->bkgst", qg.astype(jnp.float32), k.astype(jnp.float32)
    )


def attend_dense(
    q,
    k,
    v,
    q_positions,
    k_positions,
    k_valid=None,
    scale: float = 1.0,
    sliding_window: int = 0,
    logit_softcap: float = 0.0,
    sinks=None,
    select_mask=None,
):
    """Masked SDPA. q: (B,S,Hq,D); k: (B,T,Hk,D); v: (B,T,Hk,Dv) — Dv may
    differ from D (MLA attends queries against the latent itself).

    Mask: key j visible to query i iff k_pos[j] <= q_pos[i] (causal over
    absolute positions; stale cache slots have k_pos > q_pos or are excluded
    via k_valid), and within the sliding window when set. select_mask
    (B, S, T) bool further restricts keys per query (DSA top-k selection).
    """
    B, S, Hq, D = q.shape
    Hk = k.shape[2]
    G = Hq // Hk
    scores = _gqa_scores(q, k) * scale  # (B,Hk,G,S,T)
    if logit_softcap:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap

    qp = q_positions[:, None, None, :, None]  # (B,1,1,S,1)
    kp = k_positions[:, None, None, None, :]  # (B,1,1,1,T)
    mask = kp <= qp
    if sliding_window:
        mask &= kp > qp - sliding_window
    if k_valid is not None:
        mask &= k_valid[:, None, None, None, :]
    if select_mask is not None:
        mask &= select_mask[:, None, None, :, :]
    scores = jnp.where(mask, scores, NEG_INF)

    if sinks is not None:
        # per-q-head sink logit joins the softmax denominator (gpt-oss style)
        sink = sinks.reshape(1, Hk, G, 1, 1).astype(jnp.float32)
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sink)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(sink - m)
        p = p / denom
    else:
        p = jax.nn.softmax(scores, axis=-1)

    o = jnp.einsum("bkgst,btkd->bskgd", p, v.astype(jnp.float32))
    return o.reshape(B, S, Hq, v.shape[-1])


def attend_paged(
    q,
    k_pages,
    v_pages,
    block_tables,
    q_positions,
    total_lens,
    scale: float = 1.0,
    sliding_window: int = 0,
    logit_softcap: float = 0.0,
    sinks=None,
    quant_state: dict | None = None,
    k_bits: int = 0,
    v_bits: int = 0,
    compand_a: float = 0.0,
):
    """Paged attention, jnp reference: gather the sequence's pages then run
    dense attention. k_pages: (P, PAGE_SIZE, Hk, D); block_tables: (B, MP).
    With quant_state set, only the gathered pages are dequantized.

    The Pallas kernel (ops/flash_attention.py) streams pages via scalar-
    prefetched block tables instead of materializing the gather.
    """
    B, MP = block_tables.shape
    if quant_state is not None:
        from .kv_quant import dequantize_kv_stored

        merged = quant_state["k_q"].ndim == 3
        hk = (quant_state["k_s"].shape[-1] // (q.shape[-1] // 32)
              if merged else quant_state["k_q"].shape[-2])
        k = dequantize_kv_stored(quant_state["k_q"][block_tables],
                                 quant_state["k_s"][block_tables], k_bits,
                                 hk, merged, compand_a=compand_a)
        v = dequantize_kv_stored(quant_state["v_q"][block_tables],
                                 quant_state["v_s"][block_tables], v_bits,
                                 hk, merged, compand_a=compand_a)
    else:
        k = k_pages[block_tables]  # (B, MP, PAGE_SIZE, Hk, D)
        v = v_pages[block_tables]
    T = MP * PAGE_SIZE
    k = k.reshape(B, T, *k.shape[3:])
    v = v.reshape(B, T, *v.shape[3:])
    k_pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    # exclude never-written slots beyond the true per-row length; padded q
    # rows may park at positions past the real end, so q_positions.max()
    # must not be used as the length
    if total_lens is None:
        total_lens = q_positions.max(axis=-1) + 1  # (B,)
    k_valid = k_pos < total_lens[:, None]
    return attend_dense(
        q, k, v, q_positions, k_pos, k_valid=k_valid, scale=scale,
        sliding_window=sliding_window, logit_softcap=logit_softcap, sinks=sinks,
    )
