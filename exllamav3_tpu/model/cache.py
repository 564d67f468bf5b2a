"""KV cache: functional state holders for jitted forward steps.

Feature reference: /root/reference/exllamav3/cache/cache.py (Cache:93,
CacheLayer:12), cache/fp16.py, cache/quant.py. The reference mutates paged
tensors in place from CUDA kernels; here cache state is an explicit pytree
threaded through the jitted step (donated on the hot path so XLA updates it
in place).

Two layouts:
  * linear: (batch, max_len, kv_heads, head_dim) — slot == token position.
    Used for simple generation and eval.
  * paged: (num_pages, PAGE_SIZE, kv_heads, head_dim) with per-sequence block
    tables — used by the continuous-batching generator (PAGE_SIZE = 256,
    format-compatible with the reference's pagetable semantics).

Quantized variants store int32-packed groups of 32 with fp16 scales
(reference cache/quant.py layout) — see ops/kv_quant.py.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..constants import PAGE_SIZE


@dataclass
class CacheSpec:
    layout: str = "linear"  # "linear" | "paged"
    batch_size: int = 1
    max_len: int = 4096
    num_pages: int = 0
    kv_dtype: str = "bfloat16"
    k_bits: int = 0  # 0 = unquantized; 2..8 = quantized cache
    v_bits: int = 0
    compand_a: float = 0.0  # cubic compander for the quant cache (0 = off)
    # sequence slots for recurrent layer state (GDN/Mamba2). 0 = derive:
    # batch_size for linear layout, 33 (generator max_batch 32 + scrap row)
    # for paged.
    recurrent_slots: int = 0
    # sliding-window layers as fixed-size rolling rings instead of full-
    # length caches (reference modules/sliding_attn.py "recurrent mode";
    # -swa_full flips it off there, opt-in here). Saves window/max_len of
    # the KV memory on SWA layers; disables prefix-cache reuse for them.
    swa_ring: bool = False


def cache_base_shape(spec: CacheSpec, heads: int, dim: int) -> tuple:
    """(N, T, heads, dim) for the spec's layout."""
    if spec.layout == "linear":
        return (spec.batch_size, spec.max_len, heads, dim)
    return (spec.num_pages, PAGE_SIZE, heads, dim)


def cache_dtype(spec: CacheSpec):
    return jnp.bfloat16 if spec.kv_dtype == "bfloat16" else jnp.float32


class Cache:
    """Host-side owner of cache arrays for every attention layer.

    Each cache-user module defines its own layer state via new_cache_layer()
    — per-head K/V for standard attention, a compressed latent for MLA,
    recurrent state for linear-attention layers (the TPU analogue of the
    reference's CacheLayer class hierarchy, cache/cache.py:12)."""

    def __init__(self, model, spec: CacheSpec):
        self.spec = spec
        self.users = [m for m in model.root.walk()
                      if getattr(m, "is_kv_cache_user", False)]
        self.layer_keys = [m.key for m in self.users]
        self.state = self.new_state()

    def new_state(self) -> dict:
        return {m.key: m.new_cache_layer(self.spec) for m in self.users}

    def reset(self):
        self.state = self.new_state()


def linear_cache_update(layer_state: dict, k_new, v_new, positions, k_bits: int = 0,
                        v_bits: int = 0, compand_a: float = 0.0):
    """Scatter (B, S, Hk, D) new keys/values at token positions. Returns the
    updated layer state (functional)."""
    if k_bits:
        from ..ops.kv_quant import quant_cache_update

        return quant_cache_update(layer_state, k_new, v_new, positions,
                                  k_bits, v_bits, compand_a)
    B = k_new.shape[0]
    b_idx = jnp.arange(B)[:, None]
    k = layer_state["k"].at[b_idx, positions].set(k_new.astype(layer_state["k"].dtype))
    v = layer_state["v"].at[b_idx, positions].set(v_new.astype(layer_state["v"].dtype))
    return {"k": k, "v": v}


def paged_cache_update(layer_state: dict, k_new, v_new, positions, block_tables,
                       k_bits: int = 0, v_bits: int = 0, compand_a: float = 0.0):
    """Scatter (B, S, Hk, D) into paged cache. positions: (B, S) token
    positions; block_tables: (B, max_pages) page indices."""
    B, S = positions.shape
    page_slot = positions // PAGE_SIZE  # (B, S) logical page index
    in_page = positions % PAGE_SIZE
    pages = jnp.take_along_axis(block_tables, page_slot, axis=1)  # (B, S)
    if k_bits:
        from ..ops.kv_quant import quantize_kv_stored

        merged = layer_state["k_q"].ndim == 3
        kq, ks = quantize_kv_stored(k_new, k_bits, merged, compand_a)
        vq, vs = quantize_kv_stored(v_new, v_bits, merged, compand_a)
        return {
            "k_q": layer_state["k_q"].at[pages, in_page].set(kq),
            "k_s": layer_state["k_s"].at[pages, in_page].set(ks),
            "v_q": layer_state["v_q"].at[pages, in_page].set(vq),
            "v_s": layer_state["v_s"].at[pages, in_page].set(vs),
        }
    k = layer_state["k"].at[pages, in_page].set(k_new.astype(layer_state["k"].dtype))
    v = layer_state["v"].at[pages, in_page].set(v_new.astype(layer_state["v"].dtype))
    return {"k": k, "v": v}
