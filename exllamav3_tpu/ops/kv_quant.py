"""Quantized KV cache: 2-8 bit pack/dequant with per-32-group scales.

Feature reference: /root/reference/exllamav3/cache/quant.py (32-element
groups, independent K/V bit-widths) and exllamav3_ext/cache/q_cache.cu.
TPU-native layout: values pack into int32 words along head_dim (32/bits
values per word), scales are f32 per (token, head, group-of-32). All pure
jnp — XLA fuses the pack into the cache-update scatter and the unpack into
the attention prologue; the Pallas paged-attention kernel dequantizes
in-kernel for the fused path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

GROUP = 32


def _qmid(bits: int) -> float:
    # symmetric offset grid using all 2^bits levels: q in [0, 2^bits-1],
    # value = (q - mid) * scale with mid = (2^bits - 1) / 2
    return ((1 << bits) - 1) / 2.0


def quantize_kv(x: jnp.ndarray, bits: int):
    """x: (..., D) f32/bf16 -> (packed (..., D*bits/32) int32, scale (..., D/32) f32).

    Per-group offset-grid quantization using all 2^bits levels:
    q = round(x/scale + mid) in [0, 2^bits-1], value = (q - mid) * scale.
    """
    D = x.shape[-1]
    assert D % GROUP == 0
    g = D // GROUP
    mid = _qmid(bits)
    xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (g, GROUP))
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = amax / mid + 1e-12
    qb = jnp.clip(jnp.round(xf / scale + mid), 0, (1 << bits) - 1).astype(jnp.uint32)
    # pack the 32 values of each group as a continuous little-endian bit
    # stream into `bits` uint32 words (fields may straddle word boundaries)
    words = [jnp.zeros(x.shape[:-1] + (g,), dtype=jnp.uint32) for _ in range(bits)]
    for i in range(GROUP):
        q = qb[..., i]
        off = i * bits
        w0, sh = off // 32, off % 32
        words[w0] = words[w0] | (q << sh)
        if sh + bits > 32:
            words[w0 + 1] = words[w0 + 1] | (q >> (32 - sh))
    packed = jnp.stack(words, axis=-1).astype(jnp.int32)  # (..., g, bits)
    packed = packed.reshape(x.shape[:-1] + (D * bits // 32,))
    return packed, scale.reshape(x.shape[:-1] + (g,))


def dequantize_kv(words: jnp.ndarray, scale: jnp.ndarray, bits: int, dtype=jnp.bfloat16):
    """Inverse of quantize_kv -> (..., D)."""
    nwords = words.shape[-1]
    D = nwords * 32 // bits
    g = D // GROUP
    w = words.astype(jnp.uint32).reshape(words.shape[:-1] + (g, bits))
    mask = jnp.uint32((1 << bits) - 1)
    fields = []
    for i in range(GROUP):
        off = i * bits
        w0, sh = off // 32, off % 32
        f = w[..., w0] >> sh
        if sh + bits > 32:
            f = f | (w[..., w0 + 1] << (32 - sh))
        fields.append(f & mask)
    q = jnp.stack(fields, axis=-1).astype(jnp.float32) - _qmid(bits)
    x = q * scale[..., None]
    return x.reshape(words.shape[:-1] + (D,)).astype(dtype)


def quant_cache_shapes(shape: tuple, k_bits: int, v_bits: int) -> dict:
    """Zero-initialized quantized layer state for cache shape (N, T, Hk, D)."""
    n, t, hk, d = shape
    return {
        "k_q": jnp.zeros((n, t, hk, d * k_bits // 32), dtype=jnp.int32),
        "k_s": jnp.zeros((n, t, hk, d // GROUP), dtype=jnp.float32),
        "v_q": jnp.zeros((n, t, hk, d * v_bits // 32), dtype=jnp.int32),
        "v_s": jnp.zeros((n, t, hk, d // GROUP), dtype=jnp.float32),
    }


def quant_cache_update(layer_state: dict, k_new, v_new, positions, k_bits: int, v_bits: int):
    """Scatter quantized (B, S, Hk, D) at token positions (linear layout)."""
    B = k_new.shape[0]
    b_idx = jnp.arange(B)[:, None]
    kq, ks = quantize_kv(k_new, k_bits)
    vq, vs = quantize_kv(v_new, v_bits)
    return {
        "k_q": layer_state["k_q"].at[b_idx, positions].set(kq),
        "k_s": layer_state["k_s"].at[b_idx, positions].set(ks),
        "v_q": layer_state["v_q"].at[b_idx, positions].set(vq),
        "v_s": layer_state["v_s"].at[b_idx, positions].set(vs),
    }


def quant_cache_fetch(layer_state: dict, k_bits: int, v_bits: int, dtype=jnp.bfloat16):
    """Dequantize the whole layer -> (k, v) full tensors."""
    k = dequantize_kv(layer_state["k_q"], layer_state["k_s"], k_bits, dtype)
    v = dequantize_kv(layer_state["v_q"], layer_state["v_s"], v_bits, dtype)
    return k, v
