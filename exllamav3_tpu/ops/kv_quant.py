"""Quantized KV cache: 2-8 bit pack/dequant with per-32-group scales.

Feature reference: /root/reference/exllamav3/cache/quant.py and
exllamav3_ext/cache/q_cache_kernels.cuh (+ lmq.cuh): each group of 32
channels is rotated by a normalized H32 Hadamard (regularizes toward
Gaussian), scaled to [-1, 1] by its absmax (stored as one scale per group),
then quantized to num_bits on the MIDPOINT grid — centroids at
((2q+1)/2^bits - 1), ~5% lower MSE than the rounding grid — or through the
cubic compander f(t) = a*t + (1-a)*t^3 when compand_a > 0 (encode solves
the cubic by Cardano's formula).

TPU-native twists:
  * values pack into int32 words along the channel dim (32/bits per word) so
    single-token scatters never straddle other tokens' bits.
  * the H32 rotation is FREE at attention time: scores are rotation-
    invariant (q is rotated once outside the kernel), and V's rotation is
    undone on the attention OUTPUT (activation-sized) — where the reference
    unrotates inside its dequant kernel, the TPU kernel consumes rotated
    values directly (ops/flash_attention.py).
  * scales store as bf16 (payload overhead 12.5% at 4 bits instead of 25%).

All pure jnp — XLA fuses the pack into the cache-update scatter; the Pallas
attention kernel dequantizes in-kernel for the fused path.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

GROUP = 32
COMPAND_A = 0.65  # cubic coefficient when companding is enabled

# Odd bit-widths decompose into power-of-2 BIT PLANES (largest first,
# holding the value's LOW bits): each plane packs word-aligned on its own,
# so the in-kernel repeat-widen + one-variable-shift unpack that serves
# 2/4/8 bits extends to 3/5/6/7 with one pass per plane — the TPU answer
# to the reference's two-word funnel-shift extraction for fields that
# straddle word boundaries (q_cache_kernels.cuh). Planes store values in
# the KERNEL'S lane order (channel_perm of the largest plane) so the
# combined nibbles land aligned without any in-kernel permutation.
ODD_PLANES = {3: (2, 1), 5: (4, 1), 6: (4, 2), 7: (4, 2, 1)}


def plane_max(bits: int) -> int:
    """Layout-defining plane width: bits itself when word-aligned."""
    return ODD_PLANES[bits][0] if bits in ODD_PLANES else bits


@functools.lru_cache(maxsize=None)
def lane_perm(D: int, bits: int) -> tuple:
    """(perm, inv): lane p of the kernel's unpack holds channel perm[p].
    Derived from the repeat-widen pattern of the largest plane pb:
    lane p = j*gw + group*pb + w  ->  channel 32*group + w*(32//pb) + j.
    Matches ops/flash_attention.channel_perm for even bits."""
    pb = plane_max(bits)
    J = 32 // pb
    g = D // 32
    perm = np.empty((D,), np.int32)
    p = 0
    for j in range(J):
        for group in range(g):
            for w in range(pb):
                perm[p] = 32 * group + w * J + j
                p += 1
    inv = np.empty_like(perm)
    inv[perm] = np.arange(D, dtype=np.int32)
    return perm, inv


@functools.lru_cache(maxsize=None)
def _h32n() -> np.ndarray:
    """Normalized symmetric 32-point Hadamard (H @ H = I)."""
    from ..quant.hadamard import hadamard_np

    return (hadamard_np(32) / math.sqrt(32.0)).astype(np.float32)


def _rotate_groups(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """(..., D) -> per-32-group H32 rotation (symmetric: inverse == forward)."""
    D = x.shape[-1]
    g = D // GROUP
    h = jnp.asarray(_h32n())
    xr = x.reshape(x.shape[:-1] + (g, GROUP)) @ h
    return xr.reshape(x.shape)


def compand_encode(t: jnp.ndarray, bits: int, a: float) -> jnp.ndarray:
    """t in [-1, 1] -> grid index via Cardano's solve of b*u^3 + a*u = t
    (reference lmq.cuh lm_cubic_encode)."""
    N = 1 << bits
    b = 1.0 - a
    inv_b = 1.0 / b
    p3 = a * inv_b / 3.0
    p3_cub = p3 * p3 * p3
    q_half = t * inv_b * 0.5
    s = jnp.sqrt(q_half * q_half + p3_cub)
    u = jnp.cbrt(q_half + s) + jnp.cbrt(q_half - s)
    idx = jnp.floor(u * (N // 2) + (N // 2))
    return jnp.clip(idx, 0, N - 1).astype(jnp.uint32)


def compand_decode(idx: jnp.ndarray, bits: int, a: float) -> jnp.ndarray:
    """Grid index -> value in [-1, 1]: u = (2q+1)/N - 1; a*u + (1-a)*u^3."""
    N = 1 << bits
    u = (2.0 * idx + 1.0) / N - 1.0
    return u * (a + (1.0 - a) * u * u)


def quantize_kv(x: jnp.ndarray, bits: int, compand_a: float = 0.0):
    """x: (..., D) -> (packed (..., D*bits/32) int32, scale (..., D/32) bf16).

    Rotate -> absmax scale -> midpoint-grid (or companded) encode -> pack as
    a little-endian bit stream per group (32/bits values per int32 word).
    """
    D = x.shape[-1]
    assert D % GROUP == 0
    g = D // GROUP
    N = 1 << bits
    xr = _rotate_groups(x.astype(jnp.float32))
    xg = xr.reshape(x.shape[:-1] + (g, GROUP))
    amax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
    scale = (amax + 1e-12).astype(jnp.bfloat16)
    t = xg / scale.astype(jnp.float32)
    if compand_a > 0.0:
        qb = compand_encode(t, bits, compand_a)
    else:
        qb = jnp.clip(jnp.floor(t * (N // 2) + (N // 2)),
                      0, N - 1).astype(jnp.uint32)
    if bits in ODD_PLANES:
        packed = _pack_planes(qb.reshape(x.shape[:-1] + (D,)), bits, D)
    else:
        words = [jnp.zeros(x.shape[:-1] + (g,), dtype=jnp.uint32)
                 for _ in range(bits)]
        for i in range(GROUP):
            q = qb[..., i]
            off = i * bits
            w0, sh = off // 32, off % 32
            words[w0] = words[w0] | (q << sh)
        packed = jnp.stack(words, axis=-1).astype(jnp.int32)  # (..., g, bits)
        packed = packed.reshape(x.shape[:-1] + (D * bits // 32,))
    return packed, scale.reshape(x.shape[:-1] + (g,))


def _unpack_planes(words, bits: int, D: int):
    """Inverse of _pack_planes -> (..., D) uint32 values in TRUE channel
    order."""
    g = D // GROUP
    _, inv = lane_perm(D, bits)
    qlane = jnp.zeros(words.shape[:-1] + (D,), dtype=jnp.uint32)
    off = 0
    shift = 0
    for pb in ODD_PLANES[bits]:
        J = 32 // pb
        gw = g * pb
        w = words[..., off:off + gw].astype(jnp.uint32)
        mask = jnp.uint32((1 << pb) - 1)
        fields = jnp.stack([(w >> (j * pb)) & mask for j in range(J)],
                           axis=-2)                       # (..., J, gw)
        qlane = qlane | (fields.reshape(words.shape[:-1] + (D,)) << shift)
        off += gw
        shift += pb
    return qlane[..., jnp.asarray(inv)]


def _pack_planes(qflat, bits: int, D: int):
    """Odd-bit plane packing: qflat (..., D) uint32 values in TRUE channel
    order -> (..., D*bits/32) int32, planes concatenated largest-first,
    each plane word-aligned in the kernel's lane order."""
    g = D // GROUP
    perm, _ = lane_perm(D, bits)
    qlane = qflat[..., jnp.asarray(perm)]
    words = []
    shift = 0
    for pb in ODD_PLANES[bits]:
        J = 32 // pb
        gw = g * pb
        pv = (qlane >> shift) & jnp.uint32((1 << pb) - 1)
        q2 = pv.reshape(pv.shape[:-1] + (J, gw))
        word = jnp.zeros(pv.shape[:-1] + (gw,), dtype=jnp.uint32)
        for j in range(J):
            word = word | (q2[..., j, :] << (j * pb))
        words.append(word)
        shift += pb
    return jnp.concatenate(words, axis=-1).astype(jnp.int32)


def dequantize_kv(words: jnp.ndarray, scale: jnp.ndarray, bits: int,
                  dtype=jnp.bfloat16, compand_a: float = 0.0):
    """Inverse of quantize_kv -> (..., D) (unrotated, true channel order)."""
    nwords = words.shape[-1]
    D = nwords * 32 // bits
    g = D // GROUP
    N = 1 << bits
    if bits in ODD_PLANES:
        q = _unpack_planes(words, bits, D).reshape(
            words.shape[:-1] + (g, GROUP)).astype(jnp.float32)
    else:
        w = words.astype(jnp.uint32).reshape(words.shape[:-1] + (g, bits))
        mask = jnp.uint32((1 << bits) - 1)
        fields = []
        for i in range(GROUP):
            off = i * bits
            w0, sh = off // 32, off % 32
            f = (w[..., w0] >> sh) & mask
            fields.append(f)
        q = jnp.stack(fields, axis=-1).astype(jnp.float32)
    if compand_a > 0.0:
        t = compand_decode(q, bits, compand_a)
    else:
        t = (2.0 * q + 1.0) / N - 1.0
    xr = t * scale[..., None].astype(jnp.float32)
    xr = xr.reshape(words.shape[:-1] + (D,))
    return _rotate_groups(xr, inverse=True).astype(dtype)


def merged_layout(k_bits: int, v_bits: int) -> bool:
    """Even bit-widths store MERGED: all heads' packed words share one dense
    lane dim (N, T, Hk*gw) instead of (N, T, Hk, gw). A trailing dim of gw
    (16 lanes at 4 bits, D=128) tiles to (8, 128) with 8x lane padding —
    every XLA temp, DMA block, and VPU pass on the per-head layout pays it
    (an OOM from 16x-padded reshape temps is how this was found). The
    merged lanes are dense, and the group-major bit layout composes across
    heads, so quantize_kv/dequantize_kv work on the merged view unchanged.
    Odd widths (bit planes of differing widths per head) keep the per-head
    layout and the per-head kernel path."""
    return k_bits in (2, 4, 8) and v_bits in (2, 4, 8)


def quant_cache_shapes(shape: tuple, k_bits: int, v_bits: int) -> dict:
    """Zero-initialized quantized layer state for cache shape (N, T, Hk, D).
    Even bit-widths use the merged-head lane layout (see merged_layout)."""
    n, t, hk, d = shape
    if merged_layout(k_bits, v_bits):
        return {
            "k_q": jnp.zeros((n, t, hk * d * k_bits // 32), dtype=jnp.int32),
            "k_s": jnp.zeros((n, t, hk * d // GROUP), dtype=jnp.bfloat16),
            "v_q": jnp.zeros((n, t, hk * d * v_bits // 32), dtype=jnp.int32),
            "v_s": jnp.zeros((n, t, hk * d // GROUP), dtype=jnp.bfloat16),
        }
    return {
        "k_q": jnp.zeros((n, t, hk, d * k_bits // 32), dtype=jnp.int32),
        "k_s": jnp.zeros((n, t, hk, d // GROUP), dtype=jnp.bfloat16),
        "v_q": jnp.zeros((n, t, hk, d * v_bits // 32), dtype=jnp.int32),
        "v_s": jnp.zeros((n, t, hk, d // GROUP), dtype=jnp.bfloat16),
    }


def quantize_kv_stored(x: jnp.ndarray, bits: int, merged: bool,
                       compand_a: float = 0.0):
    """quantize_kv in the STORED layout: x (B, S, Hk, D) -> merged
    (B, S, Hk*D*bits/32) when merged (full-lane packing ops), else the
    per-head 4-D layout."""
    if merged:
        B, S, Hk, D = x.shape
        return quantize_kv(x.reshape(B, S, Hk * D), bits, compand_a)
    return quantize_kv(x, bits, compand_a)


def quant_cache_update(layer_state: dict, k_new, v_new, positions, k_bits: int,
                       v_bits: int, compand_a: float = 0.0):
    """Scatter quantized (B, S, Hk, D) at token positions (linear layout)."""
    B = k_new.shape[0]
    b_idx = jnp.arange(B)[:, None]
    merged = layer_state["k_q"].ndim == 3
    kq, ks = quantize_kv_stored(k_new, k_bits, merged, compand_a)
    vq, vs = quantize_kv_stored(v_new, v_bits, merged, compand_a)
    return {
        "k_q": layer_state["k_q"].at[b_idx, positions].set(kq),
        "k_s": layer_state["k_s"].at[b_idx, positions].set(ks),
        "v_q": layer_state["v_q"].at[b_idx, positions].set(vq),
        "v_s": layer_state["v_s"].at[b_idx, positions].set(vs),
    }


def dequantize_kv_stored(words, scale, bits: int, hk: int, merged: bool,
                         dtype=jnp.bfloat16, compand_a: float = 0.0):
    """Dequantize from the STORED layout -> (..., Hk, D): merged arrays
    dequantize on full lanes then split heads (a tile-aligned reshape);
    per-head arrays pass through dequantize_kv directly."""
    if merged:
        flat = dequantize_kv(words, scale, bits, dtype, compand_a)
        d = flat.shape[-1] // hk
        return flat.reshape(flat.shape[:-1] + (hk, d))
    return dequantize_kv(words, scale, bits, dtype, compand_a)


def quant_cache_fetch(layer_state: dict, k_bits: int, v_bits: int,
                      dtype=jnp.bfloat16, compand_a: float = 0.0,
                      hk: int = 0):
    """Dequantize the whole layer -> (k, v) full (..., Hk, D) tensors.
    `hk` is required for merged (3-D) storage to split the head dim."""
    if layer_state["k_q"].ndim == 3:
        assert hk > 0, "quant_cache_fetch on merged storage needs hk"
        k = dequantize_kv_stored(layer_state["k_q"], layer_state["k_s"],
                                 k_bits, hk, True, dtype, compand_a)
        v = dequantize_kv_stored(layer_state["v_q"], layer_state["v_s"],
                                 v_bits, hk, True, dtype, compand_a)
        return k, v
    k = dequantize_kv(layer_state["k_q"], layer_state["k_s"], k_bits, dtype,
                      compand_a)
    v = dequantize_kv(layer_state["v_q"], layer_state["v_s"], v_bits, dtype,
                      compand_a)
    return k, v
