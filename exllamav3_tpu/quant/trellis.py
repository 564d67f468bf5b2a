"""EXL3 trellis bit-stream layout: pack / unpack / tile permutation.

Storage format (per 16x16 weight tile, K = bits per weight):

  * The tile holds 256 weights in a fixed "sequence order" (the reference's
    tensor-core layout; see `tile_perm`). Weight t in the sequence is encoded
    by a 16-bit code c_t.
  * Consecutive codes overlap by 16-K bits: the low K bits of c_t are "new",
    so the whole tile is a circular (tail-biting) bit stream of 256*K bits,
    where c_t = stream bits [((t+1)*K - 16) mod 256K , (t+1)*K mod 256K).
  * The stream is stored MSB-first in 16-bit halfwords, with each PAIR of
    halfwords swapped so that a little-endian uint32 read yields stream order:
    u32 S[j] = (file_u16[2j+1] << 16) | file_u16[2j] contains stream bits
    [32j, 32j+32), bit 32j at the MSB.
  * File tensor shape: (tiles_k, tiles_n, 16*K) int16.

Behavioral reference: /root/reference/exllamav3/exllamav3_ext/quant/pack.cu:9-144
(pack/unpack kernels) and exl3_dq.cuh:15-50 (decode indexing).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache
def tile_perm() -> np.ndarray:
    """Sequence order -> row-major tile index map (256,).

    seq position p corresponds to row-major element tile_perm()[p] of the
    16x16 tile. Derivation: 32 groups of 8, where group g covers rows
    {2(g%4), 2(g%4)+1, 2(g%4)+8, 2(g%4)+9} x cols {g//4, g//4+8}
    (column-fastest within the pair of columns). Must equal the reference's
    tensor-core permutation (quantize.py:22-44) exactly; verified in tests by
    an independent re-derivation.
    """
    perm = np.empty(256, dtype=np.int32)
    for g in range(32):
        r = (g % 4) * 2
        c = g // 4
        rows = (r, r + 1, r + 8, r + 9)
        for ci, cc in enumerate((c, c + 8)):
            for ri, rr in enumerate(rows):
                perm[g * 8 + ci * 4 + ri] = rr * 16 + cc
    return perm


@lru_cache
def tile_perm_inverse() -> np.ndarray:
    """Row-major tile index -> sequence position."""
    return np.argsort(tile_perm()).astype(np.int32)


def _stream_words_np(packed_u16: np.ndarray) -> np.ndarray:
    """(..., 16K) file halfwords -> (..., 8K) uint32 stream words (MSB-first)."""
    u = packed_u16.astype(np.uint16).astype(np.uint32)
    lo = u[..., 0::2]
    hi = u[..., 1::2]
    return (hi << np.uint32(16)) | lo


def _stream_words_to_u16_np(words: np.ndarray) -> np.ndarray:
    """(..., 8K) uint32 stream words -> (..., 16K) file halfwords (uint16)."""
    out = np.empty(words.shape[:-1] + (words.shape[-1] * 2,), dtype=np.uint16)
    out[..., 0::2] = (words & np.uint32(0xFFFF)).astype(np.uint16)
    out[..., 1::2] = (words >> np.uint32(16)).astype(np.uint16)
    return out


def unpack_trellis_np(packed: np.ndarray, K: int) -> np.ndarray:
    """Unpack (..., 16K) int16/uint16 -> (..., 256) uint16 codes."""
    assert packed.shape[-1] == 16 * K, packed.shape
    words = _stream_words_np(packed.view(np.uint16) if packed.dtype == np.int16 else packed)
    nw = 8 * K
    t = np.arange(256)
    end = (t + 1) * K  # end bit of code t (1..256K)
    end = np.where(end < 16, end + 256 * K, end)  # circular wrap for early codes
    i_last = (end - 1) // 32 % nw
    i_prev = (i_last - 1) % nw
    sh = (32 * ((end - 1) // 32 + 1) - end).astype(np.uint64)
    a = words[..., i_prev].astype(np.uint64)
    b = words[..., i_last].astype(np.uint64)
    merged = (a << np.uint64(32)) | b
    return ((merged >> sh) & np.uint64(0xFFFF)).astype(np.uint16)


def pack_trellis_np(codes: np.ndarray, K: int) -> np.ndarray:
    """Pack (..., 256) uint16 codes -> (..., 16K) int16 file halfwords.

    Only the low K bits of each code are stored; overlapping high bits must be
    consistent (they are for valid trellis sequences).
    """
    assert codes.shape[-1] == 256, codes.shape
    low = codes.astype(np.uint64) & ((1 << K) - 1)
    nw = 8 * K
    words = np.zeros(codes.shape[:-1] + (nw,), dtype=np.uint32)
    for t in range(256):
        b0 = t * K  # start bit of the K new bits
        b1 = b0 + K
        j0 = b0 // 32
        j1 = (b1 - 1) // 32
        if j0 == j1:
            sh = 32 * (j0 + 1) - b1
            words[..., j0] |= (low[..., t] << sh).astype(np.uint32)
        else:
            sh_hi = b1 - 32 * (j0 + 1)  # bits landing in the next word
            words[..., j0] |= (low[..., t] >> sh_hi).astype(np.uint32)
            words[..., j1] |= (low[..., t] << (32 - sh_hi)).astype(np.uint32)
    return _stream_words_to_u16_np(words).view(np.int16)


# -- jnp variants -------------------------------------------------------------


def unpack_trellis_jnp(packed: jnp.ndarray, K: int) -> jnp.ndarray:
    """Traceable unpack: (..., 16K) int16 -> (..., 256) int32 codes.

    Uses two static gathers along the word axis plus per-position static
    shifts; compiles to vector shuffles on TPU.
    """
    assert packed.shape[-1] == 16 * K, packed.shape
    u = packed.astype(jnp.int32) & 0xFFFF  # halfwords as u16 in int32 lanes
    lo = u[..., 0::2]
    hi = u[..., 1::2]
    words = (hi << 16) | lo  # uint32 stream words in int32 lanes (bit-equal)
    words = words.astype(jnp.uint32)
    nw = 8 * K

    t = np.arange(256)
    end = (t + 1) * K
    end = np.where(end < 16, end + 256 * K, end)
    i_last = ((end - 1) // 32 % nw).astype(np.int32)
    i_prev = ((i_last - 1) % nw).astype(np.int32)
    sh = (32 * ((end - 1) // 32 + 1) - end).astype(np.int32)  # 0..31

    a = words[..., i_prev]
    b = words[..., i_last]
    sh = jnp.asarray(sh, dtype=jnp.uint32)
    # funnel shift: (a:b) >> sh, avoiding u64 (unsupported lanes on TPU):
    # when sh == 0 the result is just b (a << 32 would be UB-ish; mask it).
    sh_l = jnp.uint32(32) - sh
    upper = jnp.where(sh == 0, jnp.uint32(0), a << sh_l)
    code = (upper | (b >> sh)) & jnp.uint32(0xFFFF)
    return code.astype(jnp.int32)


def codes_to_tile_rowmajor(codes_seq):
    """(..., 256) sequence-order values -> (..., 16, 16) row-major tile."""
    inv = tile_perm_inverse()
    vals = codes_seq[..., inv]
    return vals.reshape(vals.shape[:-1] + (16, 16))


def tile_rowmajor_to_seq(tile):
    """(..., 16, 16) row-major tile -> (..., 256) sequence order."""
    flat = tile.reshape(tile.shape[:-2] + (256,))
    return flat[..., tile_perm()]
