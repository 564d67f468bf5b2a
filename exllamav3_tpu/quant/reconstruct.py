"""Reconstruct dense weights from packed EXL3 tensors.

An EXL3 linear layer of shape (in_features k, out_features n) stores:
  trellis: (k/16, n/16, 16*K) int16   packed trellis codes (see trellis.py)
  suh:     (k,) fp16                  input-side signs/scales
  svh:     (n,) fp16                  output-side signs/scales
  mcg/mul1: scalar marker tensors selecting the codebook (value unused)
  bias:    optional (n,) fp16

Full-precision weight:  W = diag(suh) . Hk . W_inner . Hn . diag(svh)
where Hk/Hn are blockwise 128-point Hadamards scaled by 1/sqrt(128) and
W_inner[16*tk + r, 16*tn + c] = decode(code at tile (tk, tn), row-major (r, c)).

Behavioral reference: /root/reference/exllamav3/exllamav3_ext/quant/reconstruct.cu
(reconstruct / reconstruct_had_slice) and modules/quant/exl3.py:227-237
(get_weight_tensor).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .codebook import decode_np, decode_jnp, CB_3INST, CB_MCG, CB_MUL1
from .trellis import (
    unpack_trellis_np,
    unpack_trellis_jnp,
    tile_perm_inverse,
)
from .hadamard import had_left_np, had_right_np, had_right_jnp, hadamard_np


def codebook_id(mcg: bool = False, mul1: bool = False) -> int:
    if mcg:
        return CB_MCG
    if mul1:
        return CB_MUL1
    return CB_3INST


def reconstruct_inner_np(trellis: np.ndarray, K: int, cb: int = CB_3INST) -> np.ndarray:
    """trellis (tiles_k, tiles_n, 16K) int16 -> W_inner (k, n) float16."""
    tk, tn, pw = trellis.shape
    assert pw == 16 * K
    codes = unpack_trellis_np(trellis, K)  # (tk, tn, 256) seq order
    vals = decode_np(codes, cb)  # fp16
    inv = tile_perm_inverse()
    tiles = vals[..., inv].reshape(tk, tn, 16, 16)
    return tiles.transpose(0, 2, 1, 3).reshape(tk * 16, tn * 16)


def reconstruct_full_np(
    trellis: np.ndarray,
    suh: np.ndarray,
    svh: np.ndarray,
    K: int,
    cb: int = CB_3INST,
) -> np.ndarray:
    """Original-basis weight (k, n) float32."""
    w = reconstruct_inner_np(trellis, K, cb).astype(np.float32)
    w = had_left_np(w)
    w = w * suh.astype(np.float32)[:, None]
    w = had_right_np(w)
    w = w * svh.astype(np.float32)[None, :]
    return w


def reconstruct_inner_jnp(trellis: jnp.ndarray, K: int, cb: int = CB_3INST, dtype=jnp.float32) -> jnp.ndarray:
    """Traceable reconstruct: trellis (tk, tn, 16K) int16 -> (k, n) `dtype`."""
    tk, tn, pw = trellis.shape
    assert pw == 16 * K
    codes = unpack_trellis_jnp(trellis, K)  # (tk, tn, 256) int32
    vals = decode_jnp(codes, cb, dtype=dtype)
    inv = jnp.asarray(tile_perm_inverse())
    tiles = vals[..., inv].reshape(tk, tn, 16, 16)
    return tiles.transpose(0, 2, 1, 3).reshape(tk * 16, tn * 16)


@partial(jax.jit, static_argnames=("K", "cb", "dtype"))
def reconstruct_full_jnp(
    trellis: jnp.ndarray,
    suh: jnp.ndarray,
    svh: jnp.ndarray,
    K: int,
    cb: int = CB_3INST,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Original-basis weight (k, n), traceable."""
    w = reconstruct_inner_jnp(trellis, K, cb, dtype=jnp.float32)
    h = jnp.asarray(hadamard_np(128) / np.sqrt(128.0), dtype=jnp.float32)
    k, n = w.shape
    w = (h @ w.reshape(k // 128, 128, n)).reshape(k, n)
    w = w * suh.astype(jnp.float32)[:, None]
    w = (w.reshape(k, n // 128, 128) @ h).reshape(k, n)
    w = w * svh.astype(jnp.float32)[None, :]
    return w.astype(dtype)


def exl3_matmul_ref_jnp(
    x: jnp.ndarray,
    trellis: jnp.ndarray,
    suh: jnp.ndarray,
    svh: jnp.ndarray,
    K: int,
    cb: int = CB_3INST,
    bias: jnp.ndarray | None = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Reference forward: y = ((x*suh) @ Hk) @ W_inner @ Hn * svh + bias.

    Semantics of LinearEXL3.reconstruct_hgemm (modules/quant/exl3.py:161-218),
    expressed the TPU way: the Hadamards are constant matmuls fused by XLA and
    W_inner is materialized per call. Pallas fused kernels replace this on the
    hot path (ops/exl3_gemm.py).
    """
    out_dtype = out_dtype or x.dtype
    xh = had_right_jnp(x, scale_pre=suh)
    w = reconstruct_inner_jnp(trellis, K, cb, dtype=jnp.bfloat16)
    y = jnp.dot(xh.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    y = had_right_jnp(y, scale_post=svh)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
