"""Hadamard matrices and blockwise Hadamard transforms.

EXL3 rotates both sides of every weight matrix with blockwise 128-point
Hadamard transforms (had_k = had_n = 128; reference quantize.py:15). H128 is
the natural-order Sylvester matrix, H[i, j] = (-1)^popcount(i & j), reachable
from H1 = [1] by repeated doubling (reference util/hadamard.py:34-42,107-131).
Sizes not a power of two are built with the Paley constructions; they are used
by a few architectures for embedding rotations, not by the EXL3 core format.

On TPU the 128-point transform is a 128x128 constant matmul: it maps straight
onto the MXU and XLA fuses the surrounding scaling, so there is no custom
kernel (reference needed had_r_128 CUDA kernels: exllamav3_ext/quant/hadamard.cu:88).
Transforms compute in f32 regardless of input dtype.
"""
from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

HAD_K = 128
HAD_N = 128


@lru_cache(maxsize=64)
def hadamard_np(n: int) -> np.ndarray:
    """Hadamard matrix of size n as float32 numpy array of +-1."""
    if n == 1:
        return np.ones((1, 1), dtype=np.float32)
    if n % 2 == 0:
        h = hadamard_np(n // 2)
        if h is not None:
            return np.block([[h, h], [h, -h]]).astype(np.float32)
    if n % 4 == 0 and _is_prime(n - 1) and (n - 1) % 4 == 3:
        return _paley1(n)
    if n % 4 == 0 and _is_prime(n // 2 - 1):
        return _paley2(n)
    raise ValueError(f"no Hadamard construction for size {n}")


def _is_prime(p: int) -> bool:
    if p < 2:
        return False
    if p % 2 == 0:
        return p == 2
    f = 3
    while f * f <= p:
        if p % f == 0:
            return False
        f += 2
    return True


def _qr_table(p: int) -> np.ndarray:
    """is_quadratic_residue(a, p) for a in [0, p)."""
    qr = np.zeros(p, dtype=bool)
    for a in range(p):
        qr[a] = pow(a, (p - 1) // 2, p) == 1
    return qr


def _paley1(n: int) -> np.ndarray:
    p = n - 1
    qr = _qr_table(p)
    h = np.empty((n, n), dtype=np.float32)
    i = np.arange(p)[:, None]
    j = np.arange(p)[None, :]
    res = (i - j) % p
    h[1:, 1:] = np.where(i == j, 1.0, np.where(qr[res], 1.0, -1.0))
    h[0, :] = 1.0
    h[:, 0] = -1.0
    h[0, 0] = 1.0
    return h


def _paley2(n: int) -> np.ndarray:
    p = n // 2 - 1
    qr = _qr_table(p)
    h = np.empty((n, n), dtype=np.float32)
    for i in range(n // 2):
        for j in range(n // 2):
            if j == i:
                blk = [[1, -1], [-1, -1]]
            else:
                residue = (i - j) % p
                if i == 0 or j == 0 or qr[residue]:
                    blk = [[1, 1], [1, -1]]
                else:
                    blk = [[-1, -1], [-1, 1]]
            h[2 * i : 2 * i + 2, 2 * j : 2 * j + 2] = blk
    return h


@lru_cache(maxsize=8)
def h128_scaled_np() -> np.ndarray:
    """H128 / sqrt(128) as float32 — the canonical EXL3 rotation block."""
    return hadamard_np(128) / math.sqrt(128.0)


def had_right_jnp(x: jnp.ndarray, scale_pre=None, scale_post=None, block: int = 128) -> jnp.ndarray:
    """y = (x * scale_pre).view(..., -1, block) @ (H_block/sqrt(block)) * scale_post.

    Matches reference had_r_128 semantics (hadamard.cu:83-107): operates on the
    last dim in blocks of `block`; pre/post scales are per-last-dim vectors.
    Computes in f32 and returns the input dtype.
    """
    h = jnp.asarray(hadamard_np(block) / math.sqrt(block), dtype=jnp.float32)
    dt = x.dtype
    xf = x.astype(jnp.float32)
    if scale_pre is not None:
        xf = xf * scale_pre.astype(jnp.float32)
    shp = xf.shape
    xf = xf.reshape(shp[:-1] + (shp[-1] // block, block))
    yf = jnp.einsum("...b,bc->...c", xf, h).reshape(shp)
    if scale_post is not None:
        yf = yf * scale_post.astype(jnp.float32)
    return yf.astype(dt)


def had_left_np(x: np.ndarray, block: int = 128) -> np.ndarray:
    """(H_block/sqrt(block)) @ x applied to row blocks (reference preapply_had_l)."""
    h = hadamard_np(block) / math.sqrt(block)
    k, n = x.shape
    return (h @ x.reshape(k // block, block, n).astype(np.float64)).reshape(k, n).astype(x.dtype)


def had_right_np(x: np.ndarray, block: int = 128) -> np.ndarray:
    """x @ (H_block/sqrt(block)) applied to column blocks (reference preapply_had_r)."""
    h = hadamard_np(block) / math.sqrt(block)
    k, n = x.shape
    return (x.reshape(k, n // block, block).astype(np.float64) @ h).reshape(k, n).astype(x.dtype)
