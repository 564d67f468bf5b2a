"""Fused EXL3 trellis-decode matmul — the flagship Pallas kernel.

Computes y = ((x * suh) @ Hk) @ W_inner @ Hn * svh with W_inner decoded from
the packed trellis *inside* the kernel (VMEM), so HBM weight traffic stays at
K/16 bytes per weight. Replaces the reference's exl3_gemm/gemv CUDA family
(/root/reference/exllamav3/exllamav3_ext/quant/exl3_gemm.cu and exl3_dq.cuh).

TPU-native design notes:

 * Codes are 16-bit windows of a circular bit stream (trellis.py). Grouping
   256 codes into 8 groups x 32 codes, each group spans exactly K uint32
   words for ANY K, so the in-kernel extraction is 32 static
   slice+funnel-shift steps over full vector registers — no gathers.
 * The format's tensor-core tile permutation is SEPARABLE: sequence position
   p = (gh<<5)|(gl<<3)|(ci<<2)|(rh<<1)|rl maps to tile row r = (rh<<3)|(gl<<1)|rl
   and column c = (ci<<3)|gh — row bits and column bits never mix. The kernel
   therefore assembles decoded values in a *permuted* row/column order
   (r' = (gl<<2)|(rh<<1)|rl, c' = (gh<<1)|ci) and the fixups are folded into
   the constant 128-point Hadamard matrices applied outside the kernel
   (columns of Hk and rows of Hn permuted within each 16-block) — zero
   runtime cost, where the reference needed an in-kernel shared-memory
   shuffle epilogue (reconstruct.cu:46-75).
 * The codebook decode ((x*mult [+add]) & 0x8FFF8FFF ^ 0x3B603B60 as two
   fp16 halves, or the MUL1 byte-sum form) is ~12 VPU ops/weight — the
   fused path is VPU-bound at batch 1 and HBM-bound once the decode
   amortizes over a batch; the int8/bf16 cached representations
   (modules/linear.py) trade HBM for that VPU cost.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..quant.codebook import CB_3INST, CB_MCG, CB_MUL1
from ..quant.hadamard import hadamard_np
from ..quant.reconstruct import exl3_matmul_ref_jnp

# -- load-time preparation ------------------------------------------------------


def prepare_trellis_words(trellis: np.ndarray) -> np.ndarray:
    """(tk, tn, 16K) int16 file halfwords -> kernel layout (tk, K, tn*8) int32.

    Stream word S[g*K + wi] of tile (kt, nt) lands at [kt, wi, nt*8 + g]:
    lanes are (tile, group) pairs in the kernel's output-column order, so the
    in-kernel extraction runs on full-width vectors with no gathers.
    """
    u = trellis.view(np.uint16).astype(np.uint32) if trellis.dtype == np.int16 \
        else trellis.astype(np.uint32)
    lo = u[..., 0::2]
    hi = u[..., 1::2]
    words = ((hi << np.uint32(16)) | lo).view(np.int32)  # (tk, tn, 8K)
    tk, tn, nw = words.shape
    K = nw // 8
    w4 = words.reshape(tk, tn, 8, K)  # (kt, nt, g, wi)
    return np.ascontiguousarray(w4.transpose(0, 3, 1, 2).reshape(tk, K, tn * 8))


def _perm_within16_k() -> np.ndarray:
    """q[r'] = r : kernel row order r'=(gl<<2)|(rh<<1)|rl vs true r=(rh<<3)|(gl<<1)|rl."""
    q = np.empty(16, dtype=np.int64)
    for rp in range(16):
        gl, rh, rl = rp >> 2, (rp >> 1) & 1, rp & 1
        q[rp] = (rh << 3) | (gl << 1) | rl
    return q


def _perm_within16_n() -> np.ndarray:
    """q[c'] = c : kernel col order c'=(gh<<1)|ci vs true c=(ci<<3)|gh."""
    q = np.empty(16, dtype=np.int64)
    for cp in range(16):
        gh, ci = cp >> 1, cp & 1
        q[cp] = (ci << 3) | gh
    return q


@functools.lru_cache
def _hk_permuted() -> np.ndarray:
    """H128/sqrt(128) with columns permuted so kernel-row-order contraction
    is correct: Hk'[:, 8*16? ...] — column (b*16 + r') = Hk column (b*16 + r)."""
    h = hadamard_np(128) / math.sqrt(128.0)
    q = _perm_within16_k()
    cols = (np.arange(128) // 16) * 16
    perm = cols + q[np.arange(128) % 16]
    return np.ascontiguousarray(h[:, perm]).astype(np.float32)


@functools.lru_cache
def _hn_permuted() -> np.ndarray:
    """H128/sqrt(128) with rows permuted: row (b*16 + c') = Hn row (b*16 + c)."""
    h = hadamard_np(128) / math.sqrt(128.0)
    q = _perm_within16_n()
    rows = (np.arange(128) // 16) * 16
    perm = rows + q[np.arange(128) % 16]
    return np.ascontiguousarray(h[perm, :]).astype(np.float32)


# -- kernel ------------------------------------------------------------------------


def decode_scale(cb: int) -> float:
    """Post-scale folded into svh: the kernel emits fp16-pattern halves
    bitcast WITHOUT re-biasing the exponent into f32 (saves one add per
    half), so decoded values carry a constant 2^-112 factor that the
    output-side scale vector absorbs for free."""
    return 2.0 ** 112 if cb in (CB_3INST, CB_MCG) else 1.0


def _decode_codes_f32(code: jnp.ndarray, cb: int) -> jnp.ndarray:
    """uint32 codes (<65536) -> decoded value f32 (scaled by
    1/decode_scale(cb)), vector ops only.

    fp16-half bitcast trick: the codebook's masked patterns never produce
    fp16 denormals/inf/nan (the AND/XOR masks confine the exponent field to
    12..15), so sign|exponent|mantissa can be repositioned into an f32 bit
    pattern with shifts/ands alone; the 112-step exponent re-bias is a
    constant 2^112 factor folded into svh (decode_scale). ~14 VPU ops per
    weight vs the reference CUDA lop3+half2 sequence
    (exllamav3_ext/quant/codebook.cuh:57-84).
    """
    import jax.lax as lax

    x = code
    if cb == CB_3INST:
        x = x * jnp.uint32(89226354) + jnp.uint32(64248484)
    elif cb == CB_MCG:
        x = x * jnp.uint32(0xCBAC1FED)
    else:  # CB_MUL1
        x = x * jnp.uint32(0x83DCD12D)
        # byte-sum via two pair-sums (6 ops vs 10 for four extracts)
        p = (x & jnp.uint32(0x00FF00FF)) + ((x >> 8) & jnp.uint32(0x00FF00FF))
        s = (p + (p >> 16)) & jnp.uint32(0x7FF)
        # fp16 pattern 0x6400+s encodes exactly 1024.0+s for s in [0, 1020]
        # (uint32->f32 casts are unsupported in Mosaic; go via int32)
        hf = s.astype(jnp.int32).astype(jnp.float32) + np.float32(1024.0)
        return hf * np.float32(0.006767272949218750) + np.float32(-10.3828125)
    m = (x & jnp.uint32(0x8FFF8FFF)) ^ jnp.uint32(0x3B603B60)
    # lo half: fp16 bits 0..15 -> f32 pattern (sign<<16 | exp_man<<13)
    lo = lax.bitcast_convert_type(
        ((m << 13) & jnp.uint32(0x0FFFE000)) | ((m & jnp.uint32(0x8000)) << 16),
        jnp.float32)
    # hi half: fp16 bits 16..31 -> (sign already at 31 | exp_man>>3)
    hi = lax.bitcast_convert_type(
        ((m >> 3) & jnp.uint32(0x0FFFE000)) | (m & jnp.uint32(0x80000000)),
        jnp.float32)
    return lo + hi


def _exl3_gemm_kernel(x_ref, w_ref, out_ref, acc_ref, *, K: int, cb: int,
                      bkt: int, bnt: int):
    """Grid (m, n, k). x block (bm, bkt*16) bf16 (kernel row order);
    w block (bkt, K, bnt*8) i32, lanes = (tile, group) in kernel col order.
    Emits y' in kernel row/col order (fixed up by the permuted Hadamards).

    Mosaic-friendly by construction: only full-lane elementwise ops, lane
    rolls with static amounts, a stack+minor-merge interleave, and a leading
    -dim merge — no lane-dim reshapes or gathers.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    L = bnt * 8
    words = w_ref[:].astype(jnp.uint32)  # (bkt, K, L)

    # predecessor of word (g, 0) is (g-1, K-1), groups wrap per tile (8 lanes)
    pK1 = words[:, K - 1, :]
    r1 = pltpu.roll(pK1, 1, axis=1)
    r2 = pltpu.roll(pK1, L - 7, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bkt, L), 1)
    prev0 = jnp.where(lane % 8 == 0, r2, r1)

    # 32 codes per group; code t ends at bit (t+1)*K of its group stream
    vals = []
    for t in range(32):
        end = (t + 1) * K
        wi = (end - 1) // 32
        sh = 32 * (wi + 1) - end
        b = words[:, wi, :]
        if sh == 0:
            code = b & jnp.uint32(0xFFFF)
        else:
            a = words[:, wi - 1, :] if wi > 0 else prev0
            code = ((a << (32 - sh)) | (b >> sh)) & jnp.uint32(0xFFFF)
        vals.append(_decode_codes_f32(code, cb))  # (bkt, L) f32

    # t = (gl<<3)|(ci<<2)|(rh<<1)|rl; kernel row r' = (gl<<2)|(rh<<1)|rl.
    # Columns come out ci-major per n-block: col = ci*L + lane (lane=(nt,gh));
    # the XLA epilogue un-permutes (activation-sized, cheap). Rows come out
    # rp-major over the k block (row = r'*bkt + kt): a sublane CONCAT is free
    # register placement where a 16-way stack interleave costs sublane
    # shuffles on every decoded vector — the matching lane order of x is a
    # cheap XLA pre-transpose outside the kernel (exl3_matmul_fused).
    rows0, rows1 = [], []
    for rp in range(16):
        gl, rh, rl = rp >> 2, (rp >> 1) & 1, rp & 1
        rows0.append(vals[gl * 8 + rh * 2 + rl])
        rows1.append(vals[gl * 8 + 4 + rh * 2 + rl])
    w0 = jnp.concatenate(rows0, axis=0)  # (16*bkt, L), row = rp*bkt + kt
    w1 = jnp.concatenate(rows1, axis=0)
    w = jnp.concatenate([w0, w1], axis=1).astype(jnp.bfloat16)

    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("K", "cb", "block_m", "block_n", "block_k", "interpret"),
)
def exl3_gemm_core(xh, words, K: int, cb: int, block_m=128, block_n=256,
                   block_k=256, interpret=False):
    """xh (m, k) bf16 (already input-transformed, kernel row order) x trellis
    words (k/16, n/16, 8K) int32 -> y' (m, n) f32 in kernel col order.

    m must be a multiple of block_m (caller pads); k/n must divide by the
    (128-aligned) block sizes, guaranteed for EXL3 tensors."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = xh.shape
    tk, kw, ln = words.shape
    assert kw == K and tk * 16 == k
    tn = ln // 8
    n = tn * 16
    bm = min(block_m, m)
    bn = block_n if n % block_n == 0 else 128
    bk = block_k if k % block_k == 0 else 128
    bkt, bnt = bk // 16, bn // 16
    assert m % bm == 0 and n % bn == 0 and k % bk == 0
    grid = (m // bm, n // bn, k // bk)
    kernel = functools.partial(_exl3_gemm_kernel, K=K, cb=cb, bkt=bkt, bnt=bnt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bkt, K, bnt * 8), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xh, words)


def exl3_matmul_fused(x, words, suh, svh, K: int, cb: int = CB_3INST,
                      bias=None, out_dtype=None):
    """Full EXL3 linear through the fused kernel. x: (..., k)."""
    out_dtype = out_dtype or x.dtype
    shape = x.shape
    k = shape[-1]
    tn = words.shape[2] // 8
    n = tn * 16
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    hk = jnp.asarray(_hk_permuted())
    hn = jnp.asarray(_hn_permuted())
    xf = x2.astype(jnp.float32) * suh.astype(jnp.float32)
    xh = (xf.reshape(m, k // 128, 128) @ hk).reshape(m, k).astype(jnp.bfloat16)

    bm = 16 if m <= 16 else (64 if m <= 64 else 128)
    interpret = jax.default_backend() in ("cpu",)
    # decode shapes: wide-n blocks amortize the per-block DMA/grid cost
    # (tools/fused_ablate.py r5: ingest-only 87->32 us and full 192->183 us
    # at bn 256->1024, m=16 k=n=4096); prefill keeps the MXU-friendly 256
    if m <= 16 and n % 1024 == 0:
        bn = 1024
    else:
        bn = 256 if n % 256 == 0 else 128
    bk = 256 if k % 256 == 0 else 128
    if not interpret:
        # shape-keyed autotune cache (sweeps on first sight when
        # EXL3_TPU_AUTOTUNE=1; see ops/autotune.py)
        from .autotune import best_blocks

        tuned = best_blocks(bm, k, n, K, cb, words=words)
        if tuned is not None:
            bm, bn, bk = tuned
    m_pad = -m % bm
    if m_pad:
        xh = jnp.pad(xh, ((0, m_pad), (0, 0)))
    # lane order matching the kernel's concat row layout: within each
    # k-block, lane kt*16 + rp -> rp*bkt + kt
    m2 = xh.shape[0]
    bkt = bk // 16
    xh = xh.reshape(m2, k // bk, bkt, 16).transpose(0, 1, 3, 2).reshape(m2, k)
    y = exl3_gemm_core(xh, words, K, cb, block_m=bm, block_n=bn, block_k=bk,
                       interpret=interpret)
    if m_pad:
        y = y[:m]
    # un-permute the kernel's per-block ci-major column layout:
    # block col = ci*(bn/2) + nt_in_block*8 + gh  ->  nt*16 + gh*2 + ci
    mm = y.shape[0]
    bnt = bn // 16
    y = y.reshape(mm, n // bn, 2, bnt, 8)
    y = y.transpose(0, 1, 3, 4, 2).reshape(mm, n)

    y = (y.reshape(m, n // 128, 128).astype(jnp.float32) @ hn).reshape(m, n)
    y = y * (svh.astype(jnp.float32) * np.float32(decode_scale(cb)))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.reshape(shape[:-1] + (n,)).astype(out_dtype)


FUSED_MAX_ROWS = 128


def words_to_trellis(words: jnp.ndarray) -> jnp.ndarray:
    """Inverse of prepare_trellis_words, traceable: kernel layout
    (tk, K, tn*8) i32 -> (tk, tn, 16K) i16 file halfwords."""
    tk, K, ln = words.shape
    tn = ln // 8
    w = words.astype(jnp.uint32).reshape(tk, K, tn, 8)  # (kt, wi, nt, g)
    w = w.transpose(0, 2, 3, 1).reshape(tk, tn, 8 * K)  # (kt, nt, g*K+wi)
    lo = (w & 0xFFFF).astype(jnp.int32)
    hi = (w >> 16).astype(jnp.int32)
    inter = jnp.stack([lo, hi], axis=-1).reshape(tk, tn, 16 * K)
    return inter.astype(jnp.int16)


def exl3_matmul(x, words, suh, svh, K, cb, bias=None, out_dtype=None):
    """Dispatch: fused Pallas decode-GEMM for decode-sized row counts,
    reconstruct + plain GEMM for prefill-sized inputs (mirrors the
    reference's GEMV/GEMM split, modules/quant/exl3.py:130-139).
    `words` is the prepared stream-word tensor (prepare_trellis_words)."""
    rows = int(np.prod(x.shape[:-1]))
    k = x.shape[-1]
    n = words.shape[2] * 2
    interpret = jax.default_backend() in ("cpu",)
    # Mosaic requires >=128-lane word blocks: compiled fused path needs
    # 256-divisible dims (real model dims virtually always are)
    fits = interpret or (k % 256 == 0 and n % 256 == 0)
    if rows <= FUSED_MAX_ROWS and fits:
        return exl3_matmul_fused(x, words, suh, svh, K, cb,
                                 bias=bias, out_dtype=out_dtype)
    trellis = words_to_trellis(words)
    return exl3_matmul_ref_jnp(x, trellis, suh, svh, K, cb,
                               bias=bias, out_dtype=out_dtype)
