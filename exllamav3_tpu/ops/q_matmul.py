"""int8-dequant matmul: y = x @ (q * scale[col]).

jnp fallback (XLA materializes bf16 weights per call) plus a Pallas kernel
that dequantizes int8 tiles in VMEM and feeds the MXU, keeping HBM traffic at
1 byte/weight. Used by the "int8" EXL3 runtime representation
(modules/linear.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def int8_matmul_ref(x, w_q, scale, bias=None):
    w = w_q.astype(jnp.bfloat16)
    y = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    y = y * scale[None, :].astype(jnp.float32)
    if bias is not None:
        y = y + bias
    return y


def int8_matmul_actq(x, w_q, scale, bias=None):
    """Native int8 x int8 MXU path: activations quantize per-row (dynamic
    symmetric) so the weight tiles feed the MXU without widening — the
    analogue of the reference's int8-activation GEMV (exl3_gemv_int8.cu).
    Adds ~0.4% activation-quant noise; opt-in via linear int8a mode or
    EXL3TPU_INT8_ACTQ=1."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) + 1e-12
    sx = amax / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * scale[None, :].astype(jnp.float32)
    if bias is not None:
        y = y + bias
    return y


def _int8_matmul_kernel(x_ref, wq_ref, scale_ref, out_ref, acc_ref):
    import jax.experimental.pallas as pl

    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = wq_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:] * scale_ref[0, :].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def int8_matmul_pallas(x, w_q, scale, block_m=256, block_n=512, block_k=512):
    """x: (m, k) bf16; w_q: (k, n) int8; scale: (n,) f32 -> (m, n) f32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n), pl.cdiv(k, block_k))
    return pl.pallas_call(
        _int8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x.astype(jnp.bfloat16), w_q, scale.reshape(1, -1))


def int8_matmul(x, w_q, scale, bias=None, use_pallas: bool | None = None):
    import os

    shape = x.shape
    k = shape[-1]
    n = w_q.shape[1]
    x2 = x.reshape(-1, k)
    if use_pallas is None:
        env = os.environ.get("EXL3TPU_INT8_PALLAS")
        if env is not None:
            use_pallas = env not in ("0", "false")
        else:
            # XLA's fused int8-dequant matmul beats the handwritten Pallas
            # kernel on decode shapes (525 vs 380 tok/s on the v5e bench,
            # 75% vs 55% of the HBM roofline) — measured 2026-08-16. The
            # Pallas kernel remains available via EXL3TPU_INT8_PALLAS=1.
            use_pallas = False
    if use_pallas:
        m = x2.shape[0]
        m_pad = -m % 16  # bf16 sublane alignment for tiny decode batches
        if m_pad:
            x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
        y = int8_matmul_pallas(x2, w_q, scale)
        if m_pad:
            y = y[:m]
    elif os.environ.get("EXL3TPU_INT8_ACTQ"):
        y = int8_matmul_actq(x2, w_q, scale)
    else:
        y = int8_matmul_ref(x2, w_q, scale)
    if bias is not None:
        y = y + bias
    return y.reshape(shape[:-1] + (n,))


# -- packed int4: 0.5 byte/weight serving mode --------------------------------
#
# The reference's headline property is fused trellis decode at memory-bound
# speed (README.md:174, exllamav3_ext/quant/exl3_gemm.cu:23-37). On v5e the
# trellis decode costs ~14 VPU ops/weight (capacity mode, 5% of roofline) and
# the int8 mode pays 2x the format's bytes. This mode sits between them: at
# load the decoded trellis requantizes to grouped int4 (per-32-row scales,
# Lloyd-refined — alternating round / least-squares scale steps cut the
# requant noise from 0.108 to 0.093 of weight rms on Gaussian weights),
# packed two weights per byte along k — byte r of column n holds k-row r
# (low nibble, biased +8) and k-row r + k/2 (high nibble, two's complement).
# Two Pallas kernels serve it: a bf16-dequant path (bitcast nibble masks +
# exact bf16 centering, MXU-expanded scales) and the DEFAULT W4A8 path
# (int8 activations x int8 nibbles -> int32 MXU dots per scale group, f32
# fixups sliced to the live decode rows). HBM traffic stays at 0.5
# byte/weight + 1/16 scale overhead (0.5625 B/weight, 1.78x less than
# int8). Measured 8B decode: a8 75 tok/s vs bf16-path 60 vs int8-mode 96 —
# v5e's per-element ingest cost caps sub-byte GEMV at ~40-55% of its
# bandwidth roofline whatever the formulation (doc/performance.md,
# tools/a8_ablate.py). Scalar int4 is also a coarser quantizer than the
# trellis (~0.09 vs ~0.07 weight-rms noise at 4 bits): the mode's value is
# footprint (0.58x of int8) at ~0.8x the speed, plus conversion-time
# Hessian-aware .sq codes that claw back ~40% of the rounding penalty.

INT4_GROUP = 32
INT4_LLOYD_ITERS = 4


def int4_pack_jnp(w, group: int = INT4_GROUP):
    """f32 (k, n) -> (packed (k/2, n) int8, scales (k/group, n) bf16).
    Device-side (jnp) so load time stays off the host. Requires
    k % (2*group) == 0 (callers fall back to int8 otherwise)."""
    k, n = w.shape
    assert k % (2 * group) == 0, (k, group)
    g = k // group
    wf = w.astype(jnp.float32)
    wr = wf.reshape(g, group, n)
    amax = jnp.max(jnp.abs(wr), axis=1)                           # (g, n)
    scale = amax / 7.0 + 1e-12
    # Lloyd alternation: round at the current scale, then the least-squares
    # optimal scale for that rounding (<w,q>/<q,q>) — each step is monotone
    # in group MSE, so a few iterations land near the per-group optimum
    for _ in range(INT4_LLOYD_ITERS):
        qr = jnp.clip(jnp.round(wr / scale[:, None, :]), -8, 7)
        num = jnp.sum(wr * qr, axis=1)
        den = jnp.sum(qr * qr, axis=1) + 1e-12
        scale = jnp.maximum(num / den, 1e-12)
    q = jnp.clip(jnp.round(wf / jnp.repeat(scale, group, axis=0)), -8, 7)
    q = q.astype(jnp.int32)
    # BOTH nibbles biased +8 into [0,15]: Mosaic v5e legalizes only and/xor/
    # convert on int8 vectors (no shift/sub), so the kernels mask-extract
    # unsigned nibbles and fold the -8 bias into MXU-side corrections
    lo = q[: k // 2] + 8
    hi = q[k // 2:] + 8
    packed = ((hi << 4) | lo).astype(jnp.int8)
    return packed, scale.astype(jnp.bfloat16)


def int4_unpack_jnp(packed, scales, group: int = INT4_GROUP):
    """Reference unpack: (k/2, n) int8 + (k/group, n) -> (k, n) f32."""
    bi = packed.astype(jnp.int32) & 255        # unsigned byte, both nibbles biased
    lo = (bi & 15) - 8
    hi = (bi >> 4) - 8
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    return q * jnp.repeat(scales.astype(jnp.float32), group, axis=0)


def int4_matmul_ref(x, packed, scales, bias=None, group: int = INT4_GROUP):
    w = int4_unpack_jnp(packed, scales, group)
    y = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    return y


@functools.lru_cache(maxsize=None)
def _int4_expand_mat(bkh: int, group: int) -> np.ndarray:
    """(bkh, bkh//group) f32: E @ scales expands per-group rows to per-k-row
    scales on the MXU (the VPU-side alternative, a sublane-repeat, has no
    cheap TPU lowering)."""
    ng = bkh // group
    E = np.zeros((bkh, ng), np.float32)
    for p in range(bkh):
        E[p, p // group] = 1.0
    return E


def _int4_matmul_kernel(x_lo_ref, x_hi_ref, b_ref, s_lo_ref, s_hi_ref,
                        emat_ref, out_ref, acc_ref):
    """Per-weight VPU work is the budget here (HBM roofline ~= 11.5 us at
    m=16, 4096x4096): Mosaic v5e has no int8 shift/sub, and int32 widening
    for the nibble math measured 28.5 us. So: bitcast the packed bytes to
    int32 LANES, mask all four nibbles per word (2 int32 ops per 4 bytes),
    bitcast back to int8, convert to bf16 and center there (exact for
    small integers); no int8 sub is ever emitted."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = pltpu.bitcast(b_ref[:], jnp.int32)              # (bkh, bn/4)
    lo_u = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)      # (bkh, bn) in [0,15]
    hi_u = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
    # per-k-row scales via the (idle during decode) MXU. BF16 operands: the
    # expansion is (bkh, ng, bn) MACs — comparable to the weight dot at
    # decode m — and f32 matmul runs at 1/8 MXU rate (measured: the f32
    # expansion capped the whole kernel at ~30% of its HBM roofline). Each
    # emat row holds exactly one 1, so the bf16 product is EXACT.
    emat = emat_ref[:].astype(jnp.bfloat16)
    se_lo = jnp.dot(emat, s_lo_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    se_hi = jnp.dot(emat, s_hi_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    # center in bf16 (integers <= 16 are exact; int8 sub does not legalize
    # on v5e, and folding the bias into a second MXU dot costs precision:
    # two large cancelling bf16 dots measured ~4x the rounding noise)
    w_lo = (lo_u.astype(jnp.bfloat16) - jnp.bfloat16(8.0)) * se_lo
    w_hi = (hi_u.astype(jnp.bfloat16) - jnp.bfloat16(8.0)) * se_hi
    acc_ref[:] += jnp.dot(x_lo_ref[:], w_lo,
                          preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(x_hi_ref[:], w_hi,
                          preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("group", "block_m", "block_n",
                                              "block_kh", "interpret"))
def int4_matmul_pallas(x, packed, scales, group: int = INT4_GROUP,
                       block_m: int = 256, block_n: int = 512,
                       block_kh: int = 512, interpret: bool = False):
    """x (m, k) bf16; packed (k/2, n) int8; scales (k/group, n) bf16
    -> (m, n) f32. m must be a multiple of 16 (bf16 sublane tile)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    kh, n = packed.shape
    assert k == 2 * kh
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    while kh % block_kh or block_kh % group:
        block_kh //= 2
        assert block_kh >= group, (kh, group)
    ng = block_kh // group
    nkb = kh // block_kh
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n), nkb)
    emat = jnp.asarray(_int4_expand_mat(block_kh, group))
    x = x.astype(jnp.bfloat16)
    return pl.pallas_call(
        _int4_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_kh), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_kh),
                         lambda i, j, kk, _n=nkb: (i, kk + _n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_kh, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, block_n),
                         lambda i, j, kk, _n=nkb: (kk + _n, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_kh, ng), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, x, packed, scales, scales, emat)


def _int4_a8_kernel(xlo_ref, xhi_ref, b_ref, slo_ref, shi_ref,
                    out_ref, acc_ref, *, group: int, m_out: int):
    """W4A8 body: int8 nibble weights feed int8xint8->int32 MXU dots per
    scale group; the group scale lands on the (m, bn) dot result (m/group
    VPU ops per weight instead of a per-weight multiply). VPU cost/weight:
    and+sub (lo) or shift (hi) in int8 — no bf16 convert — which is what
    lets the kernel chase the 0.5 B/weight HBM roofline instead of the
    bf16 MXU weight-load ceiling.

    Activations arrive pre-chunked as (groups, m, group): the per-group
    access is a leading-dim index, because a dynamic LANE slice at 32-element
    offsets cannot be proven 128-aligned by Mosaic (the straightforward
    x[:, g*group:...] form fails to compile on real TPUs). The weight rows
    slice on sublanes, where the int8 tile is 32 and g*32 is provable."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ng = slo_ref.shape[0]

    # STATIC unroll over groups: a fori_loop carry serializes the 2*ng tiny
    # int8 dots behind each accumulate; unrolled, the dots are independent
    # and the MXU pipelines them while the VPU does the scale fixups
    terms = []
    for g in range(ng):
        xg_lo = xlo_ref[g]                         # (m, group) int8
        xg_hi = xhi_ref[g]
        bg = b_ref[g * group:(g + 1) * group, :]   # (group, bn) int8
        # biased nibbles via int32-lane bitcast (no int8 shift/sub on v5e)
        b32 = pltpu.bitcast(bg, jnp.int32)
        wl = pltpu.bitcast(b32 & 0x0F0F0F0F, jnp.int8)         # in [0,15]
        wh = pltpu.bitcast((b32 >> 4) & 0x0F0F0F0F, jnp.int8)
        # the dots run at the int8 sublane pad (32 rows) — MXU rows are
        # free — but every VPU fixup after them slices to the TRUE row
        # count m_out: the per-group f32 scale/bias ops are the kernel's
        # arithmetic bottleneck and scale linearly with rows (measured
        # 38 -> ~2x faster going 32 -> 8 rows at 4096^2)
        dlo = jnp.dot(xg_lo, wl, preferred_element_type=jnp.int32)[:m_out]
        dhi = jnp.dot(xg_hi, wh, preferred_element_type=jnp.int32)[:m_out]
        # the +8 bias folds into a per-group activation row-sum: the dot of
        # x with a constant 8 column — (m, 1) int32, ~m/group VPU ops/weight
        # sum over the FULL int8 tile then slice: an 8-row slice of an int8
        # (32, 128)-tiled value forces a relayout per group (measured 2x)
        xsum_lo = jnp.sum(xg_lo.astype(jnp.int32), axis=1,
                          keepdims=True)[:m_out]
        xsum_hi = jnp.sum(xg_hi.astype(jnp.int32), axis=1,
                          keepdims=True)[:m_out]
        # scales are (ng, 1, bn): leading-dim group access for the same
        # Mosaic alignment reason as the activations
        sl = slo_ref[g].astype(jnp.float32)        # (1, bn)
        sh = shi_ref[g].astype(jnp.float32)
        terms.append((dlo - 8 * xsum_lo).astype(jnp.float32) * sl
                     + (dhi - 8 * xsum_hi).astype(jnp.float32) * sh)
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    acc_ref[:] += total

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("group", "block_m", "block_n",
                                              "block_kh", "m_true",
                                              "interpret"))
def int4_matmul_pallas_a8(x_q, packed, scales, group: int = INT4_GROUP,
                          block_m: int = 256, block_n: int = 512,
                          block_kh: int = 512, m_true: int | None = None,
                          interpret: bool = False):
    """W4A8 variant: x_q (m, k) int8 (caller row-quantized and padded to
    the int8 sublane tile; apply the per-row scale to the output), packed
    (k/2, n) int8, scales (k/group, n) bf16 -> (m_out, n) f32 missing the
    x row scales, where m_out = max(8, m_true rounded up to 8)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x_q.shape
    kh, n = packed.shape
    assert k == 2 * kh
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    while kh % block_kh or block_kh % group:
        block_kh //= 2
        assert block_kh >= group, (kh, group)
    ng = block_kh // group
    nkb = kh // block_kh
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n), nkb)
    # rows the VPU fixups (and the output) actually carry; callers pad x to
    # the int8 sublane tile (32) but decode batches are 1-16 rows. Floor at
    # 16: 8-row f32 tiles measured 2x SLOWER than 16 on v5e (sub-tile ops).
    # Row slicing only applies when one m block covers the batch (decode);
    # prefill shapes keep full blocks.
    if block_m == m:
        m_out = m_true if m_true is not None else m
        m_out = min(m, max(16, -(-m_out // 8) * 8))
    else:
        m_out = block_m
    kern = functools.partial(_int4_a8_kernel, group=group, m_out=m_out)
    # (m, k) -> (k/group, m, group): group becomes the full trailing dim and
    # the per-group kernel access a leading-dim index (see kernel docstring);
    # x is tiny next to the weights, so the transpose is off the hot path
    xr = x_q.reshape(m, k // group, group).transpose(1, 0, 2)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ng, block_m, group), lambda i, j, kk: (kk, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, block_m, group),
                         lambda i, j, kk, _n=nkb: (kk + _n, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_kh, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1, block_n), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1, block_n),
                         lambda i, j, kk, _n=nkb: (kk + _n, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_out, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_out * pl.cdiv(m, block_m), n),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_out, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xr, xr, packed, scales[:, None, :], scales[:, None, :])


def int4_matmul_a8(x, packed, scales, bias=None, group: int = INT4_GROUP,
                   interpret: bool = False):
    """Row-quantize activations to int8 and run the W4A8 kernel."""
    shape = x.shape
    k = shape[-1]
    n = packed.shape[1]
    x2 = x.reshape(-1, k).astype(jnp.float32)
    m = x2.shape[0]
    xs = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0 + 1e-12
    x_q = jnp.clip(jnp.round(x2 / xs), -127, 127).astype(jnp.int8)
    m_pad = -m % 32  # int8 sublane tile
    if m_pad:
        x_q = jnp.pad(x_q, ((0, m_pad), (0, 0)))
    y = int4_matmul_pallas_a8(x_q, packed, scales, group=group, m_true=m,
                              interpret=interpret)
    y = y[:m]
    y = y * xs
    if bias is not None:
        y = y + bias
    return y.reshape(shape[:-1] + (n,))


# -- packed int-B (B = 3/5/6): the bytes-vs-quality Pareto between int4
#    and int8 ------------------------------------------------------------------
#
# Measured at 4.0 bpw (doc/performance.md): the load-time int4 requant is NOT
# free — uniform 16-level groups add ~1x the trellis's own distortion. One
# extra bit (int5) cuts the requant MSE ~4x and 2 extra (int6) ~16x, at 0.69
# and 0.81 bytes/weight — still 31%/19% under int8. Layout: int32 words along
# k, each holding W = 32//B weights PLANE-major (weight row r = plane
# r // kp, word r % kp, kp = padded-k/W) so the kernel's W x-slices and the
# per-plane scale rows are contiguous blocks, exactly generalizing the int4
# lo/hi halves. k pads up to W*group alignment with zero rows (zero-padded
# activations make the pad contribute nothing).

INTB_GROUP = 32
# 4 appears here for the conversion-time serving tensors (plane layout,
# W=8); the load-time "int4" requant mode keeps its own packed-pair layout
_INTB_BITS = (3, 4, 5, 6)


def intb_geometry(k: int, bits: int, group: int = INTB_GROUP):
    """(W weights/word, kp words per column, k_pad) for a k-row column."""
    W = 32 // bits
    kp = -(-k // (W * group)) * group
    return W, kp, W * kp


def intb_pack_jnp(w, bits: int, group: int = INTB_GROUP):
    """f32 (k, n) -> (packed (kp, n) int32, scales (W*kp/group, n) bf16).
    Lloyd-refined per-group scales (same alternation as int4_pack_jnp)."""
    assert bits in _INTB_BITS, bits
    k, n = w.shape
    W, kp, k_pad = intb_geometry(k, bits, group)
    wf = w.astype(jnp.float32)
    if k_pad != k:
        wf = jnp.pad(wf, ((0, k_pad - k), (0, 0)))
    g = k_pad // group
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    wr = wf.reshape(g, group, n)
    amax = jnp.max(jnp.abs(wr), axis=1)
    scale = amax / hi + 1e-12
    for _ in range(INT4_LLOYD_ITERS):
        qr = jnp.clip(jnp.round(wr / scale[:, None, :]), lo, hi)
        num = jnp.sum(wr * qr, axis=1)
        den = jnp.sum(qr * qr, axis=1) + 1e-12
        scale = jnp.maximum(num / den, 1e-12)
    q = jnp.clip(jnp.round(wf / jnp.repeat(scale, group, axis=0)), lo, hi)
    qb = (q.astype(jnp.int32) - lo).reshape(W, kp, n)     # biased [0, 2^B)
    word = jnp.zeros((kp, n), jnp.int32)
    for j in range(W):
        word = word | (qb[j] << (bits * j))
    return word, scale.astype(jnp.bfloat16)


def intb_pack_from_q_np(q, scales, bits: int, group: int = INTB_GROUP):
    """Pack precomputed integer codes (numpy, conversion host side):
    q (k, n) int in [-2^(B-1), 2^(B-1)-1], scales (k/group, n) f32 ->
    (packed (kp, n) int32, scales (W*kp/group, n) f32) in the same plane
    layout as intb_pack_jnp (pad rows hold q=0, pad scale rows 1.0)."""
    q = np.asarray(q)
    scales = np.asarray(scales, dtype=np.float32)
    k, n = q.shape
    W, kp, k_pad = intb_geometry(k, bits, group)
    if k_pad != k:
        q = np.concatenate([q, np.zeros((k_pad - k, n), q.dtype)], axis=0)
        pad_g = (W * kp - k) // group
        scales = np.concatenate(
            [scales, np.ones((pad_g, n), np.float32)], axis=0)
    assert scales.shape[0] == W * kp // group, (scales.shape, W, kp, group)
    qb = (q.astype(np.int64) + (1 << (bits - 1))).reshape(W, kp, n)
    word = np.zeros((kp, n), np.int64)
    for j in range(W):
        word |= qb[j] << (bits * j)
    return word.astype(np.int32), scales


def intb_unpack_jnp(packed, scales, bits: int, k: int, group: int = INTB_GROUP):
    """Reference unpack -> (k, n) f32 (drops the zero pad rows)."""
    W, kp, k_pad = intb_geometry(k, bits, group)
    assert packed.shape[0] == kp, (packed.shape, kp)
    mask = (1 << bits) - 1
    bias = 1 << (bits - 1)
    planes = [((packed >> (bits * j)) & mask) - bias for j in range(W)]
    q = jnp.concatenate(planes, axis=0).astype(jnp.float32)
    w = q * jnp.repeat(scales.astype(jnp.float32), group, axis=0)
    return w[:k]


def intb_bits_from_shapes(kp: int, scale_rows: int,
                          group: int = INTB_GROUP) -> int:
    """Infer B from the packed/scales shapes: scales carry one row per
    group of the PADDED k = W*kp, so W = scale_rows*group/kp exactly."""
    W = scale_rows * group // kp
    assert W * kp == scale_rows * group and 32 // W in _INTB_BITS, (
        kp, scale_rows, group)
    return 32 // W


def _intb_matmul_kernel(*refs, bits: int, W: int):
    """B-bit fields extract centered from each int32 word (shift/and/sub —
    all legal on int32). Scales arrive (ng, 1, bn) so nothing ever indexes
    a tiled dim dynamically."""
    import jax.experimental.pallas as pl

    xs = refs[:W]
    b_ref = refs[W]
    ss = refs[W + 1:2 * W + 1]
    emat_ref = refs[2 * W + 1]
    out_ref = refs[2 * W + 2]
    acc_ref = refs[2 * W + 3]
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    word = b_ref[:]
    mask = (1 << bits) - 1
    bias = 1 << (bits - 1)
    # bf16 expansion: exact (one 1 per emat row) and 8x the f32 MXU rate —
    # see _int4_matmul_kernel
    emat = emat_ref[:].astype(jnp.bfloat16)
    for j in range(W):
        sj = ss[j][:]
        sj = sj.reshape(sj.shape[0], sj.shape[2]).astype(jnp.bfloat16)  # (ng, bn)
        se = jnp.dot(emat, sj,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        # int32 sub IS legal (the fields live in int32 words); centered
        # extraction avoids the cancellation of two large bf16 dots
        qj = ((word >> (bits * j)) & mask) - bias
        acc_ref[:] += jnp.dot(xs[j][:], qj.astype(jnp.bfloat16) * se,
                              preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bits", "group", "block_m",
                                              "block_n", "block_kp",
                                              "interpret"))
def intb_matmul_pallas(x, packed, scales, bits: int, group: int = INTB_GROUP,
                       block_m: int = 256, block_n: int = 512,
                       block_kp: int = 512, interpret: bool = False):
    """x (m, k_pad) bf16 (caller zero-pads k); packed (kp, n) int32;
    scales (W*kp/group, n) bf16 -> (m, n) f32. m % 16 == 0."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 32 // bits
    m, k_pad = x.shape
    kp, n = packed.shape
    assert k_pad == W * kp, (k_pad, W, kp)
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    # Mosaic requires block lane dims divisible by 128: pad kp (words per
    # column) to a 128 multiple and re-stride x/scales to the padded plane
    # layout. Zero x rows make the zero-padded words' contributions exact.
    kp2 = -(-kp // 128) * 128
    if kp2 != kp:
        packed = jnp.pad(packed, ((0, kp2 - kp), (0, 0)))
        ks, ks2 = kp // group, kp2 // group
        x = x.reshape(m, W, kp)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, kp2 - kp))).reshape(m, W * kp2)
        scales = scales.reshape(W, ks, n)
        scales = jnp.pad(scales, ((0, 0), (0, ks2 - ks), (0, 0)))
        scales = scales.reshape(W * ks2, n)
        kp = kp2
    q128 = kp // 128
    for d in (4, 3, 2, 1):
        if 128 * d <= block_kp and q128 % d == 0:
            block_kp = 128 * d
            break
    ng = block_kp // group
    nkb = kp // block_kp
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n), nkb)
    emat = jnp.asarray(_int4_expand_mat(block_kp, group))
    x = x.astype(jnp.bfloat16)
    x_specs = [
        pl.BlockSpec((block_m, block_kp),
                     functools.partial(lambda i, jj, kk, _j, _n: (i, kk + _j * _n),
                                       _j=j, _n=nkb),
                     memory_space=pltpu.VMEM)
        for j in range(W)
    ]
    s_specs = [
        pl.BlockSpec((ng, 1, block_n),
                     functools.partial(lambda i, jj, kk, _j, _n: (kk + _j * _n, 0, jj),
                                       _j=j, _n=nkb),
                     memory_space=pltpu.VMEM)
        for j in range(W)
    ]
    kern = functools.partial(_intb_matmul_kernel, bits=bits, W=W)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=x_specs + [
            pl.BlockSpec((block_kp, block_n), lambda i, jj, kk: (kk, jj),
                         memory_space=pltpu.VMEM),
        ] + s_specs + [
            pl.BlockSpec((block_kp, ng), lambda i, jj, kk: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, jj, kk: (i, jj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*([x] * W), packed, *([scales[:, None, :]] * W), emat)


def _intb_a8_kernel(*refs, bits: int, W: int, group: int, m_out: int):
    """W·A8 body: per scale group, extract each plane's B-bit field to int8
    and run int8xint8->int32 MXU dots; group scales land on the dot results,
    sliced to the live decode rows (see _int4_a8_kernel) — the int4 kernel
    generalized to int32 words."""
    import jax.experimental.pallas as pl

    xs = refs[:W]
    b_ref = refs[W]
    ss = refs[W + 1:2 * W + 1]
    out_ref = refs[2 * W + 1]
    acc_ref = refs[2 * W + 2]
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ng = ss[0].shape[0]
    mask = (1 << bits) - 1
    bias = 1 << (bits - 1)

    # static unroll: see _int4_a8_kernel (fori carries serialize the dots)
    terms = []
    for g in range(ng):
        bg = b_ref[g * group:(g + 1) * group, :]        # (group, bn) int32
        for j in range(W):
            wq = (((bg >> (bits * j)) & mask) - bias).astype(jnp.int8)
            # xs[j][g]: (m, group) int8 — leading-dim group access on the
            # pre-chunked layout (a dynamic lane slice at group offsets is
            # not 128-aligned and fails Mosaic; see _int4_a8_kernel)
            d = jnp.dot(xs[j][g], wq,
                        preferred_element_type=jnp.int32)[:m_out]
            sj = ss[j][g].astype(jnp.float32)       # (1, bn): 3-D scale ref
            terms.append(d.astype(jnp.float32) * sj)
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    acc_ref[:] += total

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bits", "group", "block_m",
                                              "block_n", "block_kp",
                                              "m_true", "interpret"))
def intb_matmul_pallas_a8(x_q, packed, scales, bits: int,
                          group: int = INTB_GROUP, block_m: int = 256,
                          block_n: int = 512, block_kp: int = 512,
                          m_true: int | None = None,
                          interpret: bool = False):
    """x_q (m, k_pad) int8 (row-quantized, zero-padded); output misses the
    x row scales (caller applies them)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 32 // bits
    m, k_pad = x_q.shape
    kp, n = packed.shape
    assert k_pad == W * kp, (k_pad, W, kp)
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    while kp % block_kp or block_kp % group:
        block_kp //= 2
        assert block_kp >= group, (kp, group)
    ng = block_kp // group
    nkb = kp // block_kp
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n), nkb)
    # (m, k_pad) -> (k_pad/group, m, group); per-plane, per-kk group ranges
    # become leading-dim blocks (see _int4_a8_kernel on why lane slicing at
    # group offsets cannot compile)
    x_q = x_q.reshape(m, k_pad // group, group).transpose(1, 0, 2)
    x_specs = [
        pl.BlockSpec((ng, block_m, group),
                     functools.partial(lambda i, jj, kk, _j, _n: (kk + _j * _n, i, 0),
                                       _j=j, _n=nkb),
                     memory_space=pltpu.VMEM)
        for j in range(W)
    ]
    s_specs = [
        pl.BlockSpec((ng, 1, block_n),
                     functools.partial(lambda i, jj, kk, _j, _n: (kk + _j * _n, 0, jj),
                                       _j=j, _n=nkb),
                     memory_space=pltpu.VMEM)
        for j in range(W)
    ]
    if block_m == m:
        m_out = m_true if m_true is not None else m
        m_out = min(m, max(16, -(-m_out // 8) * 8))
    else:
        m_out = block_m
    kern = functools.partial(_intb_a8_kernel, bits=bits, W=W, group=group,
                             m_out=m_out)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=x_specs + [
            pl.BlockSpec((block_kp, block_n), lambda i, jj, kk: (kk, jj),
                         memory_space=pltpu.VMEM),
        ] + s_specs,
        out_specs=pl.BlockSpec((m_out, block_n), lambda i, jj, kk: (i, jj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_out * pl.cdiv(m, block_m), n),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_out, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*([x_q] * W), packed, *([scales[:, None, :]] * W))


def intb_matmul_ref(x, packed, scales, bits: int, bias=None,
                    group: int = INTB_GROUP):
    w = intb_unpack_jnp(packed, scales, bits, x.shape[-1], group)
    y = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    return y


def intb_matmul(x, packed, scales, bits: int | None = None, bias=None,
                group: int = INTB_GROUP, use_pallas: bool | None = None):
    """Dispatcher mirroring int4_matmul: Pallas on TPU (EXL3TPU_INTB_A8=1
    selects the W·A8 int8-MXU kernel, EXL3TPU_INTB_PALLAS=0 the jnp unpack
    path), jnp reference elsewhere. bits inferred from shapes when None."""
    import os

    shape = x.shape
    k = shape[-1]
    kp, n = packed.shape
    if bits is None:
        bits = intb_bits_from_shapes(kp, scales.shape[0], group)
    W, kp2, k_pad = intb_geometry(k, bits, group)
    assert kp == kp2, (kp, kp2, bits)
    x2 = x.reshape(-1, k)
    if use_pallas is None:
        env = os.environ.get("EXL3TPU_INTB_PALLAS")
        if env is not None:
            use_pallas = env not in ("0", "false")
        else:
            use_pallas = jax.default_backend() not in ("cpu",)
    interpret = jax.default_backend() in ("cpu",)
    # the W·A8 int8-MXU variant is the TPU default: int6 decode measured
    # 37.7 vs 21.2 tok/s for the bf16-dequant kernel at 8B geometry
    # (2026-08-18); EXL3TPU_INTB_A8=0 reverts to the bf16 path
    a8_env = os.environ.get("EXL3TPU_INTB_A8", "")
    use_a8 = (a8_env not in ("", "0", "false")
              or (a8_env == "" and jax.default_backend() not in ("cpu",)))
    if a8_env in ("0", "false"):
        use_a8 = False
    if use_a8:
        m = x2.shape[0]
        xf = x2.astype(jnp.float32)
        xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0 + 1e-12
        x_q = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        if k_pad != k:
            x_q = jnp.pad(x_q, ((0, 0), (0, k_pad - k)))
        m_pad = -m % 32
        if m_pad:
            x_q = jnp.pad(x_q, ((0, m_pad), (0, 0)))
        y = intb_matmul_pallas_a8(x_q, packed, scales, bits, group=group,
                                  m_true=m, interpret=interpret)
        y = y[:m]
        y = y * xs
    elif use_pallas:
        m = x2.shape[0]
        xb = x2.astype(jnp.bfloat16)
        if k_pad != k:
            xb = jnp.pad(xb, ((0, 0), (0, k_pad - k)))
        m_pad = -m % 16
        if m_pad:
            xb = jnp.pad(xb, ((0, m_pad), (0, 0)))
        y = intb_matmul_pallas(xb, packed, scales, bits, group=group,
                               interpret=interpret)
        if m_pad:
            y = y[:m]
    else:
        y = intb_matmul_ref(x2, packed, scales, bits, group=group)
    if bias is not None:
        y = y + bias
    return y.reshape(shape[:-1] + (n,))


def int4_matmul(x, packed, scales, bias=None, group: int = INT4_GROUP,
                use_pallas: bool | None = None):
    """Dispatcher: Pallas kernel on TPU (EXL3TPU_INT4_PALLAS=0 forces the
    jnp unpack path; EXL3TPU_INT4_A8=1 selects the W4A8 int8-MXU kernel),
    jnp reference elsewhere."""
    import os

    # the W4A8 int8-MXU kernel is the default on TPU: model-level decode
    # measured 75 vs 60 tok/s for the bf16-dequant kernel at 8B geometry
    # (2026-08-17); EXL3TPU_INT4_A8=0 reverts. Both sit near v5e's
    # per-element ingest ceiling (~50-60% of the 0.56 B/w roofline, see
    # doc/performance.md) — scalar-grid sub-byte GEMV cannot go fully
    # memory-bound on this VPU:HBM ratio.
    a8 = os.environ.get("EXL3TPU_INT4_A8", "")
    use_a8 = (a8 not in ("", "0", "false") or
              (a8 == "" and jax.default_backend() not in ("cpu",)))
    if a8 in ("0", "false"):
        use_a8 = False
    if use_a8:
        return int4_matmul_a8(
            x, packed, scales, bias=bias, group=group,
            interpret=jax.default_backend() in ("cpu",))

    shape = x.shape
    k = shape[-1]
    n = packed.shape[1]
    x2 = x.reshape(-1, k)
    if use_pallas is None:
        env = os.environ.get("EXL3TPU_INT4_PALLAS")
        if env is not None:
            use_pallas = env not in ("0", "false")
        else:
            use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        m = x2.shape[0]
        m_pad = -m % 16  # bf16 sublane alignment for tiny decode batches
        if m_pad:
            x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
        y = int4_matmul_pallas(x2, packed, scales, group=group)
        if m_pad:
            y = y[:m]
    else:
        y = int4_matmul_ref(x2, packed, scales, group=group)
    if bias is not None:
        y = y + bias
    return y.reshape(shape[:-1] + (n,))
