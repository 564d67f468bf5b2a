"""Pallas flash attention family: paged/linear, decode + SD verify + prefill.

Feature reference: /root/reference/exllamav3/modules/attention_fn/
triton_paged.py (split-KV flash decode + prefill over block tables, fused
quantized-cache `qc` variants) and exllamav3_ext/cache/q_cache.cu (2-8 bit
32-group packed KV). TPU design — one kernel body, several spec builders:

  * grid (B, Hg, Qb, MP): the page/time dim is innermost-sequential with
    online-softmax accumulators in VMEM scratch; B/heads/q-blocks parallel.
  * block tables ride scalar prefetch so the pipeline DMAs exactly the pages
    each sequence owns. Per q-block [first_page, last_page] bounds (causal +
    sliding window + true sequence length) are precomputed host-side; the
    index map CLAMPS the page index into that range, so out-of-range grid
    steps re-issue the same block index and the Pallas pipeline elides the
    DMA — trailing/dead pages cost neither bandwidth nor compute.
  * decode / spec-verify (small S): all KV heads ride in one block (each
    page fetched once per sequence, contiguous DMA), queries laid out
    (S*G, D) per head feed the MXU.
  * prefill (large S): KV heads move to the grid, q-blocks of QT tokens x G
    GQA heads give (QT*G, D) score matmuls per page — K re-reads scale as
    S/QT like any flash prefill.
  * quantized caches (2-8 bits) are dequantized IN-KERNEL from the packed
    int32 words: J=32/bits lane-parallel shift+mask passes concatenated
    along lanes yield the channels in a static permutation (see
    channel_perm); q is pre-permuted and the output unpermuted outside, so
    the kernel never materializes a dequantized cache. Odd bit-widths
    (3/5/6/7) store as power-of-2 BIT PLANES (kv_quant.ODD_PLANES) and
    unpack with one pass per plane — every width 2-8 runs in-kernel.
  * MLA absorbed decode AND prefill: Hk=1, V = leading `v_from_k` channels
    of K (the latent), so V is never fetched separately; the quantized-
    latent layout ([packed latent | bf16 rope-key]) rides an extra input
    concatenated after dequant.
  * SWA rings (flash_ring_attention): the kernel reads each sequence's ring
    directly from the state arrays via scalar-prefetched slot rows, masking
    by per-slot absolute positions — no gather copy.
  * return_stats: emit the UNNORMALIZED (acc, m, l) online-softmax triple
    instead of the normalized output, so callers merge attention over
    disjoint key sources (DSV4 window+pool+sink, sequence-parallel shards)
    into one exact softmax.

Numerics: f32 accumulation, scale-then-softcap, per-q-head sink logits join
the softmax denominator (gpt-oss), sliding-window masking, per-row causal
masking by absolute position (padded rows mask themselves out).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import PAGE_SIZE

NEG_INF = -1e30

# in-kernel dequant: word-aligned widths unpack in one repeat+shift pass;
# odd widths (3/5/6/7) decompose into power-of-2 bit planes (ops/kv_quant.py
# ODD_PLANES) and unpack in one pass per plane
FAST_BITS = (0, 2, 3, 4, 5, 6, 7, 8)


# -- quantized-channel permutation helpers -----------------------------------

@functools.lru_cache(maxsize=None)
def channel_perm(D: int, bits: int) -> tuple:
    """Lane order produced by the in-kernel parallel unpack.

    The packed layout (ops/kv_quant.py) stores the value with in-group index
    i in word i//J at field (i%J)*bits, J = 32//bits, words laid out
    group-major. The kernel widens the word block J-fold with pltpu.repeat
    (tile order: wwide[p] = w[p %% gw] — repeats are near-free on TPU where
    lane CONCATS of narrow slices relayout at ~50x the cost) and extracts
    field p//gw with one variable shift, so lane position
    p = j*gw + group*bits + w holds channel 32*group + w*J + j.
    Returns (perm, inv_perm) as numpy arrays: x_kernel = x[..., perm];
    x = x_kernel[..., inv_perm]. Odd bit-widths use the layout of their
    LARGEST bit plane (kv_quant packs the other planes to match).
    """
    from .kv_quant import plane_max

    pb = plane_max(bits)
    assert pb in (1, 2, 4, 8) and D % 32 == 0
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
def _scale_expand_mat(D: int, bits: int, factor: float = 1.0) -> np.ndarray:
    """(g, D) f32 matrix: scales (T, g) @ E -> per-lane scale*factor in the
    kernel's permuted channel order (lane p -> group (p %% (g*pb)) // pb,
    pb = the layout plane width). A (T,4)x(4,128) matmul per head-page —
    measured ~2 us total per decode step, not worth restructuring away."""
    from .kv_quant import plane_max

    pb = plane_max(bits)
    g = D // 32
    E = np.zeros((g, D), np.float32)
    for p in range(D):
        E[(p % (g * pb)) // pb, p] = factor
    return E


@functools.lru_cache(maxsize=None)
def _field_shifts(D: int, bits: int) -> np.ndarray:
    """(nplanes, D) uint32 per-lane shift amounts for the repeat-widened
    unpack — one row per bit plane (a single row for word-aligned widths):
    lane p extracts field p // gw_p of word p %% gw_p."""
    from .kv_quant import ODD_PLANES

    g = D // 32
    rows = []
    for pb in ODD_PLANES.get(bits, (bits,)):
        gw = g * pb
        rows.append((np.arange(D, dtype=np.uint32) // gw) * pb)
    return np.stack(rows, axis=0)


@functools.lru_cache(maxsize=None)
def _merged_scale_expand(D: int, bits: int, Hk: int,
                         factor: float = 1.0) -> np.ndarray:
    """(Hk*g, Hk*D) f32 expand for the MERGED-HEAD unpack: all heads'
    packed words ride one dense 128-lane-wide view (T, Hk*gw), so the
    repeat-widen produces lanes ordered (field j, head h, word wl); lane p
    belongs to head (p %% (Hk*gw)) // gw, group (p %% gw) // bits.

    Why merged: the per-head unpack operates on (T, gw) slices — gw = 16
    lanes at 4 bits — so every op runs on 12.5%-full vector tiles. Measured
    on v5e (tools/dequant_probe.py, 16k ctx, Hk=8): per-head 531 us vs
    merged 264 us vs dense-bf16 fetch 298 us — the merged layout is what
    makes quantized KV decode actually FASTER than bf16."""
    g = D // 32
    gw = g * bits
    E = np.zeros((Hk * g, Hk * D), np.float32)
    for p in range(Hk * D):
        wlane = p % (Hk * gw)
        h = wlane // gw
        group = (wlane % gw) // bits
        E[h * g + group, p] = factor
    return E


@functools.lru_cache(maxsize=None)
def _merged_field_shifts(D: int, bits: int, Hk: int) -> np.ndarray:
    """(1, Hk*D) uint32 per-lane shifts for the merged-head unpack: lane p
    extracts field p // (Hk*gw) of word p %% (Hk*gw)."""
    gw = (D // 32) * bits
    return ((np.arange(Hk * D, dtype=np.uint32) // np.uint32(Hk * gw))
            * np.uint32(bits))[None]


@functools.lru_cache(maxsize=None)
def _h_block(D: int) -> np.ndarray:
    """Block-diagonal normalized H32 over D channels (symmetric, H@H=I)."""
    from .kv_quant import _h32n

    g = D // 32
    h = _h32n()
    out = np.zeros((D, D), np.float32)
    for i in range(g):
        out[i * 32:(i + 1) * 32, i * 32:(i + 1) * 32] = h
    return out


@functools.lru_cache(maxsize=None)
def _q_transform(D: int, bits: int, extra: int = 0,
                 factor: float = 1.0) -> np.ndarray:
    """(D+extra, D+extra): rotate q per group THEN land in the kernel's
    permuted channel order (identity on the trailing `extra` channels).
    Scores are rotation-invariant, so the stored-KV rotation costs only this
    one activation-side matmul — which also absorbs the midpoint grid's 2/N
    dequant factor (`factor`, applied to the quantized block only)."""
    perm, _ = channel_perm(D, bits)
    m = _h_block(D)[:, perm] * factor
    if not extra:
        return m
    out = np.zeros((D + extra, D + extra), np.float32)
    out[:D, :D] = m
    out[D:, D:] = np.eye(extra, dtype=np.float32)
    return out


@functools.lru_cache(maxsize=None)
def _out_transform(Dv: int, bits: int, factor: float = 1.0) -> np.ndarray:
    """(Dv, Dv): un-permute the kernel's V channel order AND undo the group
    rotation on the attention output (absorbing the 2/N dequant factor)."""
    perm, _ = channel_perm(Dv, bits)
    return _h_block(Dv)[perm, :] * factor


def _dequant_rows(words, scales, bits: int, exp_mat, shvec, compand_a: float):
    """words (T, g*bits) int32, scales (T, g) bf16 -> (T, D) f32 ROTATED
    values in permuted channel order. Mirrors ops/kv_quant.dequantize_kv
    (midpoint grid / cubic compander) minus the group un-rotation, which the
    caller folds into the activations.

    Built from ops that are near-free on TPU (measured): one pltpu.repeat
    widening (a lane CONCAT of J narrow slices costs ~130 us per decode
    step at 8K context; the tile-repeat costs ~nothing), one variable shift
    by a constant per-lane vector, mask, casts, and the scale-expand
    matmul. The midpoint grid's 2/N factor folds into the activation-side
    transforms (zero in-kernel cost)."""
    from jax.experimental.pallas import tpu as pltpu
    from .kv_quant import ODD_PLANES

    N = 1 << bits
    if bits in ODD_PLANES:
        # one repeat+shift+mask pass per bit plane; planes OR together into
        # the full field (planes were packed in this lane order)
        g = scales.shape[-1]
        qacc = None
        off = 0
        shift = 0
        for i, pb in enumerate(ODD_PLANES[bits]):
            gw = g * pb
            wide = pltpu.repeat(words[:, off:off + gw].astype(jnp.uint32),
                                32 // pb, axis=1)           # (T, D)
            f = (wide >> shvec[i:i + 1, :]) & jnp.uint32((1 << pb) - 1)
            qacc = f if qacc is None else qacc | (f << shift)
            off += gw
            shift += pb
        q = qacc.astype(jnp.int32).astype(jnp.float32)
    else:
        J = 32 // bits
        mask = jnp.uint32((1 << bits) - 1)
        wwide = pltpu.repeat(words.astype(jnp.uint32), J, axis=1)  # (T, D)
        # uint32->f32 casts are unsupported in Mosaic; fields are < 2^bits
        # so the int32 detour is exact
        q = ((wwide >> shvec) & mask).astype(jnp.int32).astype(jnp.float32)
    se = jnp.dot(scales.astype(jnp.float32), exp_mat,
                 preferred_element_type=jnp.float32)
    if compand_a > 0.0:
        t = (q + np.float32((1 - N) / 2)) * np.float32(2.0 / N)
        b = 1.0 - compand_a
        t = t * (np.float32(compand_a) + np.float32(b) * t * t)
        return t * se
    # midpoint grid ((2q+1)/N - 1) * s; 2/N lives in mq/mo outside
    return (q + np.float32((1 - N) / 2)) * se


# -- kernel body ---------------------------------------------------------------

def _flash_kernel(
    # scalar prefetch: [bt?] pf pl   (bt only in paged mode)
    *refs,
    layout: str,          # "paged" | "linear"
    Hb: int,              # KV heads per block
    QT: int,              # query tokens per block
    G: int,               # GQA group (q heads per kv head)
    D: int,               # K channels (post-concat for MLA-quant)
    Dv: int,              # V channels
    TB: int,              # time block (PAGE_SIZE for paged)
    flat_heads: bool,     # K/V lanes are (Hk*D); block is this head's slice
    k_bits: int,
    v_bits: int,
    compand_a: float,
    d_extra: int,         # trailing unquantized K channels (MLA rope key)
    v_from_k: bool,       # V = leading Dv channels of K
    scale: float,
    sliding_window: int,
    logit_softcap: float,
    has_sinks: bool,
    return_stats: bool = False,
    has_page_idx: bool = False,
):
    import jax.experimental.pallas as pl

    # -- unpack refs ----------------------------------------------------------
    i = 0
    if layout == "paged":
        bt_ref = refs[i]; i += 1
        if has_page_idx:
            # compacted tables (sequence parallelism): entry p's LOGICAL
            # page index within the sequence (-1 = hole / non-resident)
            pidx_ref = refs[i]; i += 1
    elif layout == "ring":
        rows_ref = refs[i]; i += 1   # (B,) int32 state-slot rows
    pf_ref = refs[i]; i += 1
    pl_ref = refs[i]; i += 1
    q_ref = refs[i]; i += 1          # (1, Hb, QT, G, D)
    if k_bits:
        kq_ref = refs[i]; i += 1     # (1, TB, Hb, (D-d_extra)//32*k_bits)
        ks_ref = refs[i]; i += 1     # (1, TB, Hb, (D-d_extra)//32)
        if d_extra:
            ke_ref = refs[i]; i += 1  # (1, TB, Hb, d_extra)
    else:
        k_ref = refs[i]; i += 1      # (1, TB, Hb, D)
    if not v_from_k:
        if v_bits:
            vq_ref = refs[i]; i += 1
            vs_ref = refs[i]; i += 1
        else:
            v_ref = refs[i]; i += 1
    if layout == "ring":
        kpos_ref = refs[i]; i += 1   # (1, 1, TB) int32 per-slot positions
    qpos_ref = refs[i]; i += 1       # (1, QT*G, 1) int32
    sink_ref = refs[i]; i += 1       # (Hb, QT*G, 1) f32
    if k_bits:
        ematk_ref = refs[i]; i += 1  # ((D-d_extra)//32, D-d_extra) f32
        shk_ref = refs[i]; i += 1    # (1, D-d_extra) uint32 field shifts
    if v_bits and not v_from_k:
        ematv_ref = refs[i]; i += 1  # (Dv//32, Dv) f32
        shv_ref = refs[i]; i += 1    # (1, Dv) uint32
    o_ref = refs[i]; i += 1          # (1, Hb, QT, G, Dv)
    if return_stats:
        ms_ref = refs[i]; i += 1     # (1, Hb, QT, G) row maxima
        ls_ref = refs[i]; i += 1     # (1, Hb, QT, G) exp sums
    m_ref, l_ref, acc_ref = refs[i], refs[i + 1], refs[i + 2]

    b = pl.program_id(0)
    qt = pl.program_id(2)
    p = pl.program_id(3)
    num_p = pl.num_programs(3)
    R = QT * G  # score rows per head

    @pl.when(p == 0)
    def _():
        if has_sinks:
            for h in range(Hb):
                rows = slice(h * R, (h + 1) * R)
                m_ref[rows, :] = sink_ref[h].astype(jnp.float32)
            l_ref[:] = jnp.ones_like(l_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    in_range = (p >= pf_ref[b, qt]) & (p <= pl_ref[b, qt])

    @pl.when(in_range)
    def _():
        qpos = qpos_ref[0]                         # (R, 1) int32
        if k_bits:
            emat_k = ematk_ref[:]
            shk = shk_ref[:]
        if v_bits and not v_from_k:
            emat_v = ematv_ref[:]
            shv = shv_ref[:]
        for h in range(Hb):
            rows = slice(h * R, (h + 1) * R)
            q = q_ref[0, h].reshape(R, D).astype(jnp.float32)
            if k_bits:
                k = _dequant_rows(kq_ref[0, :, h, :], ks_ref[0, :, h, :],
                                  k_bits, emat_k, shk, compand_a)
                if d_extra:
                    k = jnp.concatenate(
                        [k, ke_ref[0, :, h, :].astype(jnp.float32)], axis=-1)
            elif flat_heads:
                k = k_ref[0].astype(jnp.float32)           # (TB, D)
            else:
                k = k_ref[0, :, h, :].astype(jnp.float32)  # (TB, D)
            if v_from_k:
                v = k[:, :Dv]
            elif v_bits:
                v = _dequant_rows(vq_ref[0, :, h, :], vs_ref[0, :, h, :],
                                  v_bits, emat_v, shv, compand_a)
            elif flat_heads:
                v = v_ref[0].astype(jnp.float32)
            else:
                v = v_ref[0, :, h, :].astype(jnp.float32)

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if logit_softcap:
                s = jnp.tanh(s / logit_softcap) * logit_softcap
            if layout == "ring":
                # ring slots carry arbitrary absolute positions; -1 = never
                # written, future positions = stale speculative writes. The
                # whole ring rides one block (full-dim blocks are exempt
                # from tile-shape rules), so TB == W here.
                kp = kpos_ref[0]                           # (1, W)
                mask = (kp >= 0) & (kp <= qpos)
            else:
                if has_page_idx:
                    lp = pidx_ref[b, p]  # logical page index (SMEM scalar)
                else:
                    lp = p
                kp = lp * TB + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                mask = kp <= qpos
                if has_page_idx:
                    mask &= lp >= 0
            if sliding_window:
                mask &= kp > qpos - sliding_window
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_ref[rows, :]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            ps = jnp.exp(s - m_new)
            l_ref[rows, :] = l_ref[rows, :] * alpha + jnp.sum(
                ps, axis=1, keepdims=True)
            acc_ref[rows, :] = acc_ref[rows, :] * alpha + jnp.dot(
                ps, v, preferred_element_type=jnp.float32)
            m_ref[rows, :] = m_new

    @pl.when(p == num_p - 1)
    def _():
        if return_stats:
            # merging caller: emit UNNORMALIZED acc + the online stats
            o_ref[0] = acc_ref[:].reshape(Hb, QT, G, Dv).astype(o_ref.dtype)
            ms_ref[0] = m_ref[:].reshape(Hb, QT, G)
            ls_ref[0] = l_ref[:].reshape(Hb, QT, G)
        else:
            o = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
            o_ref[0] = o.reshape(Hb, QT, G, Dv).astype(o_ref.dtype)


def _flash_kernel_merged(
    # scalar prefetch: [bt?] [pidx?] pf pl
    *refs,
    layout: str,          # "paged" | "linear"
    R: int,               # stacked score rows = Hk * S * G
    DW: int,              # merged K lane width = Hk * D
    DWv: int,             # merged V lane width = Hk * Dv
    TB: int,
    k_bits: int,
    v_bits: int,
    compand_a: float,
    scale: float,
    sliding_window: int,
    logit_softcap: float,
    has_sinks: bool,
    return_stats: bool = False,
    has_page_idx: bool = False,
):
    """MERGED-HEAD quantized decode/verify body: all KV heads' packed words
    ride one dense lane dim, ONE unpack chain dequantizes every head, and a
    block-structured Q (rows of head h carry q_h in head-h lanes, zeros
    elsewhere) turns the per-head score loop into a single MXU call. The
    output rides the same merged lanes; the caller extracts each row block's
    own head lanes (see _merged_scale_expand for the measured motivation)."""
    import jax.experimental.pallas as pl

    i = 0
    if layout == "paged":
        bt_ref = refs[i]; i += 1
        if has_page_idx:
            pidx_ref = refs[i]; i += 1
    pf_ref = refs[i]; i += 1
    pl_ref = refs[i]; i += 1
    qb_ref = refs[i]; i += 1         # (1, R, DW) block-structured queries
    kq_ref = refs[i]; i += 1         # (1, TB, DW*k_bits//32)
    ks_ref = refs[i]; i += 1         # (1, TB, DW//32)
    vq_ref = refs[i]; i += 1
    vs_ref = refs[i]; i += 1
    qpos_ref = refs[i]; i += 1       # (1, R, 1)
    sink_ref = refs[i]; i += 1       # (R, 1)
    ematk_ref = refs[i]; i += 1      # (DW//32, DW)
    shk_ref = refs[i]; i += 1        # (1, DW)
    ematv_ref = refs[i]; i += 1
    shv_ref = refs[i]; i += 1
    o_ref = refs[i]; i += 1          # (1, R, DWv)
    if return_stats:
        ms_ref = refs[i]; i += 1     # (1, R, 1)
        ls_ref = refs[i]; i += 1
    m_ref, l_ref, acc_ref = refs[i], refs[i + 1], refs[i + 2]

    b = pl.program_id(0)
    p = pl.program_id(3)
    num_p = pl.num_programs(3)

    @pl.when(p == 0)
    def _():
        if has_sinks:
            m_ref[:] = sink_ref[:].astype(jnp.float32)
            l_ref[:] = jnp.ones_like(l_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    in_range = (p >= pf_ref[b, 0]) & (p <= pl_ref[b, 0])

    @pl.when(in_range)
    def _():
        qpos = qpos_ref[0]                          # (R, 1)
        k = _dequant_rows(kq_ref[0], ks_ref[0], k_bits, ematk_ref[:],
                          shk_ref[:], compand_a)    # (TB, DW)
        v = _dequant_rows(vq_ref[0], vs_ref[0], v_bits, ematv_ref[:],
                          shv_ref[:], compand_a)    # (TB, DWv)
        s = jax.lax.dot_general(
            qb_ref[0].astype(jnp.float32), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if logit_softcap:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        if has_page_idx:
            lp = pidx_ref[b, p]
        else:
            lp = p
        kp = lp * TB + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = kp <= qpos
        if has_page_idx:
            mask &= lp >= 0
        if sliding_window:
            mask &= kp > qpos - sliding_window
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        ps = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(ps, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            ps, v, preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(p == num_p - 1)
    def _():
        if return_stats:
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)
            ms_ref[0] = m_ref[:]
            ls_ref[0] = l_ref[:]
        else:
            o = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
            o_ref[0] = o.astype(o_ref.dtype)


# -- host-side wrapper ---------------------------------------------------------

def _choose_blocks(S: int, G: int, Hk: int):
    """-> (Hb, QT): wide for decode/verify, tall for prefill. Tall q blocks
    target ~1024 score rows (bigger blocks divide the K re-read factor S/QT;
    VMEM stays modest: q ~1 MB + accumulators ~4 MB at Dv=512). QT is a
    multiple of 8 so sliced q-position blocks satisfy Mosaic's sublane
    divisibility."""
    if S <= 32:
        return Hk, S
    QT = max(8, min(S, max(1, 1024 // G)))
    QT = ((QT + 7) // 8) * 8
    return 1, QT


def _pad_to(x, size, axis, value=None):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    if value is None:  # edge-pad (repeat last row: keeps positions monotone)
        idx = jnp.concatenate([
            jnp.arange(x.shape[axis]),
            jnp.full((pad,), x.shape[axis] - 1)]).astype(jnp.int32)
        return jnp.take(x, idx, axis=axis)
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logit_softcap", "k_bits",
                     "v_bits", "latent", "compand_a", "return_stats",
                     "interpret", "out_dtype"),
)
def flash_attention(
    q,                 # (B, S, Hq, D)
    layer_state: dict,  # {"k","v"} | {"k_q","k_s","v_q","v_s"} | {"kv"} |
                        # {"kv_q","kv_s","k_pe"}  — paged (P, PS, Hk, ·) or
                        # linear (B, T, Hk, ·)
    q_positions,       # (B, S) int32 absolute positions
    total_lens,        # (B,) int32 sequence length AFTER the cache update
    block_tables=None,  # (B, MP) int32 (paged) | None (linear)
    page_indices=None,  # (B, MP) int32: block_tables is COMPACTED (holes
                        # removed) and entry p covers logical page
                        # page_indices[b, p] of the sequence, ascending,
                        # -1 = unused tail. Sequence-parallel shards pass
                        # their resident-page tables this way so per-step
                        # cost scales with resident pages only.
    sinks=None,        # (Hq,) f32
    scale: float = 1.0,
    sliding_window: int = 0,
    logit_softcap: float = 0.0,
    k_bits: int = 0,
    v_bits: int = 0,
    latent: int = 0,   # MLA: V = leading `latent` channels of K
    compand_a: float = 0.0,
    return_stats: bool = False,
    interpret: bool = False,
    out_dtype=jnp.float32,
):
    """Returns (B, S, Hq, Dv) out_dtype — or, with return_stats, the
    UNNORMALIZED (acc, m, l) online-softmax triple (acc (B,S,Hq,Dv) f32,
    m/l (B,S,Hq) f32) for cross-source merging (DSV4 window+pool+sink,
    sequence-parallel shards). See module docstring."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, Hq, D_in = q.shape
    mla = "kv" in layer_state or "kv_q" in layer_state
    # merged-head storage (even bits, ops/kv_quant.merged_layout): packed
    # words of all heads share one dense lane dim (P, TB, Hk*gw)
    merged_storage = (not mla and k_bits > 0
                      and layer_state["k_q"].ndim == 3)
    if mla:
        assert latent > 0
        Hk = 1
    elif merged_storage:
        Hk = layer_state["k_s"].shape[-1] // (D_in // 32)
    else:
        karr = layer_state["k"] if "k" in layer_state else layer_state["k_q"]
        Hk = karr.shape[2]
    G = Hq // Hk
    v_from_k = mla
    d_extra = 0

    if merged_storage and (S > 32 or S * Hq > 256):
        # prefill / large verify blocks: dequantize the pool with full-lane
        # XLA ops (transient (P, TB, Hk, D) f32) and take the dense-bf16
        # kernel path — the tall quantized in-kernel path would fetch and
        # unpack per head on 12.5%-full tiles (see _merged_scale_expand)
        from .kv_quant import dequantize_kv_stored

        kd = dequantize_kv_stored(
            layer_state["k_q"], layer_state["k_s"], k_bits, Hk, True,
            jnp.float32, compand_a)
        vd = dequantize_kv_stored(
            layer_state["v_q"], layer_state["v_s"], v_bits, Hk, True,
            jnp.float32, compand_a)
        return flash_attention(
            q, {"k": kd, "v": vd}, q_positions, total_lens,
            block_tables=block_tables, page_indices=page_indices,
            sinks=sinks, scale=scale, sliding_window=sliding_window,
            logit_softcap=logit_softcap, k_bits=0, v_bits=0, latent=0,
            compand_a=0.0, return_stats=return_stats, interpret=interpret,
            out_dtype=out_dtype)

    # -- resolve K/V arrays + activation-side rotate/permute transforms -------
    mq = mo = None  # q-side and output-side (D, D)/(Dv, Dv) matrices
    fac_k = 1.0 if compand_a > 0.0 else 2.0 / (1 << k_bits) if k_bits else 1.0
    fac_v = 1.0 if compand_a > 0.0 else 2.0 / (1 << v_bits) if v_bits else 1.0
    if mla:
        if k_bits:
            kq = layer_state["kv_q"]
            ks = layer_state["kv_s"]
            ke = layer_state["k_pe"]
            d_extra = ke.shape[-1]
            mq = _q_transform(latent, k_bits, extra=d_extra, factor=fac_k)
            mo = _out_transform(latent, k_bits, factor=fac_k)
            k_inputs = (kq, ks, ke)
            D = latent + d_extra
        else:
            k_inputs = (layer_state["kv"],)
            D = layer_state["kv"].shape[-1]
        v_inputs = ()
        Dv = latent
    else:
        if k_bits:
            k_inputs = (layer_state["k_q"], layer_state["k_s"])
            D = layer_state["k_s"].shape[-1] * 32 // (Hk if merged_storage
                                                      else 1)
            mq = _q_transform(D, k_bits, factor=fac_k)
        else:
            k_inputs = (layer_state["k"],)
            D = layer_state["k"].shape[-1]
        if v_bits:
            v_inputs = (layer_state["v_q"], layer_state["v_s"])
            Dv = layer_state["v_s"].shape[-1] * 32 // (Hk if merged_storage
                                                       else 1)
            mo = _out_transform(Dv, v_bits, factor=fac_v)
        else:
            v_inputs = (layer_state["v"],)
            Dv = layer_state["v"].shape[-1]
    assert D == D_in, f"q head_dim {D_in} != cache K width {D}"

    if mq is not None:
        q = (q.astype(jnp.float32) @ jnp.asarray(mq)).astype(q.dtype)

    # -- block geometry -------------------------------------------------------
    paged = block_tables is not None
    first = k_inputs[0]
    if paged:
        # usually PAGE_SIZE; DSV4 compressor pools alias the same block
        # tables with epp entries per page
        TB = first.shape[1]
        MPk = block_tables.shape[1]
    else:
        T = first.shape[1]
        TB = next((t for t in (256, 128, 64, 32, 16, 8) if T % t == 0), 0)
        if TB == 0:
            raise ValueError(f"linear cache length {T} not divisible by 8")
        MPk = T // TB

    Hb, QT = _choose_blocks(S, G, Hk)
    # Mosaic only allows slicing the heads dim when it rides the lane axis:
    # per-head tall fetch needs dense K/V with 128-multiple widths (flattened
    # (Hk*D) lanes view, free). Otherwise fetch all heads per block — same
    # total bytes, just less grid parallelism.
    flat_heads = Hb == 1 and Hk > 1
    if flat_heads and (k_bits or v_bits or D % 128 or Dv % 128):
        Hb = Hk
        flat_heads = False
    Hg = Hk // Hb
    S_pad = ((S + QT - 1) // QT) * QT
    Qb = S_pad // QT

    qk = q.reshape(B, S, Hk, G, D_in).transpose(0, 2, 1, 3, 4)
    qk = _pad_to(qk, S_pad, axis=2)               # (B, Hk, S_pad, G, D)
    pos_pad = _pad_to(q_positions.astype(jnp.int32), S_pad, axis=1)

    # per-q-block page bounds (host precompute, rides scalar prefetch)
    pos_blk = pos_pad.reshape(B, Qb, QT)
    last_needed = jnp.minimum(pos_blk[:, :, -1], total_lens[:, None] - 1)
    if page_indices is not None:
        # compacted table: entries hold arbitrary ascending logical page
        # indices; the grid range per q-block is the COUNT of entries whose
        # logical page the block needs (absent pages cost no grid step)
        pi = page_indices.astype(jnp.int32)
        pvalid = pi >= 0
        last_page = last_needed // TB                          # (B, Qb)
        cnt_le = jnp.sum(pvalid[:, None, :]
                         & (pi[:, None, :] <= last_page[:, :, None]), axis=2)
        pl_arr = (cnt_le - 1).astype(jnp.int32)  # -1 => no resident pages
        if sliding_window:
            first_page = jnp.maximum(
                pos_blk[:, :, 0] - sliding_window + 1, 0) // TB
            cnt_lt = jnp.sum(pvalid[:, None, :]
                             & (pi[:, None, :] < first_page[:, :, None]),
                             axis=2)
            pf_arr = cnt_lt.astype(jnp.int32)
        else:
            pf_arr = jnp.zeros_like(pl_arr)
    else:
        pl_arr = jnp.clip(last_needed // TB, 0, MPk - 1).astype(jnp.int32)
        if sliding_window:
            first_needed = jnp.maximum(
                pos_blk[:, :, 0] - sliding_window + 1, 0)
            pf_arr = jnp.clip(first_needed // TB, 0, MPk - 1).astype(jnp.int32)
            pf_arr = jnp.minimum(pf_arr, pl_arr)
        else:
            pf_arr = jnp.zeros_like(pl_arr)

    qpos_rows = jnp.repeat(pos_pad, G, axis=1)[..., None]  # (B, S_pad*G, 1)
    has_sinks = sinks is not None
    if has_sinks:
        sink_rows = jnp.broadcast_to(
            sinks.astype(jnp.float32).reshape(Hk, 1, G), (Hk, QT, G)
        ).reshape(Hk, QT * G, 1)
    else:
        sink_rows = jnp.zeros((Hk, QT * G, 1), jnp.float32)

    # -- merged-head quantized decode/verify fast path -------------------------
    # All heads' packed words ride ONE dense lane view so the unpack chain
    # runs on full vector tiles (per-head gw-lane slices are 12.5%-full at 4
    # bits; measured 2x on v5e — see _merged_scale_expand). Block-structured
    # queries (row block h carries q_h in head-h lanes, zeros elsewhere)
    # replace the per-head score loop with one MXU call.
    has_pidx = page_indices is not None

    def _teff(b, qt_, p, pf, pl_):
        # max(·, 0): compacted tables may report pl = -1 (no resident
        # pages for this shard) — clamp keeps the DMA address valid while
        # in_range masks the whole step
        return jnp.clip(p, jnp.maximum(pf[b, qt_], 0),
                        jnp.maximum(pl_[b, qt_], 0))

    def _split(sref):
        if paged:
            if has_pidx:
                bt, _pi, pf, pl_ = sref
            else:
                bt, pf, pl_ = sref
            return bt, pf, pl_
        pf, pl_ = sref
        return None, pf, pl_

    def kidx(b, hg, qt_, p, *sref):
        bt, pf, pl_ = _split(sref)
        if paged:
            return (bt[b, _teff(b, qt_, p, pf, pl_)], 0, hg, 0)
        return (b, _teff(b, qt_, p, pf, pl_), hg, 0)

    def kidx_flat(b, hg, qt_, p, *sref):
        bt, pf, pl_ = _split(sref)
        if paged:
            return (bt[b, _teff(b, qt_, p, pf, pl_)], 0, hg)
        return (b, _teff(b, qt_, p, pf, pl_), hg)

    R_m = Hk * S * G
    if merged_storage:
        # S<=32 guaranteed here (larger S took the dense-dequant path above)
        assert Qb == 1 and R_m <= 256 and not flat_heads
        g = D // 32
        gw = g * k_bits
        gv = Dv // 32
        gwv = gv * v_bits
        DW = Hk * D
        DWv = Hk * Dv
        DWq = Hk * gw
        Rp = S * G

        J = 32 // k_bits
        qk_m = qk[:, :, :S].reshape(B, Hk, Rp, J, gw).astype(jnp.float32)
        eye = jnp.asarray(np.eye(Hk, dtype=np.float32))
        qb = jnp.einsum("bhrjw,hk->bhrjkw", qk_m, eye).reshape(
            B, R_m, DW)

        kq_m = layer_state["k_q"]
        ks_m = layer_state["k_s"]
        vq_m = layer_state["v_q"]
        vs_m = layer_state["v_s"]

        qpos_m = jnp.tile(pos_pad[:, :S].repeat(G, axis=1),
                          (1, Hk))[..., None]            # (B, R_m, 1)
        if has_sinks:
            sink_m = jnp.broadcast_to(
                sinks.astype(jnp.float32).reshape(Hk, 1, G),
                (Hk, S, G)).reshape(R_m, 1)
        else:
            sink_m = jnp.zeros((R_m, 1), jnp.float32)

        in_specs_m = [
            pl.BlockSpec((1, R_m, DW), lambda b, hg, qt_, p, *s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, DWq), kidx_flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, Hk * g), kidx_flat,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, Hk * gwv), kidx_flat,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, Hk * gv), kidx_flat,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_m, 1), lambda b, hg, qt_, p, *s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_m, 1), lambda b, hg, qt_, p, *s: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        tensor_inputs_m = [qb, kq_m, ks_m, vq_m, vs_m, qpos_m, sink_m]
        for arr in (_merged_scale_expand(D, k_bits, Hk),
                    _merged_field_shifts(D, k_bits, Hk),
                    _merged_scale_expand(Dv, v_bits, Hk),
                    _merged_field_shifts(Dv, v_bits, Hk)):
            in_specs_m.append(pl.BlockSpec(
                arr.shape, lambda b, hg, qt_, p, *s: tuple(
                    0 for _ in arr.shape), memory_space=pltpu.VMEM))
            tensor_inputs_m.append(jnp.asarray(arr))

        out_specs_m = pl.BlockSpec(
            (1, R_m, DWv), lambda b, hg, qt_, p, *s: (b, 0, 0),
            memory_space=pltpu.VMEM)
        out_shape_m = [jax.ShapeDtypeStruct((B, R_m, DWv), jnp.float32)]
        if return_stats:
            st_spec = pl.BlockSpec(
                (1, R_m, 1), lambda b, hg, qt_, p, *s: (b, 0, 0),
                memory_space=pltpu.VMEM)
            out_specs_m = (out_specs_m, st_spec, st_spec)
            out_shape_m += [jax.ShapeDtypeStruct((B, R_m, 1),
                                                 jnp.float32)] * 2

        grid_spec_m = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=(3 + int(has_pidx)) if paged else 2,
            grid=(B, 1, 1, MPk),
            in_specs=in_specs_m,
            out_specs=out_specs_m,
            scratch_shapes=[
                pltpu.VMEM((R_m, 1), jnp.float32),
                pltpu.VMEM((R_m, 1), jnp.float32),
                pltpu.VMEM((R_m, DWv), jnp.float32),
            ],
        )
        kernel_m = functools.partial(
            _flash_kernel_merged,
            layout="paged" if paged else "linear",
            R=R_m, DW=DW, DWv=DWv, TB=TB,
            k_bits=k_bits, v_bits=v_bits, compand_a=compand_a,
            scale=scale, sliding_window=sliding_window,
            logit_softcap=logit_softcap, has_sinks=has_sinks,
            return_stats=return_stats, has_page_idx=has_pidx,
        )
        scalars_m = ((block_tables.astype(jnp.int32),) if paged else ())
        if has_pidx:
            scalars_m += (page_indices.astype(jnp.int32),)
        scalars_m += (pf_arr, pl_arr)
        res_m = pl.pallas_call(
            kernel_m,
            grid_spec=grid_spec_m,
            out_shape=(tuple(out_shape_m) if return_stats
                       else out_shape_m[0]),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*scalars_m, *tensor_inputs_m)

        Jv = 32 // v_bits

        def _fin_m(out_w):
            # extract each row block's own head lanes (merged lane order is
            # (field j, head h, word wl)), then un-permute + un-rotate
            out6 = out_w.reshape(B, Hk, Rp, Jv, Hk, gwv)
            out = jnp.einsum("bhrjkw,hk->bhrjw", out6, eye)
            out = out.reshape(B, Hk, S, G, Dv).transpose(0, 2, 1, 3, 4)
            out = out.reshape(B, S, Hq, Dv)
            if mo is not None:
                out = out @ jnp.asarray(mo)
            return out

        if not return_stats:
            return _fin_m(res_m).astype(out_dtype)
        acc_m, ms_m, ls_m = res_m
        ms_m = ms_m.reshape(B, Hk, S, G).transpose(0, 2, 1, 3).reshape(
            B, S, Hq)
        ls_m = ls_m.reshape(B, Hk, S, G).transpose(0, 2, 1, 3).reshape(
            B, S, Hq)
        return _fin_m(acc_m), ms_m, ls_m

    def tb_spec(width):
        return pl.BlockSpec((1, TB, Hb, width), kidx,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, Hb, QT, G, D_in),
                     lambda b, hg, qt_, p, *s: (b, hg, qt_, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    tensor_inputs = [qk]
    for arr in k_inputs + v_inputs:
        if flat_heads:
            w = arr.shape[-1]
            in_specs.append(pl.BlockSpec((1, TB, w), kidx_flat,
                                         memory_space=pltpu.VMEM))
            tensor_inputs.append(arr.reshape(arr.shape[0], arr.shape[1],
                                             Hk * w))
        else:
            in_specs.append(tb_spec(arr.shape[-1]))
            tensor_inputs.append(arr)
    in_specs += [
        pl.BlockSpec((1, QT * G, 1),
                     lambda b, hg, qt_, p, *s: (b, qt_, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Hb, QT * G, 1),
                     lambda b, hg, qt_, p, *s: (hg, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    tensor_inputs += [qpos_rows, sink_rows]
    # scale-expand matmuls; the midpoint grid's 2/N factor folds in for free
    def _add_const(arr):
        in_specs.append(pl.BlockSpec(
            arr.shape, lambda b, hg, qt_, p, *s: tuple(0 for _ in arr.shape),
            memory_space=pltpu.VMEM))
        tensor_inputs.append(jnp.asarray(arr))

    if k_bits:
        dk = D_in - d_extra if mla else D
        _add_const(_scale_expand_mat(dk, k_bits))
        _add_const(_field_shifts(dk, k_bits))
    if v_bits and not v_from_k:
        _add_const(_scale_expand_mat(Dv, v_bits))
        _add_const(_field_shifts(Dv, v_bits))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=(3 + int(has_pidx)) if paged else 2,
        grid=(B, Hg, Qb, MPk),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(
            (1, Hb, QT, G, Dv),
            lambda b, hg, qt_, p, *s: (b, hg, qt_, 0, 0),
            memory_space=pltpu.VMEM) if not return_stats else tuple(
                [pl.BlockSpec((1, Hb, QT, G, Dv),
                              lambda b, hg, qt_, p, *s: (b, hg, qt_, 0, 0),
                              memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((1, Hb, QT, G),
                                lambda b, hg, qt_, p, *s: (b, hg, qt_, 0),
                                memory_space=pltpu.VMEM)] * 2)),
        scratch_shapes=[
            pltpu.VMEM((Hb * QT * G, 1), jnp.float32),
            pltpu.VMEM((Hb * QT * G, 1), jnp.float32),
            pltpu.VMEM((Hb * QT * G, Dv), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _flash_kernel,
        layout="paged" if paged else "linear",
        Hb=Hb, QT=QT, G=G, D=D_in, Dv=Dv, TB=TB, flat_heads=flat_heads,
        k_bits=k_bits, v_bits=v_bits, compand_a=compand_a,
        d_extra=d_extra, v_from_k=v_from_k,
        scale=scale, sliding_window=sliding_window,
        logit_softcap=logit_softcap, has_sinks=has_sinks,
        return_stats=return_stats, has_page_idx=has_pidx,
    )
    scalars = ((block_tables.astype(jnp.int32),) if paged else ())
    if has_pidx:
        scalars += (page_indices.astype(jnp.int32),)
    scalars += (pf_arr, pl_arr)
    out_shape = tuple(
        [jax.ShapeDtypeStruct((B, Hk, S_pad, G, Dv),
                              jnp.float32 if return_stats else out_dtype)]
        + ([jax.ShapeDtypeStruct((B, Hk, S_pad, G), jnp.float32)] * 2
           if return_stats else []))
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape if return_stats else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            # quantized-cache tall-prefill blocks need ~39 MB of scoped VMEM
            # (out + double-buffered packed pages + scratch) — the 16 MB
            # default rejected ctx>=2k prefills; v5e carries 128 MB
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*scalars, *tensor_inputs)

    def _fin(out):
        out = out.transpose(0, 2, 1, 3, 4).reshape(B, S_pad, Hq, Dv)[:, :S]
        if mo is not None:
            out = out @ jnp.asarray(mo)
        return out

    if not return_stats:
        return _fin(res)
    acc, m, l = res
    m = m.transpose(0, 2, 1, 3).reshape(B, S_pad, Hq)[:, :S]
    l = l.transpose(0, 2, 1, 3).reshape(B, S_pad, Hq)[:, :S]
    return _fin(acc), m, l


def flash_supported(k_bits: int, v_bits: int) -> bool:
    """In-kernel dequant requires word-aligned bit-widths."""
    return k_bits in FAST_BITS and v_bits in FAST_BITS


def ring_kernel_fits(W: int, Hk: int, D: int, itemsize: int = 2,
                     budget: int = 6 * 1024 * 1024) -> bool:
    """The ring-decode kernel holds the whole ring (K+V) in VMEM per step;
    windows past the budget fall back to the dense path."""
    return 2 * W * Hk * D * itemsize <= budget


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logit_softcap",
                     "return_stats", "interpret", "out_dtype"),
)
def flash_ring_attention(
    q,           # (B, 1, Hq, D) decode-step queries
    ring_k,      # (N, W, Hk, D) ring slots (slot = pos % W)
    ring_v,      # (N, W, Hk, D)
    ring_pos,    # (N, W) int32 absolute position per slot (-1 = unwritten)
    slots,       # (B,) int32 state-slot row per batch entry
    q_positions,  # (B, 1) int32
    sinks=None,
    scale: float = 1.0,
    sliding_window: int = 0,
    logit_softcap: float = 0.0,
    return_stats: bool = False,
    interpret: bool = False,
    out_dtype=jnp.float32,
):
    """SWA-ring decode (S=1): reads each sequence's ring DIRECTLY from the
    state arrays via scalar-prefetched slot rows — no (B, W, Hk, D) gather
    copy — masking by the per-slot absolute positions (stale speculative
    slots carry future positions and self-mask). The whole ring loads as one
    VMEM block (gate with ring_kernel_fits).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, Hq, D = q.shape
    assert S == 1
    N, W, Hk, _ = ring_k.shape
    G = Hq // Hk
    TB = W  # whole ring in one block; see ring_kernel_fits
    Wb = 1

    qk = q.reshape(B, 1, Hk, G, D).transpose(0, 2, 1, 3, 4)  # (B,Hk,1,G,D)
    pos3 = ring_pos.reshape(N, 1, W).astype(jnp.int32)
    qpos_rows = jnp.repeat(q_positions.astype(jnp.int32), G, axis=1)[..., None]
    has_sinks = sinks is not None
    sink_rows = (sinks.astype(jnp.float32).reshape(Hk, G, 1) if has_sinks
                 else jnp.zeros((Hk, G, 1), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, 1, 1, Wb),
        in_specs=[
            pl.BlockSpec((1, Hk, 1, G, D),
                         lambda b, hg, qt_, p, *s: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, Hk, D),
                         lambda b, hg, qt_, p, rows, pf, pl_: (rows[b], p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, Hk, D),
                         lambda b, hg, qt_, p, rows, pf, pl_: (rows[b], p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W),
                         lambda b, hg, qt_, p, rows, pf, pl_: (rows[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 1),
                         lambda b, hg, qt_, p, *s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hk, G, 1), lambda b, hg, qt_, p, *s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec(
            (1, Hk, 1, G, D), lambda b, hg, qt_, p, *s: (b, 0, 0, 0, 0),
            memory_space=pltpu.VMEM) if not return_stats else tuple(
                [pl.BlockSpec((1, Hk, 1, G, D),
                              lambda b, hg, qt_, p, *s: (b, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((1, Hk, 1, G),
                                lambda b, hg, qt_, p, *s: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)] * 2)),
        scratch_shapes=[
            pltpu.VMEM((Hk * G, 1), jnp.float32),
            pltpu.VMEM((Hk * G, 1), jnp.float32),
            pltpu.VMEM((Hk * G, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _flash_kernel,
        layout="ring", Hb=Hk, QT=1, G=G, D=D, Dv=D, TB=TB,
        flat_heads=False, k_bits=0, v_bits=0, compand_a=0.0,
        d_extra=0, v_from_k=False, scale=scale,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
        has_sinks=has_sinks, return_stats=return_stats,
    )
    pf = jnp.zeros((B, 1), jnp.int32)
    pl_arr = jnp.full((B, 1), Wb - 1, jnp.int32)
    out_shape = tuple(
        [jax.ShapeDtypeStruct((B, Hk, 1, G, D),
                              jnp.float32 if return_stats else out_dtype)]
        + ([jax.ShapeDtypeStruct((B, Hk, 1, G), jnp.float32)] * 2
           if return_stats else []))
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape if return_stats else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(slots.astype(jnp.int32), pf, pl_arr, qk, ring_k, ring_v, pos3,
      qpos_rows, sink_rows)
    if not return_stats:
        return res.transpose(0, 2, 1, 3, 4).reshape(B, 1, Hq, D)
    acc, m, l = res
    return (acc.transpose(0, 2, 1, 3, 4).reshape(B, 1, Hq, D),
            m.transpose(0, 2, 1, 3).reshape(B, 1, Hq),
            l.transpose(0, 2, 1, 3).reshape(B, 1, Hq))
