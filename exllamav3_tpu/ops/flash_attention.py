"""Pallas paged flash-decode attention.

Feature reference: /root/reference/exllamav3/modules/attention_fn/
triton_paged.py (split-KV flash decode over block tables). TPU design: grid
(batch, page); the block table rides scalar prefetch so the Pallas pipeline
DMAs exactly the pages each sequence owns (each page fetched once, all KV
heads processed in-kernel); online-softmax accumulators live in VMEM scratch
across the page-sequential grid dimension. GQA groups feed the MXU as the M
dimension of the (G, D) x (D, PAGE_SIZE) score matmuls.

Decode-shaped (S=1). Prefill and the S>1 verification forwards use the jnp
reference (ops/attention.py); a prefill flash kernel is future work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import PAGE_SIZE

NEG_INF = -1e30


def _paged_decode_kernel(
    bt_ref,      # scalar prefetch: (B, MP) int32 block tables
    qpos_ref,    # scalar prefetch: (B,) int32 query positions
    q_ref,       # (1, Hk, G, D)
    k_ref,       # (1, PAGE_SIZE, Hk, D)
    v_ref,       # (1, PAGE_SIZE, Hk, D)
    sink_ref,    # (Hk, G) f32 (zeros when unused)
    o_ref,       # (1, Hk, G, D)
    m_ref, l_ref, acc_ref,  # scratch (Hk*G, 1), (Hk*G, 1), (Hk*G, D)
    *,
    scale: float,
    sliding_window: int,
    logit_softcap: float,
    has_sinks: bool,
    num_kv_heads: int,
):
    import jax.experimental.pallas as pl

    b = pl.program_id(0)
    p = pl.program_id(1)
    num_p = pl.num_programs(1)
    Hk = num_kv_heads
    G = q_ref.shape[2]

    @pl.when(p == 0)
    def _():
        if has_sinks:
            sink = sink_ref[:].astype(jnp.float32).reshape(Hk * G, 1)
            m_ref[:] = sink
            l_ref[:] = jnp.ones_like(l_ref)  # exp(sink - sink)
        else:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qpos = qpos_ref[b]
    page_start = p * PAGE_SIZE
    page_valid = page_start <= qpos

    @pl.when(page_valid)
    def _():
        for h in range(Hk):  # static unroll over KV heads
            q = q_ref[0, h].astype(jnp.float32)  # (G, D)
            k = k_ref[0, :, h].astype(jnp.float32)  # (PS, D)
            v = v_ref[0, :, h].astype(jnp.float32)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            if logit_softcap:
                s = jnp.tanh(s / logit_softcap) * logit_softcap
            kp = page_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            mask = kp <= qpos
            if sliding_window:
                mask &= kp > qpos - sliding_window
            s = jnp.where(mask, s, NEG_INF)

            rows = slice(h * G, (h + 1) * G)
            m_prev = m_ref[rows, :]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            ps = jnp.exp(s - m_new)
            l_ref[rows, :] = l_ref[rows, :] * alpha + jnp.sum(ps, axis=1,
                                                              keepdims=True)
            acc_ref[rows, :] = acc_ref[rows, :] * alpha + jnp.dot(
                ps, v, preferred_element_type=jnp.float32
            )
            m_ref[rows, :] = m_new

    @pl.when(p == num_p - 1)
    def _():
        o = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = o.reshape(Hk, G, o.shape[-1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logit_softcap", "interpret"),
)
def paged_decode_attention(
    q,            # (B, Hq, D)
    k_pages,      # (P, PAGE_SIZE, Hk, D)
    v_pages,
    block_tables,  # (B, MP) int32
    q_positions,   # (B,) int32
    sinks=None,    # (Hq,) f32 or None
    scale: float = 1.0,
    sliding_window: int = 0,
    logit_softcap: float = 0.0,
    interpret: bool = False,
):
    """Returns (B, Hq, D) f32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hq, D = q.shape
    P, PS, Hk, _ = k_pages.shape
    assert PS == PAGE_SIZE
    G = Hq // Hk
    MP = block_tables.shape[1]

    qg = q.reshape(B, Hk, G, D)  # heads grouped [h0g0..h0gG, h1g0..]
    # NOTE: HF head order is h-major over Hq = Hk*G? q heads are laid out so
    # that heads [h*G:(h+1)*G] share kv head h (standard GQA repeat order).
    has_sinks = sinks is not None
    sink_in = (sinks.reshape(Hk, G).astype(jnp.float32) if has_sinks
               else jnp.zeros((Hk, G), dtype=jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MP),
        in_specs=[
            pl.BlockSpec((1, Hk, G, D), lambda b, p, bt, qp: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PAGE_SIZE, Hk, D),
                         lambda b, p, bt, qp: (bt[b, p], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PAGE_SIZE, Hk, D),
                         lambda b, p, bt, qp: (bt[b, p], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hk, G), lambda b, p, bt, qp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hk, G, D), lambda b, p, bt, qp: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hk * G, 1), jnp.float32),
            pltpu.VMEM((Hk * G, 1), jnp.float32),
            pltpu.VMEM((Hk * G, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_decode_kernel, scale=scale, sliding_window=sliding_window,
        logit_softcap=logit_softcap, has_sinks=has_sinks, num_kv_heads=Hk,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, G, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_tables, q_positions, qg, k_pages, v_pages, sink_in)
    return out.reshape(B, Hq, D)
