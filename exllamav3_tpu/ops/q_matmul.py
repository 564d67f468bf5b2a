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
