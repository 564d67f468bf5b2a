"""Fused gate_up -> act -> down decode MLP: ONE Pallas launch per layer.

Feature reference: /root/reference/exllamav3/exllamav3_ext/quant/exl3_gemm.cu
(the reference fuses dequant+GEMV per projection; its MLP still takes three
kernel launches). Motivation here is the m=1 decode launch overhead measured
in doc/performance.md (~12 us fixed cost per matmul dispatch at 8B geometry,
the gap between 87% and roofline): merging gate, up, act and down into a
single kernel removes two of the four per-layer matmul launches.

Design: 1-D grid over intermediate-dim tiles. Step k streams the gate and
up column blocks (h, bi) and the down row block (bi, h) — all three weight
tiles of the same intermediate slice — computes

    a_k = act(x @ Wg_k * sg_k) * (x @ Wu_k * su_k)
    acc += a_k @ Wd_k

with acc (m, h) resident in VMEM scratch, so HBM traffic is exactly the
packed weight bytes (x and acc are KB-scale at decode shapes). The int8
-> bf16 tile conversion feeds the MXU dot directly; per-column scales are
applied to the (m, bi) dot results (m*bi VPU ops, not h*bi). The down
per-column scale is applied by the caller on the final (m, h) output.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _act(name: str, g, clamp: float):
    if clamp:
        lim = jnp.float32(clamp)
        g = jnp.clip(g, -lim, lim)
    if name == "silu":
        return g * jax.nn.sigmoid(g)
    if name == "gelu":
        return jax.nn.gelu(g, approximate=False)
    if name == "gelu_pytorch_tanh":
        return jax.nn.gelu(g, approximate=True)
    if name == "relu2":
        return jnp.square(jax.nn.relu(g))
    raise ValueError(name)


def _fused_mlp_kernel(x_ref, g_ref, u_ref, sg_ref, su_ref, d_ref,
                      out_ref, acc_ref, *, activation: str, act_clamp: float):
    import jax.experimental.pallas as pl

    kk = pl.program_id(0)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    g = jnp.dot(x, g_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    u = jnp.dot(x, u_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    g = g * sg_ref[:]
    u = u * su_ref[:]
    a = (_act(activation, g, act_clamp) * u).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(a, d_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _pick_block_i(h: int, inter: int, budget: int = 12 << 20) -> int:
    for bi in (512, 256, 128):
        if inter % bi:
            continue
        # double-buffered weight tiles (gate + up + down) + x/acc/out
        if 2 * 3 * h * bi + 16 * h * (2 + 4 + 4) <= budget:
            return bi
    return 0


@functools.partial(jax.jit, static_argnames=("activation", "act_clamp",
                                             "interpret"))
def fused_mlp_int8_pallas(x, gu_q, gu_scale, d_q, activation: str = "silu",
                          act_clamp: float = 0.0, interpret: bool = False):
    """x (m<=16, h) bf16; gu_q (h, 2i) int8 [gate | up]; gu_scale (2i,) f32;
    d_q (i, h) int8 -> (m, h) f32 BEFORE the down per-column scale
    (caller applies y * d_scale and bias)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, h = x.shape
    inter = d_q.shape[0]
    bi = _pick_block_i(h, inter)
    assert bi, (h, inter)
    nk = inter // bi
    sg2 = gu_scale.reshape(1, 2 * inter).astype(jnp.float32)
    kern = functools.partial(_fused_mlp_kernel, activation=activation,
                             act_clamp=act_clamp)
    return pl.pallas_call(
        kern,
        grid=(nk,),
        in_specs=[
            pl.BlockSpec((m, h), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, bi), lambda k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, bi), lambda k, _n=nk: (0, k + _n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bi), lambda k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bi), lambda k, _n=nk: (0, k + _n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, h), lambda k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, h), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), gu_q, gu_q, sg2, sg2, d_q)


def fused_mlp_int8(x, gu_q, gu_scale, d_q, d_scale, d_bias=None,
                   activation: str = "silu", act_clamp: float = 0.0,
                   interpret: bool = False):
    """Dispatcher with shape plumbing: x (..., h) -> (..., h) f32."""
    shape = x.shape
    h = shape[-1]
    x2 = x.reshape(-1, h)
    m = x2.shape[0]
    m_pad = -m % 16
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    y = fused_mlp_int8_pallas(x2, gu_q, gu_scale, d_q, activation=activation,
                              act_clamp=act_clamp, interpret=interpret)
    if m_pad:
        y = y[:m]
    y = y * d_scale[None, :]
    if d_bias is not None:
        y = y + d_bias
    return y.reshape(shape[:-1] + (h,))


def fused_mlp_eligible(mlp, params: dict, T: int) -> bool:
    """The decode fast path: fused int8 gate_up entry + int8 down, a plain
    elementwise activation, and a launch-overhead-bound T."""
    if not getattr(mlp, "_fused_gu", False) or T > 16:
        return False
    if mlp.act_silu_oai or mlp.activation not in (
            "silu", "gelu", "gelu_pytorch_tanh", "relu2"):
        return False
    p = params.get(mlp.key, {})
    pd = params.get(mlp.down.key, {})
    if "gate_up_q" not in p or "weight_q" not in pd or "lora_a" in pd:
        return False
    h = mlp.down.out_features
    inter = mlp.down.in_features
    return _pick_block_i(h, inter) > 0
