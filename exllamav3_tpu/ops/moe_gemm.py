"""Selected-expert MoE MLP for decode shapes.

Feature reference: /root/reference/exllamav3/exllamav3_ext/quant/exl3_moe.cu
(:1-301) — the reference computes gate/up -> act -> down for ONLY the routed
experts in one launch, so batch-1 decode reads k experts' weights, not all E.
The dense-all einsum path (modules/block_sparse_mlp.py) reads every expert's
bytes — at top-8-of-128 that is 16x the HBM traffic and therefore ~1/16 of
the achievable decode speed.

TPU design: one Pallas kernel, grid (T, i_blocks, k), fully sequential
("arbitrary"), with the routed expert ids riding SCALAR PREFETCH — the block
index maps pick each grid step's weight tiles as wg/wu[topi[t, j], :, ib]
and wd[topi[t, j], ib, :], so the pipeline DMAs exactly the selected
experts' bytes (the same trick the paged flash-attention kernel plays with
block tables). Each step computes one (1, h) @ (h, bi) gate/up pair, the
activation, and the (1, bi) @ (bi, h) down partial, accumulating
topv[t, j] * y into the (T, h) f32 output block held in VMEM across the
whole grid.

The entry (j) dimension is INNERMOST so that consecutive entries with the
SAME expert id alias the same weight blocks — the Pallas pipeline skips the
DMA when a block index repeats between adjacent grid steps. Expert-parallel
callers exploit this: a shard's non-routed capacity slots carry weight 0 and
duplicate the last routed expert's id, so each device's HBM traffic is its
actually-routed experts' bytes, not the capacity bound
(modules/block_sparse_mlp.py _ep_selected_experts; reference EP semantics:
block_sparse_mlp.py:1556-1590 + exl3_moe.cu).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _act(name: str, g, u, act_limit: float, act_clamp: float):
    from ..modules.mlp import ACT2FN, act_fn_silu_oai, act_mul_clamped

    if name == "silu_oai":
        return act_fn_silu_oai(g, u, limit=act_limit)
    if act_clamp:
        return act_mul_clamped(ACT2FN[name], g, u, act_clamp)
    return ACT2FN[name](g) * u


def _moe_kernel(topi_ref, x_ref, topv_ref, *refs, T, k, bi, gated,
                activation, act_limit, act_clamp, has_gu_bias, has_d_bias):
    import jax.experimental.pallas as pl

    i = 0
    if gated:
        wg_ref = refs[i]; i += 1         # (1, h, bi) expert gate tile
    wu_ref = refs[i]; i += 1             # (1, h, bi)
    wd_ref = refs[i]; i += 1             # (1, bi, h)
    if has_gu_bias:
        if gated:
            bg_ref = refs[i]; i += 1     # (1, bi)
        bu_ref = refs[i]; i += 1
    if has_d_bias:
        bd_ref = refs[i]; i += 1         # (1, h)
    out_ref = refs[i]

    ib = pl.program_id(1)
    j = pl.program_id(2)

    # x/out/topv blocks are PER-T via their index maps (grid order keeps the
    # out block VMEM-resident across the whole (j, ib) loop for each t) —
    # in-kernel dynamic sublane indexing does not legalize on Mosaic
    @pl.when((j == 0) & (ib == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x_row = x_ref[0].astype(jnp.bfloat16)                     # (1, h)
    u = jnp.dot(x_row, wu_ref[0], preferred_element_type=jnp.float32)
    if has_gu_bias:
        u = u + bu_ref[0]
    if gated:
        g = jnp.dot(x_row, wg_ref[0], preferred_element_type=jnp.float32)
        if has_gu_bias:
            g = g + bg_ref[0]
        a = _act(activation, g, u, act_limit, act_clamp)
    else:
        from ..modules.mlp import ACT2FN

        a = ACT2FN[activation](u)
    y = jnp.dot(a.astype(jnp.bfloat16), wd_ref[0],
                preferred_element_type=jnp.float32)           # (1, h)
    wv = topv_ref[0]                                          # (1, 1) f32
    if has_d_bias:
        # the per-expert down bias joins once per (t, j), on the first
        # i-block (it does not depend on the intermediate slice)
        @pl.when(ib == 0)
        def _():
            out_ref[:] += (wv * bd_ref[0])[None]

    out_ref[:] += (wv * y)[None]


def _pick_bi(h: int, i: int) -> int:
    """Intermediate tile: 3 (h x bi) bf16 tiles double-buffered must sit
    well under VMEM; prefer larger tiles for fewer grid steps."""
    budget = 8 * 1024 * 1024
    bi = budget // (3 * 2 * 2 * h)
    bi = max(128, (bi // 128) * 128)
    bi = min(bi, (i // 128) * 128)
    if bi < 128:
        return 0
    while i % bi:
        bi -= 128
        if bi < 128:
            return 0
    return bi


def selected_expert_mlp(x, topi, topv, wu, wd, wg=None, bg=None, bu=None,
                        bd=None, activation: str = "silu",
                        act_limit: float = 7.0, act_clamp: float = 0.0,
                        interpret: bool = False):
    """x (T, h); topi/topv (T, k); wu/wg (E, h, i) bf16; wd (E, i, h) bf16;
    optional bg/bu (E, i), bd (E, h). Returns (T, h) f32 = sum over the k
    SELECTED experts of topv * expert_mlp(x) — reads only those experts'
    weight bytes."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, h = x.shape
    k = topi.shape[1]
    E, _, i_dim = wu.shape
    gated = wg is not None
    bi = _pick_bi(h, i_dim)
    assert bi, (h, i_dim)
    nib = i_dim // bi

    has_gu_bias = bu is not None
    has_d_bias = bd is not None

    def wtile(t, ib, j, topi_s):
        return (topi_s[t, j], 0, ib)

    def dtile(t, ib, j, topi_s):
        return (topi_s[t, j], ib, 0)

    def btile(t, ib, j, topi_s):
        return (topi_s[t, j], 0, ib)

    def dbias(t, ib, j, topi_s):
        return (topi_s[t, j], 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, h), lambda t, ib, j, s: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda t, ib, j, s, _k=k: (t * _k + j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [x.astype(jnp.bfloat16)[:, None, :],
              topv.astype(jnp.float32).reshape(-1, 1, 1)]
    if gated:
        in_specs.append(pl.BlockSpec((1, h, bi), wtile,
                                     memory_space=pltpu.VMEM))
        inputs.append(wg)
    in_specs.append(pl.BlockSpec((1, h, bi), wtile, memory_space=pltpu.VMEM))
    inputs.append(wu)
    in_specs.append(pl.BlockSpec((1, bi, h), dtile, memory_space=pltpu.VMEM))
    inputs.append(wd)
    if has_gu_bias:
        if gated:
            in_specs.append(pl.BlockSpec((1, 1, bi), btile,
                                         memory_space=pltpu.VMEM))
            inputs.append(bg.astype(jnp.float32)[:, None, :])
        in_specs.append(pl.BlockSpec((1, 1, bi), btile,
                                     memory_space=pltpu.VMEM))
        inputs.append(bu.astype(jnp.float32)[:, None, :])
    if has_d_bias:
        in_specs.append(pl.BlockSpec((1, 1, h), dbias,
                                     memory_space=pltpu.VMEM))
        inputs.append(bd.astype(jnp.float32)[:, None, :])

    kernel = functools.partial(
        _moe_kernel, T=T, k=k, bi=bi, gated=gated, activation=activation,
        act_limit=act_limit, act_clamp=act_clamp,
        has_gu_bias=has_gu_bias, has_d_bias=has_d_bias,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, nib, k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, h), lambda t, ib, j, s: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 1, h), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(topi.astype(jnp.int32), *inputs)
    return out[:, 0, :]
