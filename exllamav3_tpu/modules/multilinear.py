"""Projection fusion: run several same-input Linears as ONE matmul.

Feature reference: /root/reference/exllamav3/modules/multilinear.py
(MultiLinear:5 — pointer-table batching of same-shape Linears for one
exl3_mgemm launch: Q+gate, K+V, MoE experts). TPU version: at load time the
already-materialized dense/int8 weights of sibling projections concatenate
along the output dim, so the decode path launches one large matmul instead
of 2-3 small ones (fewer kernels, better MXU/DMA shapes). The fused entry
lives under the parent module's key; forward slices the result.
"""
from __future__ import annotations

import jax.numpy as jnp


def try_fuse(params: dict, parent_key: str, name: str, linears: list) -> bool:
    """Fuse `linears` (same in_features, loaded) into params[parent_key]
    [name_*]; pops the children's param entries. Returns False (leaving
    everything untouched) when the representations don't match or biases/
    LoRA are present."""
    groups = []
    for lin in linears:
        p = params.get(lin.key)
        if p is None or "bias" in p or "lora_a" in p:
            return False
        if "weight" in p and len(p) == 1:
            groups.append(("weight", p))
        elif "weight_q" in p and "scale" in p and len(p) == 2:
            groups.append(("int8", p))
        elif "weight_q4" in p and "scale4" in p and len(p) == 2:
            groups.append(("int4", p))
        elif "weight_qb" in p and "scale_qb" in p and len(p) == 2:
            groups.append(("intb", p))
        elif "weight_sq" in p and "scale_sq" in p and len(p) == 2:
            groups.append(("sq", p))
        else:
            return False
    kinds = {k for k, _ in groups}
    if len(kinds) != 1:
        return False
    kind = kinds.pop()
    parent = params.setdefault(parent_key, {})
    if kind == "weight":
        parent[name + "_w"] = jnp.concatenate(
            [p["weight"] for _, p in groups], axis=1)
    elif kind == "int4":
        # weight_q4 (k/2, n) and scale4 (k/group, n) both concatenate
        # along the output dim — the packed-pair/group structure lives on k
        parent[name + "_q4"] = jnp.concatenate(
            [p["weight_q4"] for _, p in groups], axis=1)
        parent[name + "_s4"] = jnp.concatenate(
            [p["scale4"] for _, p in groups], axis=1)
    elif kind == "intb":
        if len({p["weight_qb"].shape[0] for _, p in groups}) != 1:
            return False  # mixed k paddings can't share one packed array
        parent[name + "_qb"] = jnp.concatenate(
            [p["weight_qb"] for _, p in groups], axis=1)
        parent[name + "_sb"] = jnp.concatenate(
            [p["scale_qb"] for _, p in groups], axis=1)
    elif kind == "sq":
        # serving tensors share ONE activation-side Hadamard (no per-linear
        # sign vectors by design — quant/quantize.py finalize_hessian_rot),
        # so sibling projections concatenate like any other representation
        if len({p["weight_sq"].shape[0] for _, p in groups}) != 1:
            return False
        parent[name + "_sq"] = jnp.concatenate(
            [p["weight_sq"] for _, p in groups], axis=1)
        parent[name + "_sqs"] = jnp.concatenate(
            [p["scale_sq"] for _, p in groups], axis=1)
    else:
        parent[name + "_q"] = jnp.concatenate(
            [p["weight_q"] for _, p in groups], axis=1)
        parent[name + "_scale"] = jnp.concatenate(
            [p["scale"] for _, p in groups], axis=0)
    for lin in linears:
        params.pop(lin.key, None)
    return True


def unfuse(params: dict, parent_key: str, name: str, linears: list,
           out_features: list) -> None:
    """Inverse of try_fuse: split the concatenated weights back into the
    children's param entries (LoRA attach, TP re-planning)."""
    parent = params.get(parent_key, {})
    offs = [0]
    for n in out_features:
        offs.append(offs[-1] + n)
    if name + "_w" in parent:
        w = parent.pop(name + "_w")
        for lin, a, b in zip(linears, offs, offs[1:]):
            params[lin.key] = {"weight": w[:, a:b]}
    elif name + "_q4" in parent:
        q = parent.pop(name + "_q4")
        s = parent.pop(name + "_s4")
        for lin, a, b in zip(linears, offs, offs[1:]):
            params[lin.key] = {"weight_q4": q[:, a:b], "scale4": s[:, a:b]}
    elif name + "_qb" in parent:
        q = parent.pop(name + "_qb")
        s = parent.pop(name + "_sb")
        for lin, a, b in zip(linears, offs, offs[1:]):
            params[lin.key] = {"weight_qb": q[:, a:b], "scale_qb": s[:, a:b]}
    elif name + "_sq" in parent:
        q = parent.pop(name + "_sq")
        s = parent.pop(name + "_sqs")
        for lin, a, b in zip(linears, offs, offs[1:]):
            params[lin.key] = {"weight_sq": q[:, a:b], "scale_sq": s[:, a:b]}
    elif name + "_q" in parent:
        q = parent.pop(name + "_q")
        s = parent.pop(name + "_scale")
        for lin, a, b in zip(linears, offs, offs[1:]):
            params[lin.key] = {"weight_q": q[:, a:b], "scale": s[a:b]}


def fused_forward(params: dict, parent_key: str, name: str, x,
                  out_dtype=jnp.float32):
    """One matmul over the fused weights; returns the full (..., sum_n)."""
    p = params[parent_key]
    if name + "_w" in p:
        y = jnp.dot(x.astype(jnp.bfloat16), p[name + "_w"],
                    preferred_element_type=jnp.float32)
    elif name + "_q4" in p:
        from ..ops.q_matmul import int4_matmul

        y = int4_matmul(x, p[name + "_q4"], p[name + "_s4"])
    elif name + "_qb" in p:
        from ..ops.q_matmul import intb_matmul

        y = intb_matmul(x, p[name + "_qb"], p[name + "_sb"])
    elif name + "_sq" in p:
        from ..ops.q_matmul import intb_matmul
        from ..quant.hadamard import had_right_jnp

        y = intb_matmul(had_right_jnp(x), p[name + "_sq"], p[name + "_sqs"])
    else:
        from ..ops.q_matmul import int8_matmul

        y = int8_matmul(x, p[name + "_q"], p[name + "_scale"])
    return y.astype(out_dtype)
