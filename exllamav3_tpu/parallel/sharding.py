"""Tensor/expert parallelism via GSPMD: mesh + named shardings on the param
pytree. XLA inserts the collectives (all-gather / reduce-scatter / psum) over
ICI — this subsystem replaces the reference's entire multiprocess TP stack
(model_tp*.py, SHM/NCCL backends, exllamav3_ext/parallel/*; see SURVEY §2.3).

Plan rules mirror the reference's split semantics (modules/linear.py:639-657,
attn.py:915): column-parallel for q/k/v/up/gate (shard out_features), row-
parallel for o/down (shard in_features, psum after), vocab-parallel lm_head.
EXL3 trellis tensors shard on their tile dims (16-channel granularity is
automatic: tiles are 16 wide).
"""
from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp: int = 1, tp: int | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# Column-parallel linears: shard out_features. Row-parallel: shard in_features.
_COL_PAT = re.compile(
    r"\.(q_proj|k_proj|v_proj|up_proj|gate_proj|qkv_proj|gate_up_proj|q_b_proj"
    r"|in_proj_qkvz|in_proj_qkv|in_proj_z|in_proj|wq_b)$")
_ROW_PAT = re.compile(r"\.(o_proj|down_proj|out_proj)$")
_HEAD_PAT = re.compile(r"(^|\.)lm_head$")
_EMBED_PAT = re.compile(r"embed_tokens$")
# MoE modules hold stacked expert tensors (E, in, out): shard the expert dim
# = expert parallelism (reference channel_unit="experts",
# block_sparse_mlp.py:1574-1586). Matched on the MODULE key (".mlp" etc.)
# by the presence of w_<name> entries, handled in param_spec.
_MLA_ABSORB = {"w_uk", "w_uv"}  # (kv_lora, H, dn|dv): shard the head dim


def _linear_spec(kind: str, name: str):
    """kind: col | row. name: tensor name within the linear param group."""
    col = kind == "col"
    if name == "weight":  # (in, out)
        return P(None, "tp") if col else P("tp", None)
    if name == "weight_q":
        return P(None, "tp") if col else P("tp", None)
    if name == "scale":  # (out,)
        return P("tp") if col else P(None)
    if name == "trellis":  # (in/16, out/16, 16K)
        return P(None, "tp", None) if col else P("tp", None, None)
    if name == "suh":  # (in,)
        return P(None) if col else P("tp")
    if name == "svh":  # (out,)
        return P("tp") if col else P(None)
    if name == "bias":  # (out,)
        return P("tp") if col else P(None)
    return P()


def param_spec(module_key: str, name: str):
    if name in _MLA_ABSORB:
        return P(None, "tp", None)
    # fused projections (multilinear.py): (in, sum_out) column-style
    if name in ("qkv_w", "gate_up_w", "qkv_q", "gate_up_q",
                "qkv_q4", "gate_up_q4", "qkv_s4", "gate_up_s4"):
        return P(None, "tp")
    if name in ("qkv_scale", "gate_up_scale"):
        return P("tp")
    if name.startswith("w_"):  # stacked experts (E, in, out): EP on E
        return P("tp", None, None)
    if name.startswith("b_"):  # stacked expert biases (E, out)
        return P("tp", None)
    if _COL_PAT.search(module_key) or _HEAD_PAT.search(module_key):
        return _linear_spec("col", name)
    if _ROW_PAT.search(module_key):
        return _linear_spec("row", name)
    if _EMBED_PAT.search(module_key) and name == "weight":
        return P(None, None)  # replicate embeddings (cheap, gather-heavy)
    return P()  # norms, sinks, conv states, dt/a_log vectors: replicated


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place every param per the plan. Dims not divisible by the axis size
    fall back to replication for that tensor."""
    out = {}
    for mkey, group in params.items():
        g = {}
        for name, arr in group.items():
            spec = param_spec(mkey, name)
            spec = _fit_spec(spec, arr.shape, mesh)
            g[name] = jax.device_put(arr, NamedSharding(mesh, spec))
        out[mkey] = g
    return out


def _fit_spec(spec: P, shape: tuple, mesh: Mesh) -> P:
    fixed = []
    for i, ax in enumerate(spec):
        if ax is None or i >= len(shape):
            fixed.append(None)
            continue
        size = mesh.shape[ax] if isinstance(ax, str) else 1
        fixed.append(ax if shape[i] % size == 0 else None)
    return P(*fixed)


def data_sharding(mesh: Mesh):
    """Activations/ids: batch over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def shard_cache_state(state: dict, mesh: Mesh) -> dict:
    """KV cache: shard kv-head dim over tp, batch/pages over dp when possible."""
    out = {}
    for key, layer in state.items():
        g = {}
        for name, arr in layer.items():
            if name == "S":  # recurrent state (slots, Hv, dk, dv): heads on tp
                spec = P(None, "tp", None, None)
            elif name == "conv":  # (slots, C, ks-1): replicate (tiny)
                spec = P()
            elif arr.ndim == 4:  # (B|P, T, Hk, D): kv heads on tp
                spec = P(None, None, "tp", None)
            elif arr.ndim == 3 and name in ("k_q", "k_s", "v_q", "v_s"):
                # merged-head quantized storage (B|P, T, Hk*gw): lanes are
                # head-major, so contiguous tp chunks land on head
                # boundaries — the same head sharding as the 4-D layout
                spec = P(None, None, "tp")
            else:
                spec = P()
            spec = _fit_spec(spec, arr.shape, mesh)
            g[name] = jax.device_put(arr, NamedSharding(mesh, spec))
        out[key] = g
    return out
