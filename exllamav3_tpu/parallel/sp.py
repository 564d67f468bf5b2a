"""Serving-integrated sequence parallelism: page-sharded KV + distributed
flash decode.

The reference has NO sequence/context parallelism (SURVEY §2.3) — its long
contexts live in one GPU's paged cache. Here the Generator's paged cache
shards its PAGE dimension across the mesh's `sp` axis (HBM capacity scales
linearly in chips), and paged attention runs as a shard_map island inside
the jitted step: every device attends the (replicated) queries against only
its RESIDENT pages, then the per-device online-softmax stats merge with one
pmax + two psums over ICI. No K/V bytes ever cross the interconnect — the
communication per step is O(B*S*Hq*D) output-sized, independent of context
length. (parallel/ring_attention.py remains the rotate-the-KV alternative
for contiguous sequence shards; for paged serving the stat-merge form wins:
pages live where the pagetable put them and only statistics move.)

Page placement: global page id p lives on device p // (P/n) as local page
p % (P/n). The pagetable allocates global ids; each shard derives its local
block table by masking non-resident entries.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import PAGE_SIZE

NEG_INF = -1e30


def _sp_body(q, positions, total_lens, bt, *kv_arrays, axis, scale,
             sliding_window, logit_softcap, sinks, n_local, k_bits, v_bits,
             compand_a):
    """Per-shard body under shard_map. kv_arrays are the LOCAL page shards —
    (k, v) dense or (k_q, k_s, v_q, v_s) packed; bt carries GLOBAL page
    ids. Quantized shards dequantize only their RESIDENT gathered pages."""
    d = jax.lax.axis_index(axis)
    B, S, Hq, D = q.shape

    # local block table: resident entries -> local page id, others -> 0 with
    # a validity mask (position masking handles the rest)
    owner = bt // n_local
    local = jnp.where(owner == d, bt % n_local, 0)
    resident = owner == d                                   # (B, MP)

    if k_bits:
        from ..ops.kv_quant import dequantize_kv

        kq, ks, vq, vs = kv_arrays
        k = dequantize_kv(kq[local], ks[local], k_bits, compand_a=compand_a)
        v = dequantize_kv(vq[local], vs[local], v_bits, compand_a=compand_a)
    else:
        k_pages, v_pages = kv_arrays
        k = k_pages[local]                                  # (B, MP, PS, Hk, D)
        v = v_pages[local]
    MP = bt.shape[1]
    T = MP * PAGE_SIZE
    k = k.reshape(B, T, *k.shape[3:])
    v = v.reshape(B, T, *v.shape[3:])
    kp_abs = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    k_ok = jnp.repeat(resident, PAGE_SIZE, axis=1)
    k_ok &= kp_abs < total_lens[:, None]
    Hk = k.shape[2]
    G = Hq // Hk
    qg = q.reshape(B, S, Hk, G, D).astype(jnp.float32)
    s = jnp.einsum("bskgd,btkd->bkgst", qg, k.astype(jnp.float32)) * scale
    if logit_softcap:
        s = jnp.tanh(s / logit_softcap) * logit_softcap
    mask = k_ok[:, None, None, None, :] & (
        kp_abs[:, None, None, None, :] <= positions[:, None, None, :, None])
    if sliding_window:
        mask &= kp_abs[:, None, None, None, :] > (
            positions[:, None, None, :, None] - sliding_window)
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1)
    p = jnp.where(mask, jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bkgst,btkd->bkgsd", p, v.astype(jnp.float32))

    # cross-device online-softmax merge: one pmax + two psums of
    # output-sized tensors — no K/V ever crosses ICI
    mg = jax.lax.pmax(m, axis)
    c = jnp.where(m <= NEG_INF / 2, 0.0, jnp.exp(m - mg))
    lg = jax.lax.psum(l * c, axis)
    accg = jax.lax.psum(acc * c[..., None], axis)
    if sinks is not None:
        sk = sinks.reshape(1, Hk, G, 1).astype(jnp.float32)
        lg = lg * jnp.exp(mg - jnp.maximum(mg, sk)) \
            + jnp.exp(sk - jnp.maximum(mg, sk))
        accg = accg * jnp.exp(mg - jnp.maximum(mg, sk))[..., None]
    out = accg / jnp.maximum(lg, 1e-20)[..., None]          # (B,Hk,G,S,D)
    return jnp.moveaxis(out, 3, 1).reshape(B, S, Hq, -1)


def sp_paged_attend(q, layer_state, block_tables, positions, total_lens,
                    mesh, axis: str = "sp", scale: float = 1.0,
                    sliding_window: int = 0, logit_softcap: float = 0.0,
                    sinks=None, k_bits: int = 0, v_bits: int = 0,
                    compand_a: float = 0.0):
    """Sequence-parallel paged attention over `mesh`'s `axis`. Cache pages
    (dim 0) — dense or 2-8-bit packed — are sharded over the axis;
    q/positions/tables are replicated. Returns (B, S, Hq, Dv) replicated."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    if k_bits:
        kv_arrays = (layer_state["k_q"], layer_state["k_s"],
                     layer_state["v_q"], layer_state["v_s"])
    else:
        kv_arrays = (layer_state["k"], layer_state["v"])
    n = mesh.shape[axis]
    P_total = kv_arrays[0].shape[0]
    assert P_total % n == 0
    body = partial(_sp_body, axis=axis, scale=scale,
                   sliding_window=sliding_window,
                   logit_softcap=logit_softcap, sinks=sinks,
                   n_local=P_total // n, k_bits=k_bits, v_bits=v_bits,
                   compand_a=compand_a)
    rep = P()
    page_spec = P(axis, None, None, None)
    kw = dict(mesh=mesh,
              in_specs=(rep, rep, rep, rep)
              + (page_spec,) * len(kv_arrays),
              out_specs=rep)
    try:  # jax>=0.8 renamed check_rep -> check_vma
        f = shard_map(body, check_vma=False, **kw)
    except TypeError:  # pragma: no cover
        f = shard_map(body, check_rep=False, **kw)
    return f(q, positions, total_lens, block_tables, *kv_arrays)


def shard_cache_state(state: dict, mesh, axis: str = "sp") -> dict:
    """Place every paged array's page dim on the sp axis (pg_* pools too);
    non-paged (slot-keyed) arrays replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]
    out = {}
    for key, layer in state.items():
        new_layer = {}
        for name, arr in layer.items():
            if arr.ndim >= 2 and arr.shape[0] % n == 0 and name in (
                    "k", "v", "k_q", "k_s", "v_q", "v_s", "kv", "kv_q",
                    "kv_s", "k_pe", "mkv", "pg_pool", "pg_ipool"):
                spec = P(axis, *([None] * (arr.ndim - 1)))
            else:
                spec = P()
            new_layer[name] = jax.device_put(arr, NamedSharding(mesh, spec))
        out[key] = new_layer
    return out
