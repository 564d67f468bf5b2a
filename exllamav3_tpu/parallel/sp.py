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
p % (P/n). The pagetable allocates global ids; each shard compacts its
resident entries into a hole-free local block table (ascending logical
order) and runs the SAME Pallas flash kernel as single-device serving with
`page_indices` carrying each entry's logical page (ops/flash_attention.py)
— per-step DMA and compute scale with RESIDENT pages, not context length.
A dense jnp body remains as the EXL3_TPU_ATTN=dense fallback.

Supported cache layouts: plain paged GQA K/V (dense or 2/4/8-bit packed)
and MLA latent pages (dense or quantized-latent [kv_q|kv_s|k_pe]) via
sp_latent_attend — the absorbed-decode kernel runs per shard with
return_stats and the same merge. DSV4 pools and recurrent-state layers
do not implement the sp attend path — Generator(sp_mesh=...) rejects
them up front (doc/parallelism.md lists the supported set).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import PAGE_SIZE

NEG_INF = -1e30

# layer-state entries whose leading dim is the page pool -> shardable over sp
SP_PAGED_NAMES = ("k", "v", "k_q", "k_s", "v_q", "v_s",
                  "kv", "kv_q", "kv_s", "k_pe")  # MLA latent pages
# paged layouts that exist in the cache but have no sp attend path yet
SP_UNSUPPORTED_NAMES = ("mkv", "pg_pool", "pg_ipool")


def _merge_stats(acc, m, l, axis, sinks):
    """Cross-device online-softmax merge: one pmax + two psums of
    output-sized tensors — no K/V ever crosses ICI. Shapes: acc (B,S,Hq,Dv)
    f32 UNNORMALIZED, m/l (B,S,Hq) f32. Sinks join the denominator after
    the merge (they are position-free)."""
    mg = jax.lax.pmax(m, axis)
    c = jnp.where(m <= NEG_INF / 2, 0.0, jnp.exp(m - mg))
    lg = jax.lax.psum(l * c, axis)
    accg = jax.lax.psum(acc * c[..., None], axis)
    if sinks is not None:
        sk = sinks.astype(jnp.float32).reshape(1, 1, -1)       # (1,1,Hq)
        mm = jnp.maximum(mg, sk)
        lg = lg * jnp.exp(mg - mm) + jnp.exp(sk - mm)
        accg = accg * jnp.exp(mg - mm)[..., None]
    return accg / jnp.maximum(lg, 1e-20)[..., None]


def _local_tables(bt, d, n_local):
    """Split the GLOBAL block table into this shard's compacted LOCAL table.

    Returns (bt_local, pidx): entry p of bt_local is a local page id and
    covers logical page pidx[b, p] of the sequence (ascending; -1 = unused
    tail). Non-resident pages simply do not appear — the flash kernel's
    per-q-block [first, last] bounds then count only resident pages."""
    B, MP = bt.shape
    owner = bt // n_local
    resident = owner == d                                      # (B, MP)
    local = jnp.where(resident, bt % n_local, 0)
    idx = jnp.broadcast_to(jnp.arange(MP, dtype=jnp.int32)[None], (B, MP))
    order = jnp.argsort(jnp.where(resident, idx, MP + idx), axis=1)
    res_sorted = jnp.take_along_axis(resident, order, axis=1)
    bt_local = jnp.where(res_sorted,
                         jnp.take_along_axis(local, order, axis=1), 0)
    pidx = jnp.where(res_sorted, order.astype(jnp.int32), -1)
    return bt_local.astype(jnp.int32), pidx


def _sp_body_flash(q, positions, total_lens, bt, *kv_arrays, axis, scale,
                   sliding_window, logit_softcap, sinks, n_local, k_bits,
                   v_bits, compand_a, interpret):
    """Per-shard body: the single-device Pallas flash kernel over the
    compacted local table, return_stats=True, then the stat merge."""
    from ..ops.flash_attention import flash_attention

    d = jax.lax.axis_index(axis)
    bt_local, pidx = _local_tables(bt, d, n_local)
    if k_bits:
        layer = {"k_q": kv_arrays[0], "k_s": kv_arrays[1],
                 "v_q": kv_arrays[2], "v_s": kv_arrays[3]}
    else:
        layer = {"k": kv_arrays[0], "v": kv_arrays[1]}
    acc, m, l = flash_attention(
        q, layer, positions, total_lens, block_tables=bt_local,
        page_indices=pidx, sinks=None, scale=scale,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
        k_bits=k_bits, v_bits=v_bits, compand_a=compand_a,
        return_stats=True, interpret=interpret,
    )
    return _merge_stats(acc, m, l, axis, sinks)


def _sp_body_dense(q, positions, total_lens, bt, *kv_arrays, axis, scale,
                   sliding_window, logit_softcap, sinks, n_local, k_bits,
                   v_bits, compand_a):
    """jnp reference body (EXL3_TPU_ATTN=dense): gathers every RESIDENT
    page dense and einsums full-length scores. Exact but does not scale to
    long contexts — the flash body is the serving path."""
    d = jax.lax.axis_index(axis)
    B, S, Hq, D = q.shape

    owner = bt // n_local
    local = jnp.where(owner == d, bt % n_local, 0)
    resident = owner == d                                   # (B, MP)

    if k_bits:
        from ..ops.kv_quant import dequantize_kv_stored

        kq, ks, vq, vs = kv_arrays
        merged = kq.ndim == 3
        hk = ks.shape[-1] // (D // 32) if merged else kq.shape[-2]
        k = dequantize_kv_stored(kq[local], ks[local], k_bits, hk, merged,
                                 compand_a=compand_a)
        v = dequantize_kv_stored(vq[local], vs[local], v_bits, hk, merged,
                                 compand_a=compand_a)
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
    m = jnp.max(s, axis=-1)                                 # (B,Hk,G,S)
    p = jnp.where(mask, jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bkgst,btkd->bkgsd", p, v.astype(jnp.float32))
    # reshape to the merge layout (B,S,Hq,·)
    Dv = acc.shape[-1]
    acc = jnp.moveaxis(acc, 3, 1).reshape(B, S, Hq, Dv)
    m = jnp.moveaxis(m, 3, 1).reshape(B, S, Hq)
    l = jnp.moveaxis(l, 3, 1).reshape(B, S, Hq)
    return _merge_stats(acc, m, l, axis, sinks)


def sp_paged_attend(q, layer_state, block_tables, positions, total_lens,
                    mesh, axis: str = "sp", scale: float = 1.0,
                    sliding_window: int = 0, logit_softcap: float = 0.0,
                    sinks=None, k_bits: int = 0, v_bits: int = 0,
                    compand_a: float = 0.0, backend: str | None = None):
    """Sequence-parallel paged attention over `mesh`'s `axis`. Cache pages
    (dim 0) — dense or 2-8-bit packed — are sharded over the axis;
    q/positions/tables are replicated. Returns (B, S, Hq, Dv) replicated.
    `backend` follows util.env.attn_backend: flash | interpret | dense."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    if backend is None:
        from ..util.env import attn_backend

        backend = attn_backend(k_bits, v_bits)
    if k_bits:
        kv_arrays = (layer_state["k_q"], layer_state["k_s"],
                     layer_state["v_q"], layer_state["v_s"])
    else:
        kv_arrays = (layer_state["k"], layer_state["v"])
    n = mesh.shape[axis]
    P_total = kv_arrays[0].shape[0]
    assert P_total % n == 0
    common = dict(axis=axis, scale=scale, sliding_window=sliding_window,
                  logit_softcap=logit_softcap, sinks=sinks,
                  n_local=P_total // n, k_bits=k_bits, v_bits=v_bits,
                  compand_a=compand_a)
    if backend == "dense":
        body = partial(_sp_body_dense, **common)
    else:
        body = partial(_sp_body_flash, interpret=(backend == "interpret"),
                       **common)
    rep = P()
    # shard the page dim; trailing dims follow each array's rank (merged
    # quantized storage is 3-D, per-head storage 4-D)
    kw = dict(mesh=mesh,
              in_specs=(rep, rep, rep, rep)
              + tuple(P(axis, *([None] * (a.ndim - 1)))
                      for a in kv_arrays),
              out_specs=rep)
    try:  # jax>=0.8 renamed check_rep -> check_vma
        f = shard_map(body, check_vma=False, **kw)
    except TypeError:  # pragma: no cover
        f = shard_map(body, check_rep=False, **kw)
    return f(q, positions, total_lens, block_tables, *kv_arrays)


def _sp_body_latent(q, positions, total_lens, bt, *kv_arrays, axis, scale,
                    latent, n_local, k_bits, compand_a, interpret):
    """Per-shard MLA absorbed attend: the latent flash kernel (Hk=1, V =
    leading `latent` channels) over the compacted local table, then the
    same stat merge as GQA sp."""
    from ..ops.flash_attention import flash_attention

    d = jax.lax.axis_index(axis)
    bt_local, pidx = _local_tables(bt, d, n_local)
    if k_bits:
        layer = {"kv_q": kv_arrays[0], "kv_s": kv_arrays[1],
                 "k_pe": kv_arrays[2]}
    else:
        layer = {"kv": kv_arrays[0]}
    acc, m, l = flash_attention(
        q, layer, positions, total_lens, block_tables=bt_local,
        page_indices=pidx, scale=scale, latent=latent, k_bits=k_bits,
        compand_a=compand_a, return_stats=True, interpret=interpret,
    )
    return _merge_stats(acc, m, l, axis, None)


def sp_latent_attend(q_eff, layer_state, block_tables, positions, total_lens,
                     mesh, axis: str = "sp", scale: float = 1.0,
                     latent: int = 0, k_bits: int = 0,
                     compand_a: float = 0.0, backend: str | None = None):
    """Sequence-parallel MLA absorbed attention: latent pages (dim 0)
    sharded over `axis`, effective queries replicated; returns the
    (B, S, Hq, latent) attended latent, replicated. The per-shard body is
    the identical single-device kernel spec (modules/mla_attn.py)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    if backend is None:
        from ..util.env import attn_backend

        backend = attn_backend(k_bits, 0)
    if k_bits:
        kv_arrays = (layer_state["kv_q"], layer_state["kv_s"],
                     layer_state["k_pe"])
    else:
        kv_arrays = (layer_state["kv"],)
    n = mesh.shape[axis]
    P_total = kv_arrays[0].shape[0]
    assert P_total % n == 0
    body = partial(_sp_body_latent, axis=axis, scale=scale, latent=latent,
                   n_local=P_total // n, k_bits=k_bits,
                   compand_a=compand_a,
                   interpret=(backend != "flash"))
    rep = P()
    specs = tuple(P(axis, *([None] * (a.ndim - 1))) for a in kv_arrays)
    kw = dict(mesh=mesh, in_specs=(rep, rep, rep, rep) + specs,
              out_specs=rep)
    try:  # jax>=0.8 renamed check_rep -> check_vma
        f = shard_map(body, check_vma=False, **kw)
    except TypeError:  # pragma: no cover
        f = shard_map(body, check_rep=False, **kw)
    return f(q_eff, positions, total_lens, block_tables, *kv_arrays)


def shard_cache_state(state: dict, mesh, axis: str = "sp") -> dict:
    """Place paged K/V (GQA) and latent (MLA) page dims on the sp axis;
    everything slot-keyed replicates. Raises for cache layouts (DSV4 pools,
    recurrent rings) that have no sp attend path — sharding them would at
    best force a full cache all-gather every step, defeating the capacity
    scaling."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]
    out = {}
    for key, layer in state.items():
        bad = [nm for nm in layer if nm in SP_UNSUPPORTED_NAMES
               or nm.startswith("pg_")]
        if bad:
            raise ValueError(
                f"Generator(sp_mesh=...) supports paged GQA K/V and MLA "
                f"latent caches; layer {key!r} carries {sorted(bad)} "
                f"(DSV4 pool / recurrent layouts have no sequence-parallel "
                f"attend path yet — see doc/parallelism.md)")
        is_ring = "pos" in layer  # SWA ring: slot-keyed, replicates
        new_layer = {}
        for name, arr in layer.items():
            if (not is_ring and arr.ndim >= 2 and arr.shape[0] % n == 0
                    and name in SP_PAGED_NAMES):
                spec = P(axis, *([None] * (arr.ndim - 1)))
            else:
                spec = P()
            new_layer[name] = jax.device_put(arr, NamedSharding(mesh, spec))
        out[key] = new_layer
    return out
