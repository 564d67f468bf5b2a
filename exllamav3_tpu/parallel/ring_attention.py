"""Ring attention: sequence-parallel exact attention over a device mesh.

The reference has NO sequence/context parallelism (SURVEY §2.3) — long
context lives on one GPU's paged cache. On TPU the KV cache can shard along
the sequence dim across chips, with the attention computed as a ring: each
device holds one K/V shard, query shards attend locally, and K/V blocks
rotate around the ring via ppermute over ICI, accumulating an online
(flash-style) softmax. P steps of compute fully overlap P-1 neighbor
exchanges; memory per chip is O(T/P).

Masking is position-based (same convention as ops/attention.py): key j is
visible to query i iff k_pos[j] <= q_pos[i], so causal masking works for any
block rotation order and padded slots park at out-of-range positions.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, q_pos, k_pos, scale):
    """One q-shard vs one k/v-block: returns (scores_max (B,Hk,G,S),
    exp-sum, weighted value accum) for online-softmax merging.
    q: (B,S,Hq,D); k/v: (B,T,Hk,D)."""
    B, S, Hq, D = q.shape
    Hk = k.shape[2]
    G = Hq // Hk
    qg = q.reshape(B, S, Hk, G, D).astype(jnp.float32)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, k.astype(jnp.float32)) * scale
    mask = k_pos[:, None, None, None, :] <= q_pos[:, None, None, :, None]
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1)  # (B,Hk,G,S)
    p = jnp.exp(scores - m[..., None])
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bkgst,btkd->bkgsd", p, v.astype(jnp.float32))
    return m, l, acc


def ring_attention_shard(q, k, v, q_pos, k_pos, axis_name: str,
                         scale: float = 1.0):
    """Per-shard body (run under shard_map). q: (B, S_loc, Hq, D) local query
    shard; k/v: (B, T_loc, Hk, D) local KV shard; *_pos: absolute positions
    of the local slots. Returns the local output shard (B, S_loc, Hq, D)."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    B, S, Hq, D = q.shape
    Hk = k.shape[2]
    G = Hq // Hk

    m = jnp.full((B, Hk, G, S), NEG_INF, dtype=jnp.float32)
    l = jnp.zeros((B, Hk, G, S), dtype=jnp.float32)
    acc = jnp.zeros((B, Hk, G, S, D), dtype=jnp.float32)

    def step(i, carry):
        m, l, acc, k, v, k_pos = carry
        bm, bl, bacc = _block_attend(q, k, v, q_pos, k_pos, scale)
        new_m = jnp.maximum(m, bm)
        # avoid exp(NEG_INF - NEG_INF) when a row has seen no keys yet
        c_old = jnp.where(m <= NEG_INF / 2, 0.0, jnp.exp(m - new_m))
        c_new = jnp.where(bm <= NEG_INF / 2, 0.0, jnp.exp(bm - new_m))
        l = l * c_old + bl * c_new
        acc = acc * c_old[..., None] + bacc * c_new[..., None]
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        k_pos = jax.lax.ppermute(k_pos, axis_name, perm)
        return new_m, l, acc, k, v, k_pos

    m, l, acc, _, _, _ = jax.lax.fori_loop(
        0, n, step, (m, l, acc, k, v, k_pos))
    out = acc / jnp.maximum(l, 1e-20)[..., None]  # (B,Hk,G,S,D)
    return jnp.moveaxis(out, 3, 1).reshape(B, S, Hq, D)


def make_ring_attention(mesh: Mesh, axis_name: str = "sp"):
    """jit-able sequence-parallel attention over `mesh`'s `axis_name`.
    Inputs are full arrays logically; shard_map splits the seq dims."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec_q = P(None, axis_name, None, None)
    spec_pos = P(None, axis_name)

    def apply(q, k, v, q_pos, k_pos, scale: float = 1.0):
        # scale is static per jit trace; close over it
        kw = dict(mesh=mesh,
                  in_specs=(spec_q, spec_q, spec_q, spec_pos, spec_pos),
                  out_specs=spec_q)
        body = partial(ring_attention_shard, axis_name=axis_name, scale=scale)
        try:  # jax>=0.8 renamed check_rep -> check_vma
            f = shard_map(body, check_vma=False, **kw)
        except TypeError:
            f = shard_map(body, check_rep=False, **kw)
        return f(q, k, v, q_pos, k_pos)

    return apply
