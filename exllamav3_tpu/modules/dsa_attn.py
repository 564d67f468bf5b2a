"""DSA: DeepSeek sparse attention — lightning indexer + top-k key selection
over the MLA compressed-latent cache.

Feature reference: /root/reference/exllamav3/modules/dsv4.py
(DSV4Attention:339 — indexer.wq_b / indexer.weights_proj scoring head,
index_topk selection, dsa_topk.cu) and attention_fn/dsa_triton.py. This
implements the sparse-attention CORE the V3.2/V4 family shares:

    q_idx = wq_b(q_a_norm(q_a(x)))        (B, S, Hi, di)
    k_idx = k_norm(wk(x))                 one shared index key per token
    score(t, s) = sum_h w_t[h] * relu(q_idx[t,h] . k_idx[s]) / sqrt(di)
    keep the index_topk highest-scoring visible keys per query

and runs the absorbed MLA attention restricted to the selected keys. The
index keys live next to the latent in the cache. The V4 compressor pools
(csa/hca ring buffers) are NOT implemented yet — this is the "dsa" base
layer type.

The jnp path materializes the (B, S, T) index-score matrix and converts
top-k to a boolean mask (exact semantics; a Pallas gather kernel that only
touches the selected latents is the round-2 optimization).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .module import ForwardCtx
from .mla_attn import MLAttention
from .linear import Linear
from .norms import LayerNorm
from ..constants import PAGE_SIZE
from ..ops.attention import attend_dense


class DSAttention(MLAttention):
    def __init__(self, *args, index_n_heads: int = 64,
                 index_head_dim: int = 128, index_topk: int = 2048,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.index_n_heads = index_n_heads
        self.index_head_dim = index_head_dim
        self.index_topk = index_topk
        config, key = self.config, self.key
        assert self.q_lora_rank, "DSA requires the q_lora path"
        self.idx_wq_b = Linear(config, f"{key}.indexer.wq_b", self.q_lora_rank,
                               index_n_heads * index_head_dim)
        self.idx_wk = Linear(config, f"{key}.indexer.wk", self.hidden_size,
                             index_head_dim)
        self.idx_k_norm = LayerNorm(config, f"{key}.indexer.k_norm",
                                    dim=index_head_dim)
        self.idx_weights = Linear(config, f"{key}.indexer.weights_proj",
                                  self.hidden_size, index_n_heads)
        self.modules += [self.idx_wq_b, self.idx_wk, self.idx_k_norm,
                         self.idx_weights]

    # -- cache: latent [+quant] plus index keys --------------------------------

    def new_cache_layer(self, spec) -> dict:
        from ..model.cache import cache_base_shape

        layer = super().new_cache_layer(spec)
        n, t, _, _ = cache_base_shape(spec, 1, self.index_head_dim)
        layer["idx_k"] = jnp.zeros((n, t, 1, self.index_head_dim), jnp.bfloat16)
        return layer

    # -- forward -----------------------------------------------------------------

    def forward(self, x, params: dict, ctx: ForwardCtx):
        B, S, _ = x.shape
        dt = x.dtype
        c = self.kv_lora_rank

        sin = cos = None
        if self.rope is not None:
            sin, cos = self.rope.sin_cos(ctx.positions)

        # shared q_a trunk feeds both the attention query and the indexer
        qa = self.q_a_proj.forward(x, params, ctx)
        qa = self.q_a_layernorm.forward(qa, params, ctx)
        q = self.q_proj.forward(qa, params, ctx).reshape(
            B, S, self.num_q_heads, self.qk_head_dim)
        q_nope, q_pe = q[..., : self.qk_nope_head_dim], q[..., self.qk_nope_head_dim:]
        if self.rope is not None:
            q_pe = self.rope.apply(q_pe, sin, cos)
        w_uk = params[self.key]["w_uk"]
        q_lat = jnp.einsum("bshn,chn->bshc", q_nope.astype(jnp.bfloat16), w_uk,
                           preferred_element_type=jnp.float32)
        q_eff = jnp.concatenate(
            [q_lat, q_pe.astype(jnp.float32)], axis=-1).astype(jnp.bfloat16)

        kv_tok = self._project_kv_token(x, params, ctx, sin, cos)

        # indexer projections
        di, Hi = self.index_head_dim, self.index_n_heads
        q_idx = self.idx_wq_b.forward(qa, params, ctx).reshape(B, S, Hi, di)
        k_idx = self.idx_k_norm.forward(
            self.idx_wk.forward(x, params, ctx), params, ctx)  # (B, S, di)
        w_idx = self.idx_weights.forward(x, params, ctx).astype(jnp.float32)

        if ctx.cache is None:
            k_eff = kv_tok[:, :, None, :].astype(jnp.bfloat16)
            k_all_idx = k_idx
            k_pos = ctx.positions
            k_valid = None
        else:
            layer = dict(ctx.cache[self.key])
            idx_store = layer.pop("idx_k")
            layer = self._cache_update(layer, kv_tok, ctx)
            if ctx.attn_mode == "paged":
                page_slot = ctx.positions // PAGE_SIZE
                rows = jnp.take_along_axis(ctx.block_tables, page_slot, axis=1)
                cols = ctx.positions % PAGE_SIZE
            else:
                rows = jnp.broadcast_to(
                    jnp.arange(B, dtype=jnp.int32)[:, None], (B, S))
                cols = ctx.positions
            idx_store = idx_store.at[rows, cols].set(
                k_idx[:, :, None, :].astype(idx_store.dtype))
            layer["idx_k"] = idx_store
            ctx.cache[self.key] = layer
            k_eff, k_pos, k_valid = self._cache_fetch(layer, ctx)
            if ctx.attn_mode == "paged":
                MP = ctx.block_tables.shape[1]
                k_all_idx = idx_store[ctx.block_tables].reshape(
                    B, MP * PAGE_SIZE, di)
            else:
                k_all_idx = idx_store[:, :, 0, :]

        # lightning index scores: (B, S, T)
        scores = jnp.einsum("bshd,btd->bhst", q_idx.astype(jnp.float32),
                            k_all_idx.astype(jnp.float32))
        scores = jax.nn.relu(scores) / math.sqrt(di)
        scores = jnp.einsum("bhst,bsh->bst", scores, w_idx)

        # visibility + top-k selection mask
        T = scores.shape[-1]
        vis = k_pos[:, None, :] <= ctx.positions[:, :, None]
        if k_valid is not None:
            vis &= k_valid[:, None, :]
        scores = jnp.where(vis, scores, -jnp.inf)
        topk = min(self.index_topk, T)
        _, topi = jax.lax.top_k(scores, topk)
        sel = jnp.zeros((B, S, T), dtype=jnp.bool_)
        sel = sel.at[jnp.arange(B)[:, None, None],
                     jnp.arange(S)[None, :, None], topi].set(True)
        sel &= vis

        o_lat = attend_dense(
            q_eff, k_eff, k_eff[..., :c],
            q_positions=ctx.positions, k_positions=k_pos,
            k_valid=k_valid, scale=self.sm_scale, select_mask=sel,
        )
        w_uv = params[self.key]["w_uv"]
        o = jnp.einsum("bshc,chv->bshv", o_lat.astype(jnp.bfloat16), w_uv,
                       preferred_element_type=jnp.float32)
        o = o.reshape(B, S, self.num_q_heads * self.v_head_dim).astype(dt)
        y = self.o_proj.forward(o, params, ctx)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y
