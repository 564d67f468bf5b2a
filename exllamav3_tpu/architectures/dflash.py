"""DFlash: block-diffusion draft models for speculative decoding.

Feature reference: /root/reference/exllamav3/architecture/dflash.py
(DFlashDraftModel) + modules/arch_specific/dflash.py (DFlashInputLayer) +
generator/generator.py:639 (iterate_draftmodel_dflash_gen). Mechanics:

  * the draft's paged KV CONTEXT is built from the TARGET's hidden states:
    states captured after target_layer_ids blocks concatenate -> fc ->
    hidden_norm, and each draft layer's k/v projections of that vector fill
    the draft cache at the token's position (update_fn). The draft never
    runs a forward over the context itself.
  * drafting: ONE forward over [last_token, mask x (block_size-1)]
    embeddings (borrowed target embedding); full-attention layers attend
    bidirectionally within the block and causally over the context;
    sliding layers keep their (left sw, right 0) window. The target's
    lm_head reads out the whole draft block at once (draft_fn).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import Attention, Embedding, GatedMLP, Linear, RMSNorm, TransformerBlock
from ..modules.module import ForwardCtx
from ..modules.norms import rms_norm
from ..util.rope import RopeStyle
from ..constants import PAGE_SIZE

NEG_INF = -1e30


class DFlashConfig(Config):
    arch_string = "DFlashDraftModel"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": DFlashModel},
                         **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.layer_types = self.read_cfg(
            list, "layer_types", ["full_attention"] * self.num_hidden_layers)
        self.sliding_window = self.read_cfg(int, "sliding_window", 2048)
        self.mask_token_id = self.read_cfg(
            int, "dflash_config->mask_token_id", no_default)
        # z-lab drafters were trained on states one layer DEEPER than the
        # raw ids (reference dflash.py:58 shifts +1); DFlashLaguna undoes this
        self.target_layer_ids = [
            i + 1 for i in self.read_cfg(
                list, "dflash_config->target_layer_ids", no_default)]
        self.block_size = self.read_cfg(
            int, ["block_size", "dflash_config->block_size"], no_default)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.NEOX)


class DFlashModel(Model):
    config_class = DFlashConfig

    def __init__(self, config: DFlashConfig, **kwargs):
        super().__init__(config, **kwargs)
        self.block_size = config.block_size
        self.mask_token_id = config.mask_token_id
        self.target_layer_ids = list(config.target_layer_ids)
        self.sliding_window = config.sliding_window
        h = config.hidden_size
        self.fc = Linear(config, "fc", h * len(config.target_layer_ids), h)
        self.hidden_norm = RMSNorm(config, "hidden_norm", config.rms_norm_eps)
        self.modules = [self.fc, self.hidden_norm]
        self.first_block_idx = len(self.modules)
        self.blocks: list = []
        for idx in range(config.num_hidden_layers):
            lk = f"layers.{idx}"
            blk = TransformerBlock(
                config=config, key=lk, layer_idx=idx,
                attn_norm=RMSNorm(config, f"{lk}.input_layernorm",
                                  config.rms_norm_eps),
                attn=Attention(
                    config=config, key=f"{lk}.self_attn", layer_idx=idx,
                    hidden_size=h, head_dim=config.head_dim,
                    num_q_heads=config.num_q_heads,
                    num_kv_heads=config.num_kv_heads,
                    rope_settings=config.rope_settings,
                    qmap="block.attn",
                    q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                                   config.rms_norm_eps, dim=config.head_dim),
                    k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                                   config.rms_norm_eps, dim=config.head_dim),
                    out_dtype=jnp.float32,
                ),
                mlp_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                 config.rms_norm_eps),
                mlp=GatedMLP(config=config, key=f"{lk}.mlp", hidden_size=h,
                             intermediate_size=config.intermediate_size,
                             qmap="block.mlp", out_dtype=jnp.float32),
            )
            # update_fn/_block_forward drive k/v projections individually
            blk.attn.allow_fusion = False
            self.blocks.append(blk)
            self.modules.append(blk)
        self.last_kv_module_idx = len(self.modules) - 1
        self.modules.append(RMSNorm(config, "norm", config.rms_norm_eps,
                                    out_dtype=jnp.bfloat16))
        self.caps["dflash_draft"] = True
        self.causal_draft = False  # DFlashLaguna drafts causally in-block
        self.target = None

    def attach(self, target_model):
        from ..modules import Embedding

        self.target = target_model
        self.embed = next(m for m in target_model.root.walk()
                          if isinstance(m, Embedding))
        self.head = target_model.modules[target_model.logit_layer_idx]

    # -- context update: target hiddens -> draft KV cache ----------------------

    def update_fn(self):
        """(d_params, target_hiddens_cat (B,S,L*h), cache_state, positions,
        block_tables, seqlens) -> new cache_state."""

        def fn(d_params, th, cache_state, positions, block_tables, seqlens):
            ctx = ForwardCtx(positions=positions, attn_mode="paged",
                             cache=dict(cache_state),
                             block_tables=block_tables, cache_seqlens=seqlens)
            h = self.fc.forward(th, d_params, ctx)
            h = self.hidden_norm.forward(h, d_params, ctx)
            B, S, _ = h.shape
            page_slot = positions // PAGE_SIZE
            rows = jnp.take_along_axis(block_tables, page_slot, axis=1)
            cols = positions % PAGE_SIZE
            for blk in self.blocks:
                attn = blk.attn
                k = attn.k_proj.forward(h, d_params, ctx).reshape(
                    B, S, attn.num_kv_heads, attn.head_dim)
                if attn.k_norm is not None:
                    k = attn.k_norm.forward(k, d_params, ctx)
                sin, cos = attn.rope.sin_cos(positions)
                k = attn.rope.apply(k, sin, cos)
                v = attn.v_proj.forward(h, d_params, ctx).reshape(
                    B, S, attn.num_kv_heads, attn.head_dim)
                layer = ctx.cache[attn.key]
                ctx.cache[attn.key] = {
                    "k": layer["k"].at[rows, cols].set(k.astype(layer["k"].dtype)),
                    "v": layer["v"].at[rows, cols].set(v.astype(layer["v"].dtype)),
                }
            return ctx.cache

        return fn

    # -- drafting: one forward over [last_tok | masks] --------------------------

    def draft_fn(self):
        """(t_params, d_params, ids (B, block), cache_state, positions,
        block_tables) -> draft token ids (B, block)."""

        def fn(t_params, d_params, ids, cache_state, positions, block_tables):
            ctx = ForwardCtx(positions=positions, attn_mode="paged",
                             cache=dict(cache_state),
                             block_tables=block_tables)
            x = self.embed.forward(ids, t_params, ctx)
            B, S, _ = x.shape
            for li, blk in enumerate(self.blocks):
                swa = (self.config.layer_types[li] == "sliding_attention")
                x = self._block_forward(blk, x, d_params, ctx,
                                        self.sliding_window if swa else 0)
            x = self.modules[-1].forward(x, d_params, ctx)
            logits = self.head.forward(x, t_params, ctx)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        return fn

    def _block_forward(self, blk, x, params, ctx, sliding: int):
        """Transformer block whose attention reads the context cache
        causally and the draft block bidirectionally (full layers) or with
        a (left sw, right 0) window (sliding layers)."""
        attn = blk.attn
        B, S, _ = x.shape
        res = x.astype(jnp.float32)
        h = blk.attn_norm.forward(x, params, ctx)
        q = attn.q_proj.forward(h, params, ctx).reshape(
            B, S, attn.num_q_heads, attn.head_dim)
        k = attn.k_proj.forward(h, params, ctx).reshape(
            B, S, attn.num_kv_heads, attn.head_dim)
        v = attn.v_proj.forward(h, params, ctx).reshape(
            B, S, attn.num_kv_heads, attn.head_dim)
        if attn.q_norm is not None:
            q = attn.q_norm.forward(q, params, ctx)
            k = attn.k_norm.forward(k, params, ctx)
        sin, cos = attn.rope.sin_cos(ctx.positions)
        q = attn.rope.apply(q, sin, cos)
        k = attn.rope.apply(k, sin, cos)

        layer = ctx.cache[attn.key]
        MP = ctx.block_tables.shape[1]
        T = MP * PAGE_SIZE
        kc = layer["k"][ctx.block_tables].reshape(B, T, attn.num_kv_heads,
                                                  attn.head_dim)
        vc = layer["v"][ctx.block_tables].reshape(B, T, attn.num_kv_heads,
                                                  attn.head_dim)
        c_pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        q_pos = ctx.positions  # (B, S)
        start = q_pos[:, :1]  # block start position

        # context part: causal (cache holds positions < block start)
        m_ctx = (c_pos[:, None, :] <= q_pos[:, :, None]) & \
                (c_pos[:, None, :] < start[:, :, None])
        # block part: bidirectional (or causal for DFlashLaguna); sliding
        # layers window (left sw, right 0)
        bk_pos = q_pos
        d = q_pos[:, :, None] - bk_pos[:, None, :]
        m_blk = jnp.ones((B, S, S), dtype=bool)
        if self.causal_draft:
            m_blk = d >= 0
        if sliding:
            m_blk &= (d >= 0) & (d < sliding)
            m_ctx &= (q_pos[:, :, None] - c_pos[:, None, :]) < sliding

        k_all = jnp.concatenate([kc.astype(x.dtype), k.astype(x.dtype)], axis=1)
        v_all = jnp.concatenate([vc.astype(x.dtype), v.astype(x.dtype)], axis=1)
        mask = jnp.concatenate([m_ctx, m_blk], axis=2)  # (B, S, T+S)

        Hq, Hk = attn.num_q_heads, attn.num_kv_heads
        G = Hq // Hk
        qg = q.reshape(B, S, Hk, G, attn.head_dim).astype(jnp.float32)
        scores = jnp.einsum("bskgd,btkd->bkgst", qg,
                            k_all.astype(jnp.float32)) * attn.sm_scale
        scores = jnp.where(mask[:, None, None], scores, NEG_INF)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bkgst,btkd->bskgd", p, v_all.astype(jnp.float32))
        o = o.reshape(B, S, Hq, attn.head_dim)
        if attn.g_proj is not None:
            g = attn.g_proj.forward(h, params, ctx).astype(jnp.float32)
            act = jax.nn.softplus if attn.gate_softplus else jax.nn.sigmoid
            o = o * act(g)[..., None]
        o = o.reshape(B, S, Hq * attn.head_dim).astype(x.dtype)
        res = res + attn.o_proj.forward(o, params, ctx).astype(jnp.float32)
        x = res.astype(x.dtype)
        h = blk.mlp_norm.forward(x, params, ctx)
        res = res + blk.mlp.forward(h, params, ctx).astype(jnp.float32)
        return res.astype(x.dtype)


ARCHITECTURES = [DFlashConfig]
