"""Multi-head latent attention (DeepSeek-V2/V3, Kimi-K2).

Feature reference: /root/reference/exllamav3/modules/mla_attn.py
(MLAttention:30, absorbed decode, compressed-latent cache) and
modules/attention_fn/mla_triton.py. The reference runs graph-captured Triton
kernels for the absorbed form; here the absorb/unfold are einsums over the
head axis that XLA maps onto the MXU, and the whole step jits.

Math (absorbed form, used end to end — per-head K/V are never materialized):

    c_kv  = kv_a_norm(W_DKV x)              latent, kv_lora_rank wide
    k_pe  = rope(W_KR x)                    one shared rope key per token
    q     = W_UQ q_a_norm(W_DQ x)  (or W_Q x)
    q_eff = [q_nope @ W_UK | rope(q_pe)]    per head, kv_lora_rank + rope wide
    score = q_eff . [c_kv | k_pe]
    o     = (softmax(score) @ c_kv) @ W_UV  -> W_O

The cache stores only [c_kv | k_pe] — kv_lora_rank + qk_rope_head_dim values
per token (576 for DeepSeek-V3) instead of per-head K/V. Quantized caches
pack the latent in 32-element int32 groups and keep the rope key in bf16
(reference CacheLayer_MLA_quant semantics).

W_UK/W_UV stay dense bf16 (the reference keeps them unquantized too: they are
bmm operands, mla_attn.py:46-49).
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .norms import RMSNorm
from ..constants import PAGE_SIZE
from ..util.rope import Rope, RopeSettings, RopeStyle
from ..loader.safetensors import bf16_to_f32
from ..ops.attention import attend_dense
from ..util.env import attn_backend


class MLAttention(Module):
    is_kv_cache_user = True

    def __init__(
        self,
        config,
        key: str,
        layer_idx: int,
        hidden_size: int,
        num_q_heads: int,
        kv_lora_rank: int,
        qk_nope_head_dim: int,
        qk_rope_head_dim: int,
        v_head_dim: int,
        rope_settings: RopeSettings | None,
        q_lora_rank: int | None = None,
        sm_scale: float | None = None,
        rms_norm_eps: float = 1e-6,
        qmap: str | None = None,
        out_dtype=None,
        key_q: str = "q_proj",
        key_q_a: str = "q_a_proj",
        key_q_b: str = "q_b_proj",
        key_q_a_norm: str = "q_a_layernorm",
        key_kv_a: str = "kv_a_proj_with_mqa",
        key_kv_a_norm: str = "kv_a_layernorm",
        key_kv_b: str = "kv_b_proj",
        key_o: str = "o_proj",
    ):
        super().__init__(config, key, qmap)
        self.layer_idx = layer_idx
        self.hidden_size = hidden_size
        self.num_q_heads = num_q_heads
        self.num_kv_heads = 1
        self.kv_lora_rank = kv_lora_rank
        self.qk_nope_head_dim = qk_nope_head_dim
        self.qk_rope_head_dim = qk_rope_head_dim
        self.qk_head_dim = qk_nope_head_dim + qk_rope_head_dim
        self.v_head_dim = v_head_dim
        self.q_lora_rank = q_lora_rank
        self.key_kv_b = key_kv_b
        self.out_dtype = out_dtype
        # the latent width is what lands in the cache
        self.head_dim = kv_lora_rank + qk_rope_head_dim
        # softmax scale follows the UNabsorbed head dim; yarn mscale_all_dim
        # adjustments arrive via sm_scale from the architecture config
        self.sm_scale = sm_scale if sm_scale is not None else self.qk_head_dim ** -0.5
        self.rope = Rope(rope_settings) if rope_settings else None

        qmap_in = qmap and qmap + ".input"
        if q_lora_rank is None:
            self.q_a_proj = None
            self.q_a_layernorm = None
            self.q_proj = Linear(config, f"{key}.{key_q}", hidden_size,
                                 num_q_heads * self.qk_head_dim, qmap=qmap_in)
        else:
            self.q_a_proj = Linear(config, f"{key}.{key_q_a}", hidden_size,
                                   q_lora_rank, qmap=qmap_in)
            self.q_a_layernorm = RMSNorm(config, f"{key}.{key_q_a_norm}",
                                         rms_norm_eps, dim=q_lora_rank)
            self.q_proj = Linear(config, f"{key}.{key_q_b}", q_lora_rank,
                                 num_q_heads * self.qk_head_dim,
                                 qmap=qmap and qmap + ".q_a")
        self.kv_a_proj_with_mqa = Linear(
            config, f"{key}.{key_kv_a}", hidden_size,
            kv_lora_rank + qk_rope_head_dim, qmap=qmap_in)
        self.kv_a_layernorm = RMSNorm(config, f"{key}.{key_kv_a_norm}",
                                      rms_norm_eps, dim=kv_lora_rank)
        self.o_proj = Linear(config, f"{key}.{key_o}",
                             num_q_heads * v_head_dim, hidden_size,
                             qmap=qmap and qmap + ".o")
        self.modules = [m for m in (
            self.q_a_proj, self.q_a_layernorm, self.q_proj,
            self.kv_a_proj_with_mqa, self.kv_a_layernorm, self.o_proj) if m]

    # -- cache layout --------------------------------------------------------

    def new_cache_layer(self, spec) -> dict:
        from ..model.cache import cache_base_shape, cache_dtype

        c, dr = self.kv_lora_rank, self.qk_rope_head_dim
        if spec.k_bits:
            from ..ops.kv_quant import GROUP

            n, t, _, _ = cache_base_shape(spec, 1, c)
            return {
                "kv_q": jnp.zeros((n, t, 1, c * spec.k_bits // 32), jnp.int32),
                "kv_s": jnp.zeros((n, t, 1, c // GROUP), jnp.bfloat16),
                "k_pe": jnp.zeros((n, t, 1, dr), jnp.bfloat16),
            }
        shape = cache_base_shape(spec, 1, c + dr)
        return {"kv": jnp.zeros(shape, dtype=cache_dtype(spec))}

    # -- loading --------------------------------------------------------------

    def load(self, params: dict) -> None:
        super().load(params)
        stc = self.config.stc
        from .linear import read_dense_weight

        w = read_dense_weight(stc, f"{self.key}.{self.key_kv_b}")
        H, dn, dv, c = (self.num_q_heads, self.qk_nope_head_dim,
                        self.v_head_dim, self.kv_lora_rank)
        assert w.shape == (H * (dn + dv), c), f"{kb}: unexpected shape {w.shape}"
        w = w.reshape(H, dn + dv, c)
        params[self.key] = {
            # (c, H, dn): folds the K up-projection into the query
            "w_uk": jnp.asarray(np.ascontiguousarray(w[:, :dn, :].transpose(2, 0, 1)),
                                dtype=jnp.bfloat16),
            # (c, H, dv): folds the V up-projection into the output
            "w_uv": jnp.asarray(np.ascontiguousarray(w[:, dn:, :].transpose(2, 0, 1)),
                                dtype=jnp.bfloat16),
        }

    # -- forward ---------------------------------------------------------------

    def _project_q_eff(self, x, params, ctx, sin, cos):
        """-> q_eff (B, S, H, c + dr): [q_nope @ W_UK | rope(q_pe)]."""
        B, S, _ = x.shape
        H = self.num_q_heads
        if self.q_a_proj is not None:
            qa = self.q_a_proj.forward(x, params, ctx)
            qa = self.q_a_layernorm.forward(qa, params, ctx)
            q = self.q_proj.forward(qa, params, ctx)
        else:
            q = self.q_proj.forward(x, params, ctx)
        q = q.reshape(B, S, H, self.qk_head_dim)
        q_nope = q[..., : self.qk_nope_head_dim]
        q_pe = q[..., self.qk_nope_head_dim:]
        if self.rope is not None and self.rope.style != RopeStyle.NONE:
            q_pe = self.rope.apply(q_pe, sin, cos)
        w_uk = params[self.key]["w_uk"]  # (c, H, dn)
        q_lat = jnp.einsum(
            "bshn,chn->bshc", q_nope.astype(jnp.bfloat16), w_uk,
            preferred_element_type=jnp.float32,
        )
        return jnp.concatenate(
            [q_lat, q_pe.astype(jnp.float32)], axis=-1).astype(jnp.bfloat16)

    def _project_kv_token(self, x, params, ctx, sin, cos):
        """-> (B, S, c + dr) cache rows [c_kv | rope(k_pe)]."""
        kv = self.kv_a_proj_with_mqa.forward(x, params, ctx)
        c_kv = self.kv_a_layernorm.forward(kv[..., : self.kv_lora_rank], params, ctx)
        k_pe = kv[..., self.kv_lora_rank:][:, :, None, :]  # (B, S, 1, dr)
        if self.rope is not None and self.rope.style != RopeStyle.NONE:
            k_pe = self.rope.apply(k_pe, sin, cos)
        return jnp.concatenate(
            [c_kv.astype(jnp.float32), k_pe[:, :, 0].astype(jnp.float32)], axis=-1)

    def forward(self, x, params: dict, ctx: ForwardCtx):
        B, S, _ = x.shape
        dt = x.dtype
        c, dr = self.kv_lora_rank, self.qk_rope_head_dim

        sin = cos = None
        if self.rope is not None and self.rope.style != RopeStyle.NONE:
            sin, cos = self.rope.sin_cos(ctx.positions)
        q_eff = self._project_q_eff(x, params, ctx, sin, cos)  # (B,S,H,c+dr)
        kv_tok = self._project_kv_token(x, params, ctx, sin, cos)  # (B,S,c+dr)

        if ctx.cache is None:
            k_eff = kv_tok[:, :, None, :].astype(jnp.bfloat16)
            o_lat = attend_dense(
                q_eff, k_eff, k_eff[..., :c],
                q_positions=ctx.positions, k_positions=ctx.positions,
                scale=self.sm_scale,
            )
        else:
            layer = ctx.cache[self.key]
            layer = self._cache_update(layer, kv_tok, ctx)
            ctx.cache[self.key] = layer
            sp = ctx.extras.get("sp") if ctx.attn_mode == "paged" else None
            backend = attn_backend(ctx.k_bits, ctx.v_bits)
            lin_ok = (ctx.attn_mode == "paged"
                      or layer[next(iter(layer))].shape[1] % 8 == 0)
            if sp is not None:
                # sequence-parallel serving: latent pages sharded over the
                # sp axis, per-shard absorbed kernel + stat merge
                # (parallel/sp.py sp_latent_attend)
                from ..parallel.sp import sp_latent_attend
                from .attn import _total_lens

                mesh, axis = sp
                o_lat = sp_latent_attend(
                    q_eff.astype(jnp.float32), layer, ctx.block_tables,
                    ctx.positions, _total_lens(ctx, B, S), mesh, axis,
                    scale=self.sm_scale, latent=c, k_bits=ctx.k_bits,
                    compand_a=ctx.compand_a,
                ).astype(jnp.bfloat16)
            elif backend != "dense" and lin_ok:
                # absorbed decode / SD-verify / PREFILL via the Pallas
                # kernel: Hk=1, V = leading `c` channels of the latent row
                # (never fetched separately). Prefill re-reads the latent
                # S/QT times (tall q blocks bound it); the dense alternative
                # materializes O(S*T*Hq) scores, which explodes at long
                # context
                from ..ops.flash_attention import flash_attention
                from .attn import _total_lens

                o_lat = flash_attention(
                    q_eff, layer, ctx.positions, _total_lens(ctx, B, S),
                    block_tables=(ctx.block_tables
                                  if ctx.attn_mode == "paged" else None),
                    scale=self.sm_scale, latent=c, k_bits=ctx.k_bits,
                    compand_a=ctx.compand_a,
                    interpret=(backend == "interpret"),
                ).astype(jnp.bfloat16)
            else:
                k_eff, k_pos, k_valid = self._cache_fetch(layer, ctx)
                o_lat = attend_dense(
                    q_eff, k_eff, k_eff[..., :c],
                    q_positions=ctx.positions, k_positions=k_pos,
                    k_valid=k_valid, scale=self.sm_scale,
                )

        w_uv = params[self.key]["w_uv"]  # (c, H, dv)
        o = jnp.einsum(
            "bshc,chv->bshv", o_lat.astype(jnp.bfloat16), w_uv,
            preferred_element_type=jnp.float32,
        )
        o = o.reshape(B, S, self.num_q_heads * self.v_head_dim).astype(dt)
        y = self.o_proj.forward(o, params, ctx)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y

    # -- cache plumbing ----------------------------------------------------------

    def _cache_update(self, layer: dict, kv_tok, ctx: ForwardCtx) -> dict:
        """Scatter (B, S, c+dr) rows into the layer state (linear or paged)."""
        B, S, _ = kv_tok.shape
        c = self.kv_lora_rank
        if ctx.attn_mode == "paged":
            page_slot = ctx.positions // PAGE_SIZE
            in_page = ctx.positions % PAGE_SIZE
            rows = jnp.take_along_axis(ctx.block_tables, page_slot, axis=1)
            cols = in_page
        else:
            rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, S))
            cols = ctx.positions
        new = kv_tok[:, :, None, :]  # (B, S, 1, c+dr)
        if ctx.k_bits:
            from ..ops.kv_quant import quantize_kv

            lat_q, lat_s = quantize_kv(new[..., :c], ctx.k_bits, ctx.compand_a)
            return {
                "kv_q": layer["kv_q"].at[rows, cols].set(lat_q),
                "kv_s": layer["kv_s"].at[rows, cols].set(lat_s),
                "k_pe": layer["k_pe"].at[rows, cols].set(
                    new[..., c:].astype(layer["k_pe"].dtype)),
            }
        return {"kv": layer["kv"].at[rows, cols].set(new.astype(layer["kv"].dtype))}

    def _cache_fetch(self, layer: dict, ctx: ForwardCtx):
        """-> (k_eff (B,T,1,c+dr), k_pos (B,T), k_valid or None)."""
        if ctx.attn_mode == "paged":
            B, MP = ctx.block_tables.shape
            T = MP * PAGE_SIZE
            if ctx.k_bits:
                from ..ops.kv_quant import dequantize_kv

                lat = dequantize_kv(layer["kv_q"][ctx.block_tables],
                                    layer["kv_s"][ctx.block_tables], ctx.k_bits,
                                    compand_a=ctx.compand_a)
                kv = jnp.concatenate(
                    [lat, layer["k_pe"][ctx.block_tables].astype(lat.dtype)], axis=-1)
            else:
                kv = layer["kv"][ctx.block_tables]
            kv = kv.reshape(B, T, 1, kv.shape[-1])
            k_pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
            k_valid = k_pos < (ctx.positions.max(axis=-1) + 1)[:, None]
            return kv, k_pos, k_valid
        if ctx.k_bits:
            from ..ops.kv_quant import dequantize_kv

            lat = dequantize_kv(layer["kv_q"], layer["kv_s"], ctx.k_bits,
                                compand_a=ctx.compand_a)
            kv = jnp.concatenate([lat, layer["k_pe"].astype(lat.dtype)], axis=-1)
        else:
            kv = layer["kv"]
        B, T = kv.shape[:2]
        k_pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        return kv, k_pos, None
