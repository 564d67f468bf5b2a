"""Attention: QKV projections, RoPE, KV cache update, masked SDPA.

Feature reference: /root/reference/exllamav3/modules/attn.py (Attention:143,
project_qkv, decode paths :715-846). The reference dispatches across Triton/
FA2/xformers/SDPA backends and CUDA-graph-captures the decode step; here a
single jnp attention (ops/attention.py grows Pallas flash/paged kernels) is
traced into the jitted model step — compilation replaces graph capture.

Supports: GQA, QK norms (Qwen3), sliding window, logit softcap (Gemma2),
attention sinks (gpt-oss), partial/none RoPE.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module, ForwardCtx
from .linear import Linear
from .norms import RMSNorm
from ..util.rope import Rope, RopeSettings, RopeStyle
from ..model.cache import linear_cache_update, paged_cache_update
from ..ops.attention import attend_dense, attend_paged
from ..util.env import attn_backend


def _total_lens(ctx, B: int, S: int):
    """Per-row cache length AFTER this chunk's update: cache_seqlens plus the
    count of contiguous valid rows (padded rows park at positions !=
    seqlen+arange and drop out). Used for page-bound clamping and k-validity
    — fixes the reference-noted hazard of inferring length from
    q_positions.max() when padded rows park beyond the true end."""
    if ctx.cache_seqlens is None:
        return ctx.positions.max(axis=-1).astype(jnp.int32) + 1
    expect = ctx.cache_seqlens[:, None] + jnp.arange(S, dtype=jnp.int32)
    valid = ctx.positions == expect
    return (ctx.cache_seqlens
            + jnp.sum(valid.astype(jnp.int32), axis=1)).astype(jnp.int32)


class Attention(Module):
    is_kv_cache_user = True

    def __init__(
        self,
        config,
        key: str,
        layer_idx: int,
        hidden_size: int,
        head_dim: int,
        num_q_heads: int,
        num_kv_heads: int,
        rope_settings: RopeSettings | None,
        sm_scale: float | None = None,
        key_q: str = "q_proj",
        key_k: str = "k_proj",
        key_v: str = "v_proj",
        key_o: str = "o_proj",
        qmap: str | None = None,
        q_norm: RMSNorm | None = None,
        k_norm: RMSNorm | None = None,
        v_norm: RMSNorm | None = None,
        use_k_as_v: bool = False,
        sliding_window: int = 0,
        logit_softcap: float = 0.0,
        has_sinks: bool = False,
        interleaved_gate: bool = False,
        key_g: str | None = None,
        full_gate: bool = False,
        gate_softplus: bool = False,
        post_rope_norm: bool = False,
        post_rope_eps: float = 1e-6,
        ve_gate: bool = False,
        out_dtype=None,
    ):
        super().__init__(config, key, qmap)
        self.layer_idx = layer_idx
        self.head_dim = head_dim
        self.num_q_heads = num_q_heads
        self.num_kv_heads = num_kv_heads
        self.sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(head_dim)
        self.sliding_window = max(0, sliding_window)  # -1/0 = full attention
        self.logit_softcap = logit_softcap
        self.has_sinks = has_sinks
        # Qwen3-Next style output gate: q_proj emits [q | gate] interleaved
        # per head; sigmoid(gate) scales the attention output pre-o_proj
        # (reference attn.py interleaved_gate, :557-563, :785)
        self.interleaved_gate = interleaved_gate
        self.out_dtype = out_dtype
        self.rope = Rope(rope_settings) if rope_settings else None

        qf = 2 if interleaved_gate else 1
        self.q_proj = Linear(config, f"{key}.{key_q}", hidden_size,
                             num_q_heads * head_dim * qf,
                             qmap=qmap and qmap + ".qkv")
        self.k_proj = Linear(config, f"{key}.{key_k}", hidden_size,
                             num_kv_heads * head_dim, qmap=qmap and qmap + ".qkv")
        self.v_proj = Linear(config, f"{key}.{key_v}", hidden_size,
                             num_kv_heads * head_dim, qmap=qmap and qmap + ".qkv")
        self.o_proj = Linear(config, f"{key}.{key_o}", num_q_heads * head_dim,
                             hidden_size, qmap=qmap and qmap + ".o")
        # separate output gate projection (AFMoE full_gate; reference
        # attn.py:345-371): sigmoid(g_proj(x)) scales the attention output,
        # full-width (per channel) or headwise (one scalar per head)
        self.g_proj = None
        self.full_gate = full_gate
        # Laguna: headwise gate activated with softplus instead of sigmoid
        # (reference attn.py gate_softplus:183, :782)
        self.gate_softplus = gate_softplus
        if key_g:
            gate_features = num_q_heads * head_dim if full_gate else num_q_heads
            self.g_proj = Linear(config, f"{key}.{key_g}", hidden_size,
                                 gate_features)
        self.q_norm = q_norm
        self.k_norm = k_norm
        # Gemma4: normalize V, and/or reuse the K projection as V
        # (reference attn.py use_k_as_v:178, v_norm:169)
        self.v_norm = v_norm
        self.use_k_as_v = use_k_as_v
        if use_k_as_v:
            self.v_proj = None
        # nanochat: unweighted RMS over q/k applied AFTER rope (reference
        # attn.py post_rope_norm / rope.cu post-norm epilogue), and a gated
        # value-embedding addend on V (reference attn.py:734, transformer.py
        # _compute_ve_addend) read from ctx.extras["nc_ve.<layer>"]
        self.post_rope_norm = post_rope_norm
        self.post_rope_eps = post_rope_eps
        self.ve_gate = ve_gate
        self.modules = [m for m in (self.q_proj, self.k_proj, self.v_proj,
                                    self.o_proj, self.g_proj, self.q_norm,
                                    self.k_norm, self.v_norm) if m]

    def new_cache_layer(self, spec) -> dict:
        """Per-head K/V layer state (fp16-analogue bf16, or int32-packed
        quantized; reference cache/fp16.py, cache/quant.py). With
        spec.swa_ring, sliding-window layers hold a fixed W-slot ring per
        sequence slot plus a position array for masking/overwrite."""
        from ..model.cache import cache_base_shape, cache_dtype

        if spec.swa_ring and self.sliding_window:
            n = spec.recurrent_slots or (
                spec.batch_size if spec.layout == "linear" else 33)
            # the window + the query's own slot + headroom so speculative
            # (draft) writes never evict a still-live window entry: slots
            # alias every R positions, and up to ~16 future positions may be
            # written then rejected (SD verify chunks); rounded to a multiple
            # of 8 for the Pallas ring-decode kernel's time blocks
            W = self.sliding_window + 1 + 16
            W += (-W) % 8
            dt = cache_dtype(spec)
            return {
                "k": jnp.zeros((n, W, self.num_kv_heads, self.head_dim), dt),
                "v": jnp.zeros((n, W, self.num_kv_heads, self.head_dim), dt),
                "pos": jnp.full((n, W), -1, jnp.int32),
            }
        shape = cache_base_shape(spec, self.num_kv_heads, self.head_dim)
        if spec.k_bits:
            from ..ops.kv_quant import quant_cache_shapes

            return quant_cache_shapes(shape, spec.k_bits, spec.v_bits)
        dt = cache_dtype(spec)
        return {"k": jnp.zeros(shape, dtype=dt), "v": jnp.zeros(shape, dtype=dt)}

    def load(self, params: dict) -> None:
        super().load(params)
        if self.has_sinks:
            s = self.config.stc.get_tensor(self.key + ".sinks", optional=True)
            if s is not None:
                params[self.key] = {"sinks": jnp.asarray(s.astype(np.float32))}
        self._fused_qkv = False
        if getattr(self.config.infer_params, "fuse_projections", False) \
                and not self.interleaved_gate \
                and self.v_proj is not None \
                and getattr(self, "allow_fusion", True):
            from .multilinear import try_fuse

            self._fused_qkv = try_fuse(
                params, self.key, "qkv",
                [self.q_proj, self.k_proj, self.v_proj])

    def refuse(self, params: dict) -> None:
        """Re-fuse after LoRA detach (bitwise-identical to the load-time
        fusion: concatenation of unchanged weights)."""
        if getattr(self, "_fused_qkv", False) or self.interleaved_gate \
                or not getattr(self.config.infer_params, "fuse_projections", False):
            return
        from .multilinear import try_fuse

        self._fused_qkv = try_fuse(params, self.key, "qkv",
                                   [self.q_proj, self.k_proj, self.v_proj])

    def unfuse(self, params: dict) -> None:
        """Split the fused qkv entry back into per-projection params (needed
        before attaching LoRA adapters to q/k/v)."""
        if not getattr(self, "_fused_qkv", False):
            return
        from .multilinear import unfuse

        hd = self.head_dim
        outs = [self.num_q_heads * hd, self.num_kv_heads * hd,
                self.num_kv_heads * hd]
        unfuse(params, self.key, "qkv",
               [self.q_proj, self.k_proj, self.v_proj], outs)
        self._fused_qkv = False

    def forward(self, x, params: dict, ctx: ForwardCtx):
        B, S, H = x.shape
        dt = x.dtype
        gate = None
        hd = self.head_dim
        nq, nkv = self.num_q_heads, self.num_kv_heads
        if getattr(self, "_fused_qkv", False):
            from .multilinear import fused_forward

            qkv = fused_forward(params, self.key, "qkv", x)
            q = qkv[..., : nq * hd].reshape(B, S, nq, hd)
            k = qkv[..., nq * hd : (nq + nkv) * hd].reshape(B, S, nkv, hd)
            v = qkv[..., (nq + nkv) * hd :].reshape(B, S, nkv, hd)
        elif self.interleaved_gate:
            qg = self.q_proj.forward(x, params, ctx).reshape(B, S, nq, 2 * hd)
            q, gate = qg[..., :hd], qg[..., hd:]
            k = self.k_proj.forward(x, params, ctx).reshape(B, S, nkv, hd)
            v = self.v_proj.forward(x, params, ctx).reshape(B, S, nkv, hd)
        else:
            q = self.q_proj.forward(x, params, ctx).reshape(B, S, nq, hd)
            k = self.k_proj.forward(x, params, ctx).reshape(B, S, nkv, hd)
            v = k if self.use_k_as_v else \
                self.v_proj.forward(x, params, ctx).reshape(B, S, nkv, hd)

        if self.v_norm is not None:
            v = self.v_norm.forward(v, params, ctx)

        if self.ve_gate:
            v = v + ctx.extras[f"nc_ve.{self.layer_idx}"].astype(v.dtype)

        if self.q_norm is not None:
            q = self.q_norm.forward(q, params, ctx)
        if self.k_norm is not None:
            k = self.k_norm.forward(k, params, ctx)

        if self.rope is not None and self.rope.style != RopeStyle.NONE:
            m3 = ctx.extras.get("mrope_positions")
            if m3 is not None and self.rope.mrope_sections:
                sin, cos = self.rope.sin_cos_mrope(m3)
            else:
                sin, cos = self.rope.sin_cos(ctx.positions)
            q = self.rope.apply(q, sin, cos)
            k = self.rope.apply(k, sin, cos)

        if self.post_rope_norm:
            from .norms import rms_norm

            one = jnp.ones((hd,), jnp.float32)
            q = rms_norm(q, one, self.post_rope_eps)
            k = rms_norm(k, one, self.post_rope_eps)

        sinks = params.get(self.key, {}).get("sinks") if self.has_sinks else None

        if ctx.cache is None:
            # cacheless forward (conversion / eval): attend within the chunk
            o = attend_dense(
                q.astype(dt), k.astype(dt), v.astype(dt),
                q_positions=ctx.positions, k_positions=ctx.positions,
                k_valid=None, scale=self.sm_scale,
                sliding_window=self.sliding_window,
                logit_softcap=self.logit_softcap, sinks=sinks,
            )
        elif "pos" in ctx.cache[self.key]:
            # SWA ring: W+1 slots per sequence, slot = position mod W+1.
            # Queries attend over [prior ring contents | this chunk's keys]
            # (the chunk may be longer than the window, so its keys can't all
            # land in the ring); only the LAST W+1 chunk positions write back
            # — ring slots alias every W+1 positions and duplicate-scatter
            # order is unspecified. The stored position array masks unwritten
            # (-1) and speculative (future) slots, so overwrite IS eviction.
            layer = ctx.cache[self.key]
            W = layer["k"].shape[1]
            slots = (ctx.state_slots if ctx.state_slots is not None
                     else jnp.arange(B, dtype=jnp.int32))
            k_prev = layer["k"][slots]
            v_prev = layer["v"][slots]
            pos_prev = layer["pos"][slots]

            if ctx.cache_seqlens is not None:
                expect = (ctx.cache_seqlens[:, None]
                          + jnp.arange(S, dtype=jnp.int32))
                valid = ctx.positions == expect
            else:
                valid = jnp.ones((B, S), dtype=bool)
            vlen = jnp.sum(valid, axis=1)
            last_pos = (ctx.cache_seqlens if ctx.cache_seqlens is not None
                        else jnp.zeros(B, jnp.int32)) + vlen - 1
            keep = valid & (ctx.positions > (last_pos[:, None] - W))
            idx = jnp.where(keep, ctx.positions % W, W)
            rows = slots[:, None]
            layer = {
                "k": layer["k"].at[rows, idx].set(
                    k.astype(layer["k"].dtype), mode="drop"),
                "v": layer["v"].at[rows, idx].set(
                    v.astype(layer["v"].dtype), mode="drop"),
                "pos": layer["pos"].at[rows, idx].set(
                    ctx.positions, mode="drop"),
            }
            ctx.cache[self.key] = layer

            from ..ops.flash_attention import ring_kernel_fits

            backend = attn_backend()
            if S == 1 and backend != "dense" and ring_kernel_fits(
                    W, self.num_kv_heads, self.head_dim,
                    layer["k"].dtype.itemsize):
                # decode via the ring kernel: reads the (freshly scattered)
                # ring straight from the state arrays via slot rows — no
                # (B, W, Hk, D) gather copy; stale speculative slots carry
                # future positions and self-mask
                from ..ops.flash_attention import flash_ring_attention

                o = flash_ring_attention(
                    q, layer["k"], layer["v"], layer["pos"], slots,
                    ctx.positions, sinks=sinks, scale=self.sm_scale,
                    sliding_window=self.sliding_window,
                    logit_softcap=self.logit_softcap,
                    interpret=(backend == "interpret"),
                ).astype(dt)
            else:
                if S == 1 and backend != "dense":
                    # the ring kernel declined (ring K+V exceed the VMEM
                    # budget) — log once so a silent slow path is visible
                    if not getattr(self, "_ring_fallback_logged", False):
                        self._ring_fallback_logged = True
                        from ..util.debug import log as _dlog

                        _dlog("attn",
                              f"{self.key}: SWA ring W={W} Hk="
                              f"{self.num_kv_heads} D={self.head_dim} "
                              f"exceeds the ring-kernel VMEM budget; "
                              f"decode uses the dense path")
                # prior entries must be strictly older than the chunk start
                # — stale speculative slots could otherwise duplicate chunk
                # keys
                start = (ctx.cache_seqlens if ctx.cache_seqlens is not None
                         else jnp.min(ctx.positions, axis=1))
                prev_valid = (pos_prev >= 0) & (pos_prev < start[:, None])
                k_all = jnp.concatenate(
                    [k_prev.astype(dt), k.astype(dt)], axis=1)
                v_all = jnp.concatenate(
                    [v_prev.astype(dt), v.astype(dt)], axis=1)
                k_pos = jnp.concatenate([pos_prev, ctx.positions], axis=1)
                k_valid = jnp.concatenate([prev_valid, valid], axis=1)
                o = attend_dense(
                    q.astype(dt), k_all, v_all,
                    q_positions=ctx.positions, k_positions=k_pos,
                    k_valid=k_valid, scale=self.sm_scale,
                    sliding_window=self.sliding_window,
                    logit_softcap=self.logit_softcap, sinks=sinks,
                )
        elif ctx.attn_mode == "paged":
            layer_state = ctx.cache[self.key]
            layer_state = paged_cache_update(
                layer_state, k, v, ctx.positions, ctx.block_tables,
                ctx.k_bits, ctx.v_bits, ctx.compand_a,
            )
            ctx.cache[self.key] = layer_state
            quant = bool(ctx.k_bits)
            total_lens = _total_lens(ctx, B, S)
            sp = ctx.extras.get("sp")
            if sp is not None:
                # sequence-parallel serving: pages sharded over the sp axis,
                # local attends merge via online-softmax stats (parallel/sp.py)
                from ..parallel.sp import sp_paged_attend

                mesh, axis = sp
                o = sp_paged_attend(
                    q.astype(jnp.float32), layer_state, ctx.block_tables,
                    ctx.positions, total_lens, mesh, axis,
                    scale=self.sm_scale, sliding_window=self.sliding_window,
                    logit_softcap=self.logit_softcap, sinks=sinks,
                    k_bits=ctx.k_bits, v_bits=ctx.v_bits,
                    compand_a=ctx.compand_a,
                ).astype(dt)
                backend = None
            else:
                backend = attn_backend(ctx.k_bits, ctx.v_bits)
            if backend is None:
                pass
            elif backend != "dense":
                from ..ops.flash_attention import flash_attention

                o = flash_attention(
                    q, layer_state, ctx.positions, total_lens,
                    block_tables=ctx.block_tables, sinks=sinks,
                    scale=self.sm_scale, sliding_window=self.sliding_window,
                    logit_softcap=self.logit_softcap,
                    k_bits=ctx.k_bits, v_bits=ctx.v_bits,
                    compand_a=ctx.compand_a,
                    interpret=(backend == "interpret"),
                ).astype(dt)
            else:
                o = attend_paged(
                    q.astype(dt),
                    None if quant else layer_state["k"],
                    None if quant else layer_state["v"],
                    ctx.block_tables, ctx.positions, total_lens,
                    scale=self.sm_scale, sliding_window=self.sliding_window,
                    logit_softcap=self.logit_softcap, sinks=sinks,
                    quant_state=layer_state if quant else None,
                    k_bits=ctx.k_bits, v_bits=ctx.v_bits,
                    compand_a=ctx.compand_a,
                )
        else:
            layer_state = ctx.cache[self.key]
            layer_state = linear_cache_update(
                layer_state, k, v, ctx.positions, ctx.k_bits, ctx.v_bits,
                ctx.compand_a,
            )
            ctx.cache[self.key] = layer_state
            T = (layer_state.get("k") if not ctx.k_bits
                 else layer_state["k_s"]).shape[1]
            total_lens = _total_lens(ctx, B, S)
            backend = attn_backend(ctx.k_bits, ctx.v_bits)
            if backend != "dense" and T % 8 == 0:
                from ..ops.flash_attention import flash_attention

                o = flash_attention(
                    q, layer_state, ctx.positions, total_lens,
                    block_tables=None, sinks=sinks,
                    scale=self.sm_scale, sliding_window=self.sliding_window,
                    logit_softcap=self.logit_softcap,
                    k_bits=ctx.k_bits, v_bits=ctx.v_bits,
                    compand_a=ctx.compand_a,
                    interpret=(backend == "interpret"),
                ).astype(dt)
            else:
                if ctx.k_bits:
                    from ..ops.kv_quant import quant_cache_fetch

                    k_all, v_all = quant_cache_fetch(
                        layer_state, ctx.k_bits, ctx.v_bits,
                        compand_a=ctx.compand_a, hk=self.num_kv_heads)
                else:
                    k_all, v_all = layer_state["k"], layer_state["v"]
                k_pos = jnp.broadcast_to(
                    jnp.arange(T, dtype=jnp.int32)[None], (B, T))
                o = attend_dense(
                    q.astype(dt), k_all.astype(dt), v_all.astype(dt),
                    q_positions=ctx.positions, k_positions=k_pos,
                    k_valid=None, scale=self.sm_scale,
                    sliding_window=self.sliding_window,
                    logit_softcap=self.logit_softcap, sinks=sinks,
                )

        if gate is not None:
            o = o * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(o.dtype)
        if self.g_proj is not None:
            g = self.g_proj.forward(x, params, ctx).astype(jnp.float32)
            if self.full_gate:
                g = g.reshape(B, S, self.num_q_heads, self.head_dim)
            else:
                g = g[..., None]  # headwise: broadcast over head_dim
            act = jax.nn.softplus if self.gate_softplus else jax.nn.sigmoid
            o = o * act(g).astype(o.dtype)
        o = o.reshape(B, S, self.num_q_heads * self.head_dim).astype(dt)
        y = self.o_proj.forward(o, params, ctx)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y
