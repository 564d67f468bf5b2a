"""DeepSeek-V4 hybrid sparse attention (DSA v4): sliding / CSA / HCA layers.

Feature reference: /root/reference/exllamav3/modules/dsv4.py (DSV4Compressor:95,
DSV4Attention:339) and modules/attention_fn/dsa_triton.py (dsa_attn:626,
dsa_indexer_scores:794). Semantics:

  * MQA with ONE shared 512-wide kv row per token that serves as both K and V
    (q per-head unweighted RMS + kv weighted RMS, then GPTJ rope on the
    TRAILING rope_head_dim dims). The attention output's rope slice is
    de-rotated at the query position afterwards (paper eq. 26).
  * every layer attends over a sliding window of raw rows (win 128);
    CSA/HCA layers additionally attend over a pool of compressed entries,
    one per compress_rate positions (4 for CSA, 128 for HCA).
  * the compressor pools each window of m projected rows with a per-position
    softmax gate (+ learned in-window bias `ape`), RMS-norms the pooled row
    and ropes it at the window start with the compress-theta table. CSA uses
    the overlapping Ca/Cb scheme (2m rows per window: the previous window's
    first half + this window's second half).
  * CSA layers select pool entries per query through the lightning indexer:
    its own overlapping compressor builds an index-key pool and
    score[t,e] = sum_h w[t,h]*relu(q_idx[t,h]·k_idx[e]) / sqrt(Di*Hi) picks
    the top index_topk entries (dense attention when the pool is smaller).
  * grouped output projection: heads split into o_groups groups, each through
    its own wo_a slice to o_lora_rank, concatenated into wo_b.

On TPU the pools/rings/buffers are functional cache arrays updated with
masked scatters inside the jitted step; the whole step is dense math the MXU
tiles (the reference needs Triton kernels + CUDA graphs). Cross-chunk
compressor bookkeeping (row buffer + Ca overlap) is carried per sequence
slot, so speculative rewind is not supported (the module is flagged
is_recurrent; the generator disables reuse/rewind like for GDN/Mamba).
"""
from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .norms import RMSNorm, rms_norm
from ..util.rope import _yarn_inv_freq
from ..constants import PAGE_SIZE

NEG_INF = -1e30


def dsv4_inv_freq(dim: int, base: float, rope_scaling: dict | None = None):
    """Yarn table when rope_scaling is present, plain table otherwise
    (reference util/rope.py yarn_inv_freq; attn_factor is always 1.0)."""
    if rope_scaling is None:
        return 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return _yarn_inv_freq(dim, base, rope_scaling)


def gptj_rope_trailing(x, inv_freq, positions, neg: bool = False):
    """Rotate the trailing 2*len(inv_freq) dims of x (..., S, H, D) GPTJ-style
    (interleaved pairs) at `positions` (..., S). neg=True de-rotates."""
    rd = 2 * inv_freq.shape[0]
    xf = x.astype(jnp.float32)
    keep, rot = xf[..., : x.shape[-1] - rd], xf[..., x.shape[-1] - rd:]
    ang = positions.astype(jnp.float32)[..., None] * inv_freq[None, :]
    s = jnp.sin(ang)[..., None, :]
    c = jnp.cos(ang)[..., None, :]
    if neg:
        s = -s
    x1, x2 = rot[..., 0::2], rot[..., 1::2]
    o1 = x1 * c - x2 * s
    o2 = x2 * c + x1 * s
    out = jnp.stack([o1, o2], axis=-1).reshape(rot.shape)
    return jnp.concatenate([keep, out], axis=-1).astype(x.dtype)


class DSV4Compressor:
    """Window compressor shared by HCA (width=head_dim, non-overlapping) and
    CSA / indexer (width=2*head_dim, overlapping Ca/Cb). Owns projection
    Linears, norm and the `ape` in-window bias; emit() is pure math over one
    chunk plus the carried row buffer. The buffer is POSITION-keyed (slot =
    pos %% buf_slots) so it self-heals under speculative rewind; the Ca
    overlap half is re-derived from it instead of being carried as a
    last-emitted-window snapshot (which a rewind would invalidate —
    the reference instead rewinds its ring state by cursor arithmetic)."""

    def __init__(self, attn, key: str, head_dim: int, compress_rate: int,
                 overlapping: bool, qmap: str | None):
        cfg = attn.config
        self.key = key
        self.head_dim = head_dim
        self.rope_dim = min(attn.rope_head_dim, head_dim)
        self.compress_rate = compress_rate
        self.overlapping = overlapping
        # row-buffer slots: the previous window + the m in-flight rows +
        # speculative headroom, so rejected draft rows never clobber a
        # confirmed row still needed by a future window emission or its Ca
        # overlap half (slot = pos % buf_slots)
        self.buf_slots = 2 * compress_rate + 32
        self.proj_width = 2 * head_dim if overlapping else head_dim
        self.wkv = Linear(cfg, f"{key}.wkv", attn.hidden_size, self.proj_width,
                          qmap=qmap)
        self.wgate = Linear(cfg, f"{key}.wgate", attn.hidden_size,
                            self.proj_width, qmap=qmap)
        self.norm = RMSNorm(cfg, f"{key}.norm", attn.rms_norm_eps, dim=head_dim)
        self.config = cfg

    def modules(self):
        return [self.wkv, self.wgate, self.norm]

    def load(self, params: dict) -> None:
        for mod in self.modules():
            mod.load(params)
        ape = self.config.stc.get_tensor(f"{self.key}.ape")
        params[self.key] = {"ape": jnp.asarray(ape.astype(np.float32))}

    def emit(self, params, x, ctx, p0, end, cbuf_kv, cbuf_gate):
        """One chunk of projections -> complete compressed windows.

        x (B,S,h); p0/end (B,) absolute [start, end) of the valid tokens.
        Returns (comp (B,E,hd) normed+roped, entry_ids (B,E), emit (B,E) bool,
        new_cbuf_kv, new_cbuf_gate); E = S//m + 1. Rows for windows e0-1 ..
        e0+E-1 are gathered from [chunk | position-keyed buffer]; the Ca
        overlap (window e-1's first half) falls out of the same gather.
        """
        m = self.compress_rate
        Rb = self.buf_slots
        hd = self.head_dim
        B, S, _ = x.shape
        E = S // m + 1
        ape = params[self.key]["ape"]

        rows_kv = self.wkv.forward(x, params, ctx).astype(jnp.float32)
        rows_gate = self.wgate.forward(x, params, ctx).astype(jnp.float32)

        e0 = p0 // m
        jj = jnp.arange(-1, E, dtype=jnp.int32)
        e_all = e0[:, None] + jj[None, :]                  # (B, E+1) windows
        e = e_all[:, 1:]                                   # (B, E) entry ids
        emit = (e + 1) * m <= end[:, None]

        ii = jnp.arange(m, dtype=jnp.int32)
        q = e_all[:, :, None] * m + ii[None, None, :]      # (B, E+1, m)
        t = q - p0[:, None, None]
        from_chunk = t >= 0
        tc = jnp.clip(t, 0, S - 1).reshape(B, -1)
        kv_c = jnp.take_along_axis(rows_kv, tc[..., None], axis=1) \
            .reshape(B, E + 1, m, self.proj_width)
        g_c = jnp.take_along_axis(rows_gate, tc[..., None], axis=1) \
            .reshape(B, E + 1, m, self.proj_width)
        # buffered rows live at slot pos % buf_slots
        bs_ = (jnp.maximum(q, 0) % Rb).reshape(B, -1)
        kv_b = jnp.take_along_axis(cbuf_kv, bs_[..., None], axis=1) \
            .reshape(B, E + 1, m, self.proj_width)
        g_b = jnp.take_along_axis(cbuf_gate, bs_[..., None], axis=1) \
            .reshape(B, E + 1, m, self.proj_width)
        kvw_all = jnp.where(from_chunk[..., None], kv_c, kv_b)
        gw_all = jnp.where(from_chunk[..., None], g_c, g_b) + ape
        kvw, gw = kvw_all[:, 1:], gw_all[:, 1:]

        if self.overlapping:
            # window e: [window e-1's first half | this window's second half]
            ok_prev = (e_all[:, :-1] >= 0)[..., None, None]
            prev_kv = jnp.where(ok_prev, kvw_all[:, :-1, :, :hd], 0.0)
            prev_g = jnp.where(ok_prev, gw_all[:, :-1, :, :hd], NEG_INF)
            kv2 = jnp.concatenate([prev_kv, kvw[..., hd:]], axis=2)
            g2 = jnp.concatenate([prev_g, gw[..., hd:]], axis=2)
        else:
            kv2, g2 = kvw, gw

        w = jax.nn.softmax(g2, axis=2)
        comp = jnp.sum(kv2 * w, axis=2)                    # (B, E, hd)
        comp = rms_norm(comp, params[self.norm.key]["weight"], self.norm.eps)
        comp = gptj_rope_trailing(
            comp[:, :, None, :], self.inv_freq, e * m)[:, :, 0, :]

        # carry: buffer slot i <- projections of the last valid pos ≡ i
        # (mod buf_slots)
        last = end - 1
        jj_b = jnp.arange(Rb, dtype=jnp.int32)
        q_i = last[:, None] - ((last[:, None] - jj_b[None, :]) % Rb)  # (B, Rb)
        use = q_i >= p0[:, None]
        tb = jnp.clip(q_i - p0[:, None], 0, S - 1)
        nb_kv = jnp.where(use[..., None],
                          jnp.take_along_axis(rows_kv, tb[..., None], axis=1),
                          cbuf_kv)
        nb_gate = jnp.where(use[..., None],
                            jnp.take_along_axis(rows_gate, tb[..., None], axis=1),
                            cbuf_gate)

        return comp, e, emit, nb_kv, nb_gate


class DSV4Attention(Module):
    is_kv_cache_user = True
    # cross-chunk compressor state advances destructively: stable slots, no
    # prefix reuse, no speculative rewind (like GDN/Mamba2)
    is_recurrent = True

    def __init__(self, config, key: str, layer_idx: int, layer_type: str,
                 hidden_size: int, num_q_heads: int, head_dim: int,
                 rope_head_dim: int, q_lora_rank: int, o_groups: int,
                 o_lora_rank: int, sliding_window: int,
                 compress_rate: int | None = None,
                 index_n_heads: int | None = None,
                 index_head_dim: int | None = None,
                 index_topk: int | None = None,
                 rope_theta: float = 10000.0,
                 compress_rope_theta: float = 160000.0,
                 rope_scaling: dict | None = None,
                 rms_norm_eps: float = 1e-6,
                 qmap: str | None = None, out_dtype=None):
        super().__init__(config, key)
        assert layer_type in ("sliding", "csa", "hca")
        self.layer_idx = layer_idx
        self.layer_type = layer_type
        self.hidden_size = hidden_size
        self.num_q_heads = num_q_heads
        self.num_kv_heads = 1  # shared-KV MQA
        self.head_dim = head_dim
        self.rope_head_dim = rope_head_dim
        self.o_groups = o_groups
        self.o_lora_rank = o_lora_rank
        self.sliding_window = sliding_window
        self.compress_rate = compress_rate
        self.index_n_heads = index_n_heads
        self.index_head_dim = index_head_dim
        self.index_topk = index_topk
        self.rms_norm_eps = rms_norm_eps
        self.out_dtype = out_dtype
        self.sm_scale = head_dim ** -0.5

        self.inv_freq_main = jnp.asarray(
            dsv4_inv_freq(rope_head_dim, rope_theta), jnp.float32)
        self.inv_freq_compress = jnp.asarray(
            dsv4_inv_freq(rope_head_dim, compress_rope_theta, rope_scaling),
            jnp.float32)

        self.q_a = Linear(config, f"{key}.wq_a", hidden_size, q_lora_rank,
                          qmap=qmap)
        self.q_norm = RMSNorm(config, f"{key}.q_norm", rms_norm_eps,
                              dim=q_lora_rank)
        self.q_b = Linear(config, f"{key}.wq_b", q_lora_rank,
                          num_q_heads * head_dim, qmap=qmap)
        self.wkv = Linear(config, f"{key}.wkv", hidden_size, head_dim,
                          qmap=qmap)
        self.kv_norm = RMSNorm(config, f"{key}.kv_norm", rms_norm_eps,
                               dim=head_dim)
        gw = num_q_heads * head_dim // o_groups
        self.wo_a = [
            Linear(config, f"{key}.wo_a.slice.{g}", gw, o_lora_rank,
                   fkey=f"{key}.wo_a",
                   frange=(g * o_lora_rank, (g + 1) * o_lora_rank),
                   qmap=qmap)
            for g in range(o_groups)
        ]
        self.wo_b = Linear(config, f"{key}.wo_b", o_groups * o_lora_rank,
                           hidden_size, qmap=qmap)
        self.compressor = None
        self.indexer = None
        self.idx_wq_b = None
        self.idx_weights = None
        if layer_type in ("csa", "hca"):
            self.compressor = DSV4Compressor(
                self, f"{key}.compressor", head_dim, compress_rate,
                overlapping=(layer_type == "csa"), qmap=qmap)
            self.compressor.inv_freq = self.inv_freq_compress
        if layer_type == "csa":
            self.indexer = DSV4Compressor(
                self, f"{key}.indexer.compressor", index_head_dim,
                compress_rate, overlapping=True, qmap=qmap)
            self.indexer.inv_freq = self.inv_freq_compress
            self.idx_wq_b = Linear(config, f"{key}.indexer.wq_b", q_lora_rank,
                                   index_n_heads * index_head_dim, qmap=qmap)
            self.idx_weights = Linear(config, f"{key}.indexer.weights_proj",
                                      hidden_size, index_n_heads)
        self.modules = [m for m in (
            self.q_a, self.q_norm, self.q_b, self.wkv, self.kv_norm,
            *self.wo_a, self.wo_b, self.idx_wq_b, self.idx_weights)
            if m is not None]
        for comp in (self.compressor, self.indexer):
            if comp is not None:
                self.modules += comp.modules()

    # -- loading ---------------------------------------------------------------

    def load(self, params: dict) -> None:
        super().load(params)
        sink = self.config.stc.get_tensor(f"{self.key}.attn_sink",
                                          optional=True)
        params[self.key] = {
            "sinks": jnp.asarray(sink.astype(np.float32)) if sink is not None
            else jnp.zeros((self.num_q_heads,), jnp.float32)
        }
        for comp in (self.compressor, self.indexer):
            if comp is not None:
                comp.load(params)

    # -- cache -----------------------------------------------------------------

    def new_cache_layer(self, spec) -> dict:
        """Per-slot ring + compressor carry, plus page-aliased pools ("pg_*"
        arrays are page-indexed, everything else is slot-indexed; the
        generator's recurrent stash/clear skips pg_*)."""
        n = spec.recurrent_slots or (
            spec.batch_size if spec.layout == "linear" else 33)
        # window slots + speculative headroom: slot = pos %% R, so draft rows
        # written then rejected must not alias a still-live window position
        R = self.sliding_window + 16
        D = self.head_dim
        layer = {
            "kv": jnp.zeros((n, R, D), jnp.bfloat16),
            "pos": jnp.full((n, R), -1, jnp.int32),
        }
        if self.compressor is None:
            return layer
        m = self.compress_rate
        Rb = self.compressor.buf_slots
        pw = self.compressor.proj_width
        if spec.layout == "linear":
            cap = max(spec.max_len // m, 1)
            layer["pg_pool"] = jnp.zeros((n, cap, D), jnp.bfloat16)
        else:
            epp = PAGE_SIZE // m
            layer["pg_pool"] = jnp.zeros((spec.num_pages, epp, D),
                                         jnp.bfloat16)
        layer["cb_kv"] = jnp.zeros((n, Rb, pw), jnp.float32)
        layer["cb_gate"] = jnp.zeros((n, Rb, pw), jnp.float32)
        if self.layer_type == "csa":
            hd_i = self.index_head_dim
            if spec.layout == "linear":
                cap = max(spec.max_len // m, 1)
                layer["pg_ipool"] = jnp.zeros((n, cap, hd_i), jnp.bfloat16)
            else:
                epp = PAGE_SIZE // m
                layer["pg_ipool"] = jnp.zeros((spec.num_pages, epp, hd_i),
                                              jnp.bfloat16)
            ib = self.indexer.buf_slots
            layer["icb_kv"] = jnp.zeros((n, ib, 2 * hd_i), jnp.float32)
            layer["icb_gate"] = jnp.zeros((n, ib, 2 * hd_i), jnp.float32)
        return layer

    # -- forward ---------------------------------------------------------------

    def _slots(self, ctx, B):
        if ctx.state_slots is not None:
            return ctx.state_slots
        return jnp.arange(B, dtype=jnp.int32)

    def _pool_scatter(self, pool, comp, e, emit, ctx):
        """Scatter emitted entries into the pool (paged via the token block
        table, epp entries per page; linear by entry id)."""
        m = self.compress_rate
        if pool.ndim == 3 and ctx.attn_mode == "paged":
            epp = pool.shape[1]
            page_slot = e // epp
            rows = jnp.take_along_axis(ctx.block_tables, page_slot, axis=1)
            rows = jnp.where(emit, rows, pool.shape[0])  # OOB -> dropped
            off = e % epp
            return pool.at[rows, off].set(comp.astype(pool.dtype),
                                          mode="drop")
        B = comp.shape[0]
        slots = self._slots(ctx, B)
        eh = jnp.where(emit, e, pool.shape[1])
        return pool.at[slots[:, None], eh].set(comp.astype(pool.dtype),
                                               mode="drop")

    def _pool_gather(self, pool, ctx, B):
        """-> (entries (B, T, D), entry base 0). Paged: every page of the
        row's block table; linear: the slot's whole pool."""
        if ctx.attn_mode == "paged":
            g = pool[ctx.block_tables]  # (B, MP, epp, D)
            return g.reshape(B, -1, pool.shape[-1])
        slots = self._slots(ctx, B)
        return pool[slots]

    def forward(self, x, params: dict, ctx: ForwardCtx):
        B, S, _ = x.shape
        dt = x.dtype
        H, D, rd = self.num_q_heads, self.head_dim, self.rope_head_dim
        W = self.sliding_window
        m = self.compress_rate or 1

        positions = ctx.positions
        if ctx.cache is not None and ctx.cache_seqlens is not None:
            p0 = ctx.cache_seqlens
        else:
            p0 = jnp.zeros((B,), jnp.int32)
        valid = positions == p0[:, None] + jnp.arange(S, dtype=jnp.int32)
        end = p0 + jnp.sum(valid.astype(jnp.int32), axis=1)

        # -- projections (reference _project_qkv:896) ---------------------------
        q_res = self.q_norm.forward(self.q_a.forward(x, params, ctx), params, ctx)
        q = self.q_b.forward(q_res, params, ctx).reshape(B, S, H, D)
        q = rms_norm(q, jnp.ones((D,), jnp.float32), self.rms_norm_eps)
        kv = self.wkv.forward(x, params, ctx).reshape(B, S, D)
        kv = rms_norm(kv, params[self.kv_norm.key]["weight"], self.rms_norm_eps)
        table = self.inv_freq_main if self.layer_type == "sliding" \
            else self.inv_freq_compress
        q = gptj_rope_trailing(q, table, positions)
        kv = gptj_rope_trailing(kv[:, :, None, :], table, positions)[:, :, 0]

        layer = dict(ctx.cache[self.key]) if ctx.cache is not None else None
        R = layer["kv"].shape[1] if layer is not None else W
        slots = self._slots(ctx, B)

        # decode-step kernel route: window ring + (HCA) compressor pool via
        # the Pallas flash kernels with online-softmax stat merging. CSA
        # needs the indexer's per-query top-k mask -> dense path.
        use_kernel = (S == 1 and layer is not None
                      and ctx.attn_mode == "paged")
        if use_kernel:
            from ..util.env import attn_backend
            from ..ops.flash_attention import ring_kernel_fits

            kb = attn_backend()
            use_kernel = kb != "dense" and ring_kernel_fits(R, 1, D)

        # -- compressor pools (before attention: late queries in the chunk can
        # see entries emitted earlier in the same chunk) ------------------------
        pool_entries = ipool_entries = None
        if self.compressor is not None:
            if layer is not None:
                cb_kv, cb_g = layer["cb_kv"][slots], layer["cb_gate"][slots]
            else:
                pw = self.compressor.proj_width
                cb_kv = cb_g = jnp.zeros((B, self.compressor.buf_slots, pw),
                                         jnp.float32)
            comp, e, emit, nb_kv, nb_g = \
                self.compressor.emit(params, x, ctx, p0, end, cb_kv, cb_g)
            if layer is not None:
                layer["pg_pool"] = self._pool_scatter(
                    layer["pg_pool"], comp, e, emit, ctx)
                layer["cb_kv"] = layer["cb_kv"].at[slots].set(nb_kv)
                layer["cb_gate"] = layer["cb_gate"].at[slots].set(nb_g)
                if not use_kernel:  # kernels stream pool pages directly
                    pool_entries = self._pool_gather(layer["pg_pool"], ctx, B)
            else:
                # mimic the cached path's bf16 pool storage so the stateless
                # (conversion/eval) pass rounds identically
                pool_entries = jnp.where(emit[..., None], comp, 0.0) \
                    .astype(jnp.bfloat16)

        if self.indexer is not None:
            if layer is not None:
                icomp, ie, iemit, inb_kv, inb_g = self.indexer.emit(
                    params, x, ctx, p0, end,
                    layer["icb_kv"][slots], layer["icb_gate"][slots])
                layer["pg_ipool"] = self._pool_scatter(
                    layer["pg_ipool"], icomp, ie, iemit, ctx)
                layer["icb_kv"] = layer["icb_kv"].at[slots].set(inb_kv)
                layer["icb_gate"] = layer["icb_gate"].at[slots].set(inb_g)
                ipool_entries = self._pool_gather(layer["pg_ipool"], ctx, B)
            else:
                hd_i = self.index_head_dim
                z = jnp.zeros((B, self.indexer.buf_slots, 2 * hd_i),
                              jnp.float32)
                icomp, ie, iemit, *_ = self.indexer.emit(
                    params, x, ctx, p0, end, z, z)
                ipool_entries = jnp.where(iemit[..., None], icomp, 0.0) \
                    .astype(jnp.bfloat16)

        if use_kernel:
            o = self._decode_kernel(q, kv, layer, ctx, slots, positions,
                                    end, params, kb, x=x, q_res=q_res,
                                    ipool_entries=ipool_entries)
            ctx.cache[self.key] = layer
            o = gptj_rope_trailing(o, table, positions, neg=True)
            return self._project_out(o, x, params, ctx, dt)

        # -- window phase keys: [prior ring | chunk] ----------------------------
        qp = positions  # (B, S)
        if layer is not None:
            ring_kv = layer["kv"][slots].astype(jnp.float32)   # (B, R, D)
            ring_pos = layer["pos"][slots]                     # (B, R)
            # only rows written BEFORE this chunk count (stale speculative
            # slots may alias chunk positions)
            ring_ok = (ring_pos >= 0) & (ring_pos < p0[:, None])
            win_k = jnp.concatenate([ring_kv, kv.astype(jnp.float32)], axis=1)
            win_pos = jnp.concatenate(
                [jnp.where(ring_ok, ring_pos, -W - 1), positions], axis=1)
            win_ok = jnp.concatenate([ring_ok, valid], axis=1)
        else:
            win_k = kv.astype(jnp.float32)
            win_pos = positions
            win_ok = valid
        # key-side context is fixed across query rows; the per-row work maps
        # over query blocks so the (B, H, S, T) score tensors never
        # materialize for a full prefill chunk at long context (peak memory
        # is (B, H, QB, T) per block — EXL3_TPU_DSV4_QBLOCK, default 256)
        if pool_entries is not None:
            T = pool_entries.shape[1]
            if layer is None:
                ent_ids = e  # (B, E) entry ids from the chunk
            else:
                ent_ids = jnp.broadcast_to(
                    jnp.arange(T, dtype=jnp.int32)[None], (B, T))
            pf = pool_entries.astype(jnp.float32)
            vals = [win_k, pf]
        else:
            ent_ids = pf = None
            vals = [win_k]
        sinks = params[self.key]["sinks"]                     # (H,)
        v_all = jnp.concatenate(vals, axis=1)

        # CSA S>1 gather path (reference dsa_triton.py:626-848 kernels the
        # whole selected-entry attention): per-query exact top-K entries
        # gather compactly, so pool score/value tensors are (B, QB, K) —
        # bounded by the selection width, independent of context length —
        # instead of (B, H, QB, E_pool). Exact-k selection matches the
        # decode kernel (differs from the dense >=threshold rule only on
        # exact score ties). EXL3_TPU_DSV4_CSA=dense forces the dense path.
        T_pool = pool_entries.shape[1] if pool_entries is not None else 0
        K_sel = min(self.index_topk, T_pool) if T_pool else 0
        csa_gather = (self.indexer is not None and S > 1 and K_sel
                      and T_pool > 2 * K_sel
                      and os.environ.get("EXL3_TPU_DSV4_CSA", "auto")
                      != "dense")

        def _attend_rows(qf_b, qp_b, x_b, qres_b):
            """(B, QB, ...) query rows -> (B, QB, H, D) attended output."""
            QB = qf_b.shape[1]
            dlt = qp_b[:, :, None] - win_pos[:, None, :]
            mask_win = win_ok[:, None, :] & (dlt >= 0) & (dlt < W)
            s_win = jnp.einsum("bshd,btd->bhst", qf_b, win_k) * self.sm_scale
            s_win = jnp.where(mask_win[:, None], s_win, NEG_INF)
            parts = [s_win]
            ent_sel = None
            if pool_entries is not None:
                bound = (qp_b + 1) // m                       # (B, QB)
                mask_pool = ent_ids[:, None, :] < bound[:, :, None]
                if layer is None:
                    mask_pool &= emit[:, None, :]
                if csa_gather:
                    iscores = self._indexer_scores(
                        x_b, qres_b, ipool_entries, qp_b, params, ctx,
                        mask_pool)
                    topv, topi = jax.lax.top_k(iscores, K_sel)  # (B, QB, K)
                    sel_ok = topv > NEG_INF / 2
                    ent_sel = pf[jnp.arange(B)[:, None, None], topi]
                    s_pool = jnp.einsum("bqhd,bqkd->bhqk", qf_b, ent_sel) \
                        * self.sm_scale
                    s_pool = jnp.where(sel_ok[:, None], s_pool, NEG_INF)
                    parts.append(s_pool)
                else:
                    s_pool = jnp.einsum("bshd,btd->bhst", qf_b, pf) \
                        * self.sm_scale
                    if self.indexer is not None:
                        iscores = self._indexer_scores(
                            x_b, qres_b, ipool_entries, qp_b, params, ctx,
                            mask_pool)
                        T_all = iscores.shape[-1]
                        k = min(self.index_topk, T_all)
                        # exact-k selection by scattered top-k indices —
                        # matches the reference's dsa_topk kernel, the S=1
                        # decode kernel, and the gather path (a >=threshold
                        # rule would keep extra entries on exact score
                        # ties, which relu-ed indexer scores hit often at 0)
                        topv, topi = jax.lax.top_k(iscores, k)
                        mask_k = jnp.zeros(iscores.shape, jnp.bool_).at[
                            jnp.arange(B)[:, None, None],
                            jnp.arange(QB)[None, :, None], topi].set(
                            topv > NEG_INF / 2)
                        mask_pool &= mask_k
                    s_pool = jnp.where(mask_pool[:, None], s_pool, NEG_INF)
                    parts.append(s_pool)
            scores = jnp.concatenate(parts, axis=-1)
            sink_col = jnp.broadcast_to(sinks[None, :, None, None],
                                        (B, H, QB, 1))
            scores = jnp.concatenate([scores, sink_col], axis=-1)
            p = jax.nn.softmax(scores, axis=-1)[..., :-1]
            if ent_sel is not None:
                t_win = win_k.shape[1]
                out = jnp.einsum("bhst,btd->bshd", p[..., :t_win], win_k)
                out += jnp.einsum("bhqk,bqkd->bqhd", p[..., t_win:], ent_sel)
                return out
            return jnp.einsum("bhst,btd->bshd", p, v_all)

        qf = q.astype(jnp.float32)
        QB = int(os.environ.get("EXL3_TPU_DSV4_QBLOCK", "256"))
        if S > QB:
            pad = (-S) % QB
            qf_p = jnp.pad(qf, ((0, 0), (0, pad), (0, 0), (0, 0)))
            qp_p = jnp.pad(qp, ((0, 0), (0, pad)), constant_values=-1)
            x_p = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            qres_p = jnp.pad(q_res, ((0, 0), (0, pad), (0, 0)))
            nb = (S + pad) // QB

            def to_blocks(a):
                return jnp.moveaxis(
                    a.reshape(a.shape[0], nb, QB, *a.shape[2:]), 1, 0)

            o = jax.lax.map(
                lambda t: _attend_rows(*t),
                (to_blocks(qf_p), to_blocks(qp_p), to_blocks(x_p),
                 to_blocks(qres_p)))
            o = jnp.moveaxis(o, 0, 1).reshape(B, S + pad, H, D)[:, :S]
        else:
            o = _attend_rows(qf, qp, x, q_res)

        # eq. 26 output de-rotation at the query position
        o = gptj_rope_trailing(o, table, positions, neg=True)

        # -- ring write (keep-last-W; stale overwrite by position aliasing) -----
        if layer is not None:
            # keep the last R VALID tokens (the chunk may be padded past the
            # valid range by prefill buckets)
            keep = positions >= (end - R)[:, None]
            wslot = positions % R
            wslot = jnp.where(keep & valid, wslot, R)          # OOB -> drop
            bidx = slots[:, None]
            layer["kv"] = layer["kv"].at[bidx, wslot].set(
                kv.astype(layer["kv"].dtype), mode="drop")
            layer["pos"] = layer["pos"].at[bidx, wslot].set(
                positions, mode="drop")
            ctx.cache[self.key] = layer

        # -- grouped output projection ------------------------------------------
        return self._project_out(o, x, params, ctx, dt)

    def _project_out(self, o, x, params, ctx, dt):
        B, S, H, D = o.shape
        G = self.o_groups
        hpg = H // G
        og = o.reshape(B, S, G, hpg * D).astype(dt)
        mids = [self.wo_a[g].forward(og[:, :, g], params, ctx)
                for g in range(G)]
        mid = jnp.concatenate(mids, axis=-1)
        y = self.wo_b.forward(mid, params, ctx)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y

    def _indexer_scores(self, x, q_res, ipool_entries, positions, params,
                        ctx, mask_pool):
        """Lightning indexer scores (reference dsa_triton.py
        _dsa_indexer_kernel:497): score[t,e] = sum_h w[t,h] *
        relu(q_idx[t,h] . k_idx[e]) / sqrt(Di*Hi); invisible entries
        -inf."""
        B, S, _ = x.shape
        Hi, Di = self.index_n_heads, self.index_head_dim
        q_idx = self.idx_wq_b.forward(q_res, params, ctx) \
            .reshape(B, S, Hi, Di)
        q_idx = gptj_rope_trailing(q_idx, self.inv_freq_compress, positions)
        wts = self.idx_weights.forward(x, params, ctx).astype(jnp.float32)
        ipf = ipool_entries.astype(jnp.float32)
        dots = jnp.einsum("bshd,btd->bhst", q_idx.astype(jnp.float32), ipf)
        iscores = jnp.einsum("bhst,bsh->bst", jax.nn.relu(dots), wts) \
            * (Di ** -0.5) * (Hi ** -0.5)
        return jnp.where(mask_pool, iscores, -jnp.inf)

    def _decode_kernel(self, q, kv, layer, ctx, slots, positions, end,
                       params, backend, x=None, q_res=None,
                       ipool_entries=None):
        """S=1 decode via Pallas kernels: the window ring attends in place
        (slot-indexed blocks) and HCA pools stream their pages through the
        paged kernel (entry ids as positions: entry e visible iff
        e < (qpos+1)//m); the partial online-softmax stats merge with the
        sink logit in one jnp epilogue — numerically the same single
        softmax over [window ++ pool ++ sink] as the dense path."""
        from ..ops.flash_attention import (flash_attention,
                                           flash_ring_attention)

        B = q.shape[0]
        H, D = self.num_q_heads, self.head_dim
        interp = backend == "interpret"

        # ring write FIRST (slot = pos % R); stale speculative slots carry
        # future positions and self-mask inside the kernel
        R = layer["kv"].shape[1]
        bidx = slots[:, None]
        wslot = positions % R
        layer["kv"] = layer["kv"].at[bidx, wslot].set(
            kv.astype(layer["kv"].dtype), mode="drop")
        layer["pos"] = layer["pos"].at[bidx, wslot].set(
            positions, mode="drop")
        ring4 = layer["kv"][:, :, None, :]                 # (n, R, 1, D)
        acc, m, l = flash_ring_attention(
            q, ring4, ring4, layer["pos"], slots, positions,
            scale=self.sm_scale, sliding_window=self.sliding_window,
            return_stats=True, interpret=interp)
        parts = [(acc, m, l)]

        if self.compressor is not None and self.indexer is None:
            # HCA: every visible entry attends (entry ids as positions)
            mrate = self.compress_rate
            pool4 = layer["pg_pool"][:, :, None, :]        # (P, epp, 1, D)
            qpos_pool = (positions + 1) // mrate - 1
            total_pool = jnp.maximum(end // mrate, 0).astype(jnp.int32)
            parts.append(flash_attention(
                q, {"kv": pool4}, qpos_pool, total_pool,
                block_tables=ctx.block_tables, scale=self.sm_scale,
                latent=D, return_stats=True, interpret=interp))
        elif self.compressor is not None:
            # CSA: lightning-indexer top-k (exact-k, matching the
            # reference's dsa_topk kernel; the dense path's >=threshold rule
            # differs only on exact score ties), then the SELECTED entries
            # gather compactly and attend through the linear-layout kernel —
            # the (B, H, S, E_pool) score tensor of the dense path never
            # materializes
            mrate = self.compress_rate
            epp = layer["pg_pool"].shape[1]
            E = ipool_entries.shape[1]
            ent = jnp.arange(E, dtype=jnp.int32)[None]
            vis = ent < (positions + 1) // mrate           # (B, E)
            isc = self._indexer_scores(
                x, q_res, ipool_entries, positions, params, ctx,
                vis[:, None, :])[:, 0]                     # (B, E)
            K = min(self.index_topk, E)
            top_idx = jax.lax.top_k(isc, K)[1]             # (B, K)
            vcount = jnp.minimum(jnp.sum(vis, axis=1), K).astype(jnp.int32)
            page = jnp.take_along_axis(ctx.block_tables, top_idx // epp,
                                       axis=1)
            ksel = layer["pg_pool"][page, top_idx % epp]   # (B, K, D)
            Kp = ((K + 7) // 8) * 8
            if Kp != K:
                ksel = jnp.pad(ksel, ((0, 0), (0, Kp - K), (0, 0)))
            # fictional positions 0..K-1 with the query at vcount-1: exactly
            # the first vcount (valid, score-sorted) entries attend
            parts.append(flash_attention(
                q, {"kv": ksel[:, :, None, :]},
                (vcount - 1)[:, None], vcount,
                scale=self.sm_scale, latent=D, return_stats=True,
                interpret=interp))

        sk = params[self.key]["sinks"][None, None, :]      # (1, 1, H)
        mg = sk
        for _, mp, _ in parts:
            mg = jnp.maximum(mg, mp)
        lg = jnp.exp(sk - mg)
        acc_g = 0.0
        for ap, mp, lp in parts:
            c = jnp.where(mp <= NEG_INF / 2, 0.0, jnp.exp(mp - mg))
            lg = lg + lp * c
            acc_g = acc_g + ap * c[..., None]
        return acc_g / jnp.maximum(lg, 1e-30)[..., None]   # (B, 1, H, D)


class DSparkAttention(DSV4Attention):
    """Compressor-less DSV4 attention with DSpark draft semantics
    (reference modules/arch_specific/dspark.py DSparkAttention:51): a paged
    main-kv layer instead of the recurrent ring, rows written from the
    trunk's projected tap states, and a block-parallel NON-causal forward —
    every draft-block query sees [the last <=window main-kv rows ++ the
    whole block] in one softmax with sinks, eq. 26 de-rotation and the
    grouped o_proj."""

    is_recurrent = False

    def new_cache_layer(self, spec) -> dict:
        from ..constants import PAGE_SIZE

        D = self.head_dim
        if spec.layout == "linear":
            return {"mkv": jnp.zeros((spec.batch_size, spec.max_len, D),
                                     jnp.bfloat16)}
        return {"mkv": jnp.zeros((spec.num_pages, PAGE_SIZE, D),
                                 jnp.bfloat16)}

    def update_kv_rows(self, main_x, params, ctx):
        """Project + norm + rope main-kv rows at ctx.positions and write
        them into the paged layer through the block table."""
        from ..constants import PAGE_SIZE

        B, S, _ = main_x.shape
        D = self.head_dim
        kv = self.wkv.forward(main_x, params, ctx).reshape(B, S, D)
        kv = rms_norm(kv, params[self.kv_norm.key]["weight"],
                      self.rms_norm_eps)
        kv = gptj_rope_trailing(kv[:, :, None, :], self.inv_freq_main,
                                ctx.positions)[:, :, 0]
        layer = ctx.cache[self.key]
        page_slot = ctx.positions // PAGE_SIZE
        rows = jnp.take_along_axis(ctx.block_tables, page_slot, axis=1)
        cols = ctx.positions % PAGE_SIZE
        mkv = layer["mkv"].at[rows, cols].set(kv.astype(layer["mkv"].dtype),
                                              mode="drop")
        ctx.cache[self.key] = {"mkv": mkv}

    def forward(self, x, params: dict, ctx: ForwardCtx):
        """Draft-block forward: x (B, block, h); positions = p0 + j."""
        B, S, _ = x.shape
        dt = x.dtype
        H, D, rd = self.num_q_heads, self.head_dim, self.rope_head_dim
        W = self.sliding_window
        positions = ctx.positions
        p0 = positions[:, 0]

        q_res = self.q_norm.forward(self.q_a.forward(x, params, ctx),
                                    params, ctx)
        q = self.q_b.forward(q_res, params, ctx).reshape(B, S, H, D)
        q = rms_norm(q, jnp.ones((D,), jnp.float32), self.rms_norm_eps)
        kv = self.wkv.forward(x, params, ctx).reshape(B, S, D)
        kv = rms_norm(kv, params[self.kv_norm.key]["weight"],
                      self.rms_norm_eps)
        q = gptj_rope_trailing(q, self.inv_freq_main, positions)
        kv = gptj_rope_trailing(kv[:, :, None, :], self.inv_freq_main,
                                positions)[:, :, 0]

        layer = ctx.cache[self.key]
        mkv = layer["mkv"][ctx.block_tables]          # (B, MP, PAGE, D)
        T = mkv.shape[1] * mkv.shape[2]
        mkv = mkv.reshape(B, T, D).astype(jnp.float32)
        mpos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        # history: the last min(W, p0) rows; block part fully visible
        ok_hist = (mpos < p0[:, None]) & (mpos >= p0[:, None] - W)

        qf = q.astype(jnp.float32)
        s_hist = jnp.einsum("bshd,btd->bhst", qf, mkv) * self.sm_scale
        s_hist = jnp.where(ok_hist[:, None, None], s_hist, NEG_INF)
        s_blk = jnp.einsum("bshd,btd->bhst", qf,
                           kv.astype(jnp.float32)) * self.sm_scale
        sinks = params[self.key]["sinks"]
        scores = jnp.concatenate([
            s_hist, s_blk,
            jnp.broadcast_to(sinks[None, :, None, None], (B, H, S, 1)),
        ], axis=-1)
        p = jax.nn.softmax(scores, axis=-1)[..., :-1]
        v_all = jnp.concatenate([mkv, kv.astype(jnp.float32)], axis=1)
        o = jnp.einsum("bhst,btd->bshd", p, v_all)
        o = gptj_rope_trailing(o, self.inv_freq_main, positions, neg=True)

        G = self.o_groups
        hpg = H // G
        og = o.reshape(B, S, G, hpg * D).astype(dt)
        mid = jnp.concatenate(
            [self.wo_a[g].forward(og[:, :, g], params, ctx)
             for g in range(G)], axis=-1)
        y = self.wo_b.forward(mid, params, ctx)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y
