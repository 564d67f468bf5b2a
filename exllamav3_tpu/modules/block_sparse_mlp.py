"""Block-sparse (mixture-of-experts) MLP.

Feature reference: /root/reference/exllamav3/modules/block_sparse_mlp.py
(BlockSparseMLP:307, routing fns :51-292, EP via expert-dim splits :1556-1590).

TPU-native design: expert weights are STACKED tensors (E, in, out) so one
einsum computes every expert's contribution; routing weights mask/scale the
results. With the expert dim sharded over the mesh ("ep" = the tp axis), each
device touches only its local experts and a psum combines — the GSPMD
equivalent of the reference's channel_unit="experts" allocation. Exact
routing semantics are preserved (same top-k selection and normalization);
non-selected experts contribute zero. A Pallas grouped-GEMM (sort tokens by
expert) replaces the dense-all compute for large batches in a later round.

Routing variants: "std" (softmax -> topk -> renorm; Mixtral), "std_norm"
(topk of softmax, optional renorm; Qwen3-MoE norm_topk_prob), "sigmoid"
(gpt-oss style), "ds3" (DeepSeek-V3 noaux_tc: sigmoid scores + correction
bias choose experts group-limited, original scores weight them, scaled by
routed_scaling_factor; reference block_sparse_mlp.py routing_ds3), and
"group_greedy" (DeepSeek-V2 softmax group-limited greedy).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .mlp import ACT2FN
from ..loader.safetensors import bf16_to_f32 as _bf16_f32
from ..ops.common import einsum_f32


class BlockSparseMLP(Module):
    def __init__(
        self,
        config,
        key: str,
        hidden_size: int,
        intermediate_size: int,
        num_experts: int,
        num_experts_per_tok: int,
        key_up: str = "up_proj",
        key_gate: str = "gate_proj",
        key_down: str = "down_proj",
        key_routing_gate: str = "gate",
        key_shared_gate: str | None = None,
        key_expert: str = "experts.{expert_idx}",
        key_gate_up_split: str | None = None,  # gpt-oss stacked dense tensors
        key_down_split: str | None = None,
        gate_up_interleaved: bool = False,
        # selection-bias tensor key relative to the MLP key; None = the
        # default <router>.e_score_correction_bias
        key_e_score_bias: str | None = None,
        qmap: str | None = None,
        activation: str = "silu",
        act_limit: float = 7.0,
        routing: str = "std",
        # token-id hash routing table (DeepSeek-V4 bootstrap layers): key of a
        # (vocab, top_k) int tensor relative to the MLP key
        key_tid2eid: str | None = None,
        act_clamp: float = 0.0,
        norm_topk_prob: bool = True,
        shared_experts: Module | None = None,
        # Gemma4 MoE block (reference block_sparse_mlp.py:343-358,:1106):
        # the routed side reads the RESIDUAL stream (pre-mlp-norm), with its
        # own router/pre/post norms and a learned per-expert weight scale;
        # the shared (dense) side keeps the normed input + its own post norm
        shared_experts_post_norm: Module | None = None,
        router_pre_norm: Module | None = None,
        routed_pre_norm: Module | None = None,
        routed_post_norm: Module | None = None,
        key_per_expert_scale: str | None = None,
        alt_residual_channel: bool = False,
        n_group: int = 1,
        topk_group: int = 1,
        routed_scaling_factor: float = 1.0,
        gated: bool = True,  # False: non-gated experts (up/act/down; NemotronH)
        out_dtype=None,
    ):
        super().__init__(config, key, qmap)
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_experts = num_experts
        self.top_k = num_experts_per_tok
        self.activation = activation
        self.routing = routing
        self.norm_topk_prob = norm_topk_prob
        self.n_group = n_group
        self.topk_group = topk_group
        self.routed_scaling_factor = routed_scaling_factor
        self.out_dtype = out_dtype
        self.key_expert = key_expert
        self.key_e_score_bias = key_e_score_bias
        self.key_gate_up_split = key_gate_up_split
        self.key_down_split = key_down_split
        self.gate_up_interleaved = gate_up_interleaved
        self.gated = gated
        self.act_limit = act_limit
        self.act_clamp = act_clamp
        self.key_tid2eid = key_tid2eid
        self.tid2eid = None
        self.shared_experts_post_norm = shared_experts_post_norm
        self.router_pre_norm = router_pre_norm
        self.routed_pre_norm = routed_pre_norm
        self.routed_post_norm = routed_post_norm
        self.key_per_expert_scale = key_per_expert_scale
        self.alt_residual_channel = alt_residual_channel
        self.keys_gud = (key_gate, key_up, key_down)
        self.router = Linear(config, f"{key}.{key_routing_gate}", hidden_size,
                             num_experts)
        self.shared_experts = shared_experts
        # Qwen-style shared expert gate: sigmoid(gate(x)) scales the shared
        # expert output (reference block_sparse_mlp.py key_shared_gate)
        self.shared_gate = None
        if key_shared_gate and shared_experts is not None:
            self.shared_gate = Linear(config, f"{key}.{key_shared_gate}",
                                      hidden_size, 1)
        self.modules = [self.router] + (
            [shared_experts] if shared_experts else []) + (
            [self.shared_gate] if self.shared_gate else []) + [
            m for m in (shared_experts_post_norm, router_pre_norm,
                        routed_pre_norm, routed_post_norm) if m]
        # host-offloaded experts (capacity mode): set by load() when
        # infer_params.moe_offload is on — model/moe_host.py layer index
        self.offload_lidx: int | None = None
        # expert Linears exist as loaders only; forward uses stacked params
        self._expert_linears = []
        for e in range(num_experts):
            ek = f"{key}.{key_expert.format(expert_idx=e)}"
            wires = (
                (key_gate, (hidden_size, intermediate_size)),
                (key_up, (hidden_size, intermediate_size)),
                (key_down, (intermediate_size, hidden_size)),
            ) if gated else (
                (key_up, (hidden_size, intermediate_size)),
                (key_down, (intermediate_size, hidden_size)),
            )
            for kk, (k_in, n_out) in wires:
                self._expert_linears.append(
                    Linear(config, f"{ek}.{kk}", k_in, n_out,
                           qmap=qmap and f"{qmap}.{kk}")
                )

    def load(self, params: dict) -> None:
        self.router.load(params)
        if self.shared_gate is not None:
            self.shared_gate.load(params)
        for nm in (self.shared_experts_post_norm, self.router_pre_norm,
                   self.routed_pre_norm, self.routed_post_norm):
            if nm is not None:
                nm.load(params)
        # DeepSeek-V3 noaux_tc expert-choice correction bias (not a Linear
        # bias: it shifts selection scores only, never the routing weights)
        eb_key = (f"{self.key}.{self.key_e_score_bias}" if self.key_e_score_bias
                  else self.router.key + ".e_score_correction_bias")
        eb = self.config.stc.get_tensor(eb_key, optional=True)
        if eb is not None:
            params[self.router.key]["e_bias"] = jnp.asarray(
                eb.astype(np.float32) if eb.dtype != np.uint16 else
                _bf16_f32(eb))
            if eb_key == self.router.key + ".bias":
                # V4 stores the selection-only bias AS the gate's bias tensor;
                # it must not shift the routing logits themselves
                params[self.router.key].pop("bias", None)
        if self.key_tid2eid:
            t2e = self.config.stc.get_tensor(
                f"{self.key}.{self.key_tid2eid}", optional=True)
            if t2e is not None:
                self.tid2eid = jnp.asarray(t2e.astype(np.int32))
        if self.key_per_expert_scale:
            pes = self.config.stc.get_tensor(
                f"{self.key}.{self.key_per_expert_scale}", allow_bf16=True)
            if pes.dtype == np.uint16:
                pes = _bf16_f32(pes)
            params[self.router.key]["per_expert_scale"] = jnp.asarray(
                pes.astype(np.float32))
        if self.key_gate_up_split and (
                self.config.stc.has_tensor(f"{self.key}.{self.key_gate_up_split}")
                or self.config.stc.has_tensor(
                    f"{self.key}.{self.key_gate_up_split}_blocks")):
            if self.shared_experts is not None:
                self.shared_experts.load(params)
            self._load_split_experts(params)
            return
        if self.shared_experts is not None:
            self.shared_experts.load(params)
        # load each expert linear, then stack into (E, in, out) bf16
        tmp: dict = {}
        for lin in self._expert_linears:
            lin.load(tmp)
        stacked: dict[str, list] = {}
        for lin in self._expert_linears:
            w = lin.get_weight_f32(tmp)
            name = lin.key.rsplit(".", 1)[-1]
            stacked.setdefault(name, []).append(w)
            tmp.pop(lin.key, None)
        gk, uk, dk = self.keys_gud
        if getattr(self.config.infer_params, "moe_offload", False):
            self._offload_register(
                np.stack(stacked[gk]) if self.gated else None,
                np.stack(stacked[uk]), np.stack(stacked[dk]))
            params[self.key] = {}
            return
        p = {}
        for name, ws in stacked.items():
            p["w_" + name] = jnp.asarray(np.stack(ws), dtype=jnp.bfloat16)
        params[self.key] = p

    def _offload_register(self, wg, wu, wd, bg=None, bu=None, bd=None):
        """Requantize the (E, in, out) f32 expert stacks to host int8 and
        register them with model/moe_host.py; the device keeps only the
        router (+ shared experts). Reference capability:
        moe_cpu_host.py (CPU-offloaded experts)."""
        from ..model import moe_host

        self.offload_lidx = moe_host.register_layer(
            wg, wu, wd, bg=bg, bu=bu, bd=bd, activation=self.activation,
            act_limit=self.act_limit, act_clamp=self.act_clamp,
            owner=id(self.config))

    def _load_split_experts(self, params: dict) -> None:
        """gpt-oss dense layout: experts.gate_up_proj (E, h, 2i) with gate/up
        interleaved on the last dim, experts.down_proj (E, i, h), plus per-
        expert biases (reference key_gate_up_split/gate_up_interleaved)."""
        from .gated_delta_net import _get_f32

        stc = self.config.stc

        def read_split(name):
            """bf16/f32 tensor, or MXFP4 <name>_blocks/<name>_scales pair
            (official gpt-oss checkpoints). MXFP4 stores (E, OUT, IN/32, 16)
            blocks -> dense (E, OUT, IN), transposed to our (E, IN, OUT)."""
            key = f"{self.key}.{name}"
            if stc.has_tensor(key + "_blocks"):
                from ..loader.safetensors import mxfp4_to_f32

                w = mxfp4_to_f32(stc.get_tensor(key + "_blocks"),
                                 stc.get_tensor(key + "_scales"))
                return np.ascontiguousarray(np.swapaxes(w, -1, -2))
            return _get_f32(stc, key)

        gu = read_split(self.key_gate_up_split)
        if self.gate_up_interleaved:
            wg, wu = gu[..., 0::2], gu[..., 1::2]
        else:
            i = gu.shape[-1] // 2
            wg, wu = gu[..., :i], gu[..., i:]
        wd = read_split(self.key_down_split)
        gk, uk, dk = self.keys_gud
        gub = _get_f32(stc, f"{self.key}.{self.key_gate_up_split}_bias",
                       optional=True)
        bg = bu = None
        if gub is not None:
            if self.gate_up_interleaved:
                bg, bu = gub[..., 0::2], gub[..., 1::2]
            else:
                i = gub.shape[-1] // 2
                bg, bu = gub[..., :i], gub[..., i:]
        bd = _get_f32(stc, f"{self.key}.{self.key_down_split}_bias",
                      optional=True)
        if getattr(self.config.infer_params, "moe_offload", False):
            self._offload_register(wg, wu, wd, bg=bg, bu=bu, bd=bd)
            params.setdefault(self.key, {})
            return
        p = params.get(self.key, {})
        p["w_" + gk] = jnp.asarray(wg, dtype=jnp.bfloat16)
        p["w_" + uk] = jnp.asarray(wu, dtype=jnp.bfloat16)
        p["w_" + dk] = jnp.asarray(wd, dtype=jnp.bfloat16)
        if bg is not None:
            p["b_" + gk], p["b_" + uk] = jnp.asarray(bg), jnp.asarray(bu)
        if bd is not None:
            p["b_" + dk] = jnp.asarray(bd)
        params[self.key] = p

    # -- routing ---------------------------------------------------------------

    def _group_limit(self, choice_scores, group_score_fn):
        """Mask expert scores outside the topk_group best groups."""
        T, E = choice_scores.shape
        g = choice_scores.reshape(T, self.n_group, E // self.n_group)
        group_scores = group_score_fn(g)  # (T, n_group)
        _, top_groups = jax.lax.top_k(group_scores, self.topk_group)
        gmask = jnp.zeros((T, self.n_group), dtype=jnp.bool_)
        gmask = gmask.at[jnp.arange(T)[:, None], top_groups].set(True)
        emask = jnp.broadcast_to(gmask[:, :, None], g.shape).reshape(T, E)
        return jnp.where(emask, choice_scores, -jnp.inf)

    def route(self, logits, e_bias=None):
        """logits (T, E) f32 -> (weights (T, E) f32 with zeros off-topk)."""
        T, E = logits.shape
        if self.routing == "std_bias":
            # gpt-oss: top-k on (biased) router logits, weights = softmax
            # over the selected logits
            topv, topi = jax.lax.top_k(logits, self.top_k)
            topv = jax.nn.softmax(topv, axis=-1)
        elif self.routing == "ds3":
            # DeepSeek-V3 noaux_tc: selection by sigmoid + correction bias,
            # group-limited; weights from the UNbiased sigmoid scores
            scores = jax.nn.sigmoid(logits)
            choice = scores + (e_bias if e_bias is not None else 0.0)
            if self.n_group > 1:
                # group score = sum of each group's top-2 biased scores
                choice = self._group_limit(
                    choice, lambda g: jnp.sum(jax.lax.top_k(g, 2)[0], axis=-1))
            _, topi = jax.lax.top_k(choice, self.top_k)
            topv = jnp.take_along_axis(scores, topi, axis=-1)
            if self.norm_topk_prob:
                topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
            topv = topv * self.routed_scaling_factor
        elif self.routing == "sqrtsp":
            # DeepSeek-V4 (reference block_sparse_mlp.py routing_sqrtsp:222):
            # sqrt(softplus) affinity, noaux_tc bias for selection only,
            # weights normalized over the selected set x scaling factor
            scores = jnp.sqrt(jax.nn.softplus(logits))
            choice = scores + (e_bias if e_bias is not None else 0.0)
            _, topi = jax.lax.top_k(choice, self.top_k)
            topv = jnp.take_along_axis(scores, topi, axis=-1)
            topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
            topv = topv * self.routed_scaling_factor
        elif self.routing == "group_greedy":
            # DeepSeek-V2: softmax scores, group score = group max
            scores = jax.nn.softmax(logits, axis=-1)
            choice = scores
            if self.n_group > 1:
                choice = self._group_limit(
                    choice, lambda g: jnp.max(g, axis=-1))
            _, topi = jax.lax.top_k(choice, self.top_k)
            topv = jnp.take_along_axis(scores, topi, axis=-1)
            if self.norm_topk_prob:
                topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
            topv = topv * self.routed_scaling_factor
        else:
            if self.routing == "sigmoid":
                scores = jax.nn.sigmoid(logits)
            else:
                scores = jax.nn.softmax(logits, axis=-1)
            topv, topi = jax.lax.top_k(scores, self.top_k)
            if self.norm_topk_prob:
                topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
        w = jnp.zeros((T, E), dtype=jnp.float32)
        w = w.at[jnp.arange(T)[:, None], topi].set(topv)
        return w

    # -- forward ------------------------------------------------------------------

    def _grouped_experts(self, xt, weights, p):
        """Exact grouped-expert compute: sort token-expert assignments by
        expert and run ragged MXU matmuls (jax.lax.ragged_dot) — k/E of the
        dense-all FLOPs with NO capacity drops (SURVEY §7 hard part #6:
        sort + segment matmul preserves exact routing)."""
        T, E = weights.shape
        k = self.top_k
        # recover the top-k assignment (weights has zeros off-topk)
        topv, topi = jax.lax.top_k(weights, k)  # (T, k)
        flat_e = topi.reshape(-1)  # (T*k,)
        flat_t = jnp.repeat(jnp.arange(T), k)
        flat_w = topv.reshape(-1)
        order = jnp.argsort(flat_e)
        e_sorted = flat_e[order]
        t_sorted = flat_t[order]
        w_sorted = flat_w[order]
        group_sizes = jnp.bincount(e_sorted, length=E).astype(jnp.int32)

        gk, uk, dk = self.keys_gud
        xs = xt[t_sorted].astype(jnp.bfloat16)  # (T*k, h)
        u = jax.lax.ragged_dot(xs, p["w_" + uk], group_sizes,
                               preferred_element_type=jnp.float32)
        if "b_" + uk in p:
            u = u + p["b_" + uk][e_sorted]
        if self.gated:
            g = jax.lax.ragged_dot(xs, p["w_" + gk], group_sizes,
                                   preferred_element_type=jnp.float32)
            if "b_" + gk in p:
                g = g + p["b_" + gk][e_sorted]
            if self.activation == "silu_oai":
                from .mlp import act_fn_silu_oai

                a = act_fn_silu_oai(g, u, limit=self.act_limit)
            elif self.act_clamp:
                from .mlp import act_mul_clamped

                a = act_mul_clamped(ACT2FN[self.activation], g, u,
                                    self.act_clamp)
            else:
                a = ACT2FN[self.activation](g) * u
        else:
            a = ACT2FN[self.activation](u)
        y = jax.lax.ragged_dot(a.astype(jnp.bfloat16), p["w_" + dk],
                               group_sizes, preferred_element_type=jnp.float32)
        if "b_" + dk in p:
            y = y + p["b_" + dk][e_sorted]
        y = y * w_sorted[:, None]
        out = jnp.zeros((T, xt.shape[-1]), jnp.float32)
        return out.at[t_sorted].add(y)

    def forward(self, x, params: dict, ctx: ForwardCtx):
        p = params[self.key]
        shape = x.shape
        h = shape[-1]
        xt = x.reshape(-1, h)
        T = xt.shape[0]

        # Gemma4: route and feed the experts from the RESIDUAL stream
        if self.alt_residual_channel and "moe_residual" in ctx.extras:
            y_in = ctx.extras["moe_residual"].reshape(-1, h)
        else:
            y_in = xt
        route_in = y_in
        if self.router_pre_norm is not None:
            route_in = self.router_pre_norm.forward(y_in, params, ctx)
        xt_exp = y_in if self.alt_residual_channel else xt
        if self.routed_pre_norm is not None:
            xt_exp = self.routed_pre_norm.forward(y_in, params, ctx)

        logits = self.router.forward(route_in, params, ctx).astype(jnp.float32)
        if self.tid2eid is not None and "input_ids" in ctx.extras:
            # hash-MoE bootstrap (reference routing_sqrtsp_hash:260): the
            # frozen tid2eid table picks the experts; the learned gate still
            # weights them (sqrtsp affinity, normalized over the selection)
            ids = ctx.extras["input_ids"].reshape(-1)
            topi = self.tid2eid[ids].reshape(T, self.top_k)
            scores = jnp.sqrt(jax.nn.softplus(logits))
            topv = jnp.take_along_axis(scores, topi, axis=-1)
            topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
            topv = topv * self.routed_scaling_factor
            weights = jnp.zeros((T, self.num_experts), jnp.float32)
            weights = weights.at[jnp.arange(T)[:, None], topi].set(topv)
        else:
            weights = self.route(logits, params[self.router.key].get("e_bias"))  # (T, E)
        pes = params[self.router.key].get("per_expert_scale")
        if pes is not None:
            weights = weights * pes[None, :]

        # routed compute, four bodies (same exact routing semantics):
        #   * EP shard_map island for decode under expert-parallel sharding —
        #     each device runs the selected-expert kernel over only its
        #     LOCALLY-RESIDENT routed experts, psum combines (the reference's
        #     channel_unit="experts" EP, block_sparse_mlp.py:1556-1590)
        #   * grouped ragged-dot for prefill shapes (k/E of dense FLOPs)
        #   * selected-expert Pallas kernel for decode shapes — reads ONLY
        #     the k routed experts' weight bytes (reference exl3_moe.cu:
        #     at top-8-of-128 the dense-all path costs 16x the HBM traffic)
        #   * dense-all einsum (CPU / expert-parallel GSPMD fallback)
        ep = ctx.extras.get("ep")
        if self.offload_lidx is not None:
            if ep is not None:
                # pure_callback under a partitioned step would run per shard
                # with local operands against a global result shape
                raise RuntimeError(
                    "moe_offload cannot run inside an expert-parallel step "
                    "(single-device capacity mode); load without ep_mesh")
            out = self._host_offload_experts(xt_exp, weights)
        elif ep is not None and self._use_ep_kernel(T, ep[0], ep[1]):
            out = self._ep_selected_experts(xt_exp, weights, p, *ep)
        elif T * self.top_k * 2 < T * self.num_experts and T >= 16:
            out = self._grouped_experts(xt_exp, weights, p)
        elif self._use_selected_kernel(T):
            out = self._selected_experts(xt_exp, weights, p)
        else:
            out = self._dense_all_experts(xt_exp, weights, p)
        if self.routed_post_norm is not None:
            out = self.routed_post_norm.forward(out, params, ctx) \
                .astype(jnp.float32)

        if self.shared_experts is not None:
            so = self.shared_experts.forward(xt, params, ctx).astype(jnp.float32)
            if self.shared_experts_post_norm is not None:
                so = self.shared_experts_post_norm.forward(
                    so, params, ctx).astype(jnp.float32)
            if self.shared_gate is not None:
                sg = self.shared_gate.forward(xt, params, ctx).astype(jnp.float32)
                so = so * jax.nn.sigmoid(sg)
            out = out + so

        out = out.reshape(shape[:-1] + (h,))
        if self.out_dtype is not None:
            out = out.astype(self.out_dtype)
        else:
            out = out.astype(x.dtype)
        return out

    def _use_selected_kernel(self, T: int) -> bool:
        from ..util.env import moe_backend
        from ..ops.moe_gemm import _pick_bi

        backend = moe_backend()
        if getattr(self.config.infer_params, "moe_decode", "auto") == "dense":
            backend = "dense"
        return (backend != "dense" and T <= 16
                and self.top_k < self.num_experts
                and self.hidden_size % 128 == 0
                and _pick_bi(self.hidden_size, self.intermediate_size) > 0)

    def _use_ep_kernel(self, T: int, mesh, axis: str) -> bool:
        from ..util.env import moe_backend
        from ..ops.moe_gemm import _pick_bi

        backend = moe_backend()
        if getattr(self.config.infer_params, "moe_decode", "auto") == "dense":
            backend = "dense"
        D = mesh.shape[axis]
        return (backend != "dense" and T <= 16
                and self.num_experts % D == 0
                and self.num_experts // D > 1
                and self.hidden_size % 128 == 0
                and _pick_bi(self.hidden_size, self.intermediate_size) > 0)

    def _ep_selected_experts(self, xt, weights, p, mesh, axis: str):
        """Expert-parallel decode: shard_map island over the `axis` mesh dim.

        Each device holds E/D stacked experts (parallel/sharding.py P(axis))
        and computes ONLY its locally-resident routed experts with the
        selected-expert kernel, then one psum combines. Static shapes via a
        capacity bound of k slots per device (a token's whole top-k could
        land on one shard); non-routed slots carry weight 0 and DUPLICATE the
        last routed expert's id, so the kernel's adjacent-duplicate DMA skip
        (ops/moe_gemm.py) keeps per-device HBM traffic at the actually-routed
        experts' bytes ~= shared + (k/E) x local expert bytes. Exact: every
        selected (t, e) pair computes on e's owner exactly once.

        Reference: EP distributes whole experts and each GPU runs only its
        routed experts' GEMMs (block_sparse_mlp.py:1556-1590, exl3_moe.cu).
        """
        from jax.sharding import PartitionSpec as P

        shard_map = jax.shard_map
        from ..util.env import moe_backend
        from ..ops.moe_gemm import selected_expert_mlp

        gk, uk, dk = self.keys_gud
        gated = self.gated
        T, E = weights.shape
        D = mesh.shape[axis]
        e_loc = E // D
        k_loc = min(self.top_k, e_loc)
        interpret = moe_backend() == "interpret"

        wspec = P(axis, None, None)
        bspec = P(axis, None)
        args = [xt, weights, p["w_" + uk], p["w_" + dk]]
        specs = [P(), P(), wspec, wspec]
        opt_names = []
        if gated:
            args.append(p["w_" + gk]); specs.append(wspec)
            opt_names.append("wg")
        for bk in ("b_" + gk, "b_" + uk, "b_" + dk):
            if bk in p and (bk != "b_" + gk or gated):
                args.append(p[bk]); specs.append(bspec)
                opt_names.append({"b_" + gk: "bg", "b_" + uk: "bu",
                                  "b_" + dk: "bd"}[bk])

        def body(xt_l, w_l, wu_l, wd_l, *opts):
            kw = dict(zip(opt_names, opts))
            d = jax.lax.axis_index(axis)
            # local slice of the routing weights: experts [d*e_loc, (d+1)*e_loc)
            w_local = jax.lax.dynamic_slice(w_l, (0, d * e_loc), (T, e_loc))
            topv, topi = jax.lax.top_k(w_local, k_loc)  # zeros (dead) last
            live = topv > 0
            n_live = jnp.sum(live.astype(jnp.int32), axis=-1)
            last = jnp.take_along_axis(
                topi, jnp.maximum(n_live - 1, 0)[:, None], axis=1)
            topi = jnp.where(live, topi, last)  # duplicates -> DMA skip
            y = selected_expert_mlp(
                xt_l, topi, topv, wu_l, wd_l, wg=kw.get("wg"),
                bg=kw.get("bg"), bu=kw.get("bu"), bd=kw.get("bd"),
                activation=self.activation, act_limit=self.act_limit,
                act_clamp=self.act_clamp, interpret=interpret)
            return jax.lax.psum(y, axis)

        fn = shard_map(body, mesh=mesh, in_specs=tuple(specs),
                       out_specs=P(), check_vma=False)
        return fn(*args)

    def _host_offload_experts(self, xt, weights):
        """Capacity mode: routed experts live in host RAM as int8 stacks
        (model/moe_host.py) and compute on the native threadpool; the traced
        step reaches them through jax.pure_callback (XLA's device->host->
        device edge — the GSPMD-era stand-in for the reference's pinned-SHM
        job ring, moe_cpu_host.py:20-37). The callback is pure in its inputs
        (the registry is frozen after load), so it is legal under jit, scan
        (decode bursts) and checkpointing."""
        from ..model import moe_host

        lidx = self.offload_lidx
        topv, topi = jax.lax.top_k(weights, self.top_k)

        def cb(x_np, ti_np, tv_np):
            return moe_host.forward(lidx, x_np, ti_np, tv_np)

        return jax.pure_callback(
            cb, jax.ShapeDtypeStruct((xt.shape[0], self.hidden_size),
                                     jnp.float32),
            xt.astype(jnp.float32), topi, topv)

    def _selected_experts(self, xt, weights, p):
        """Decode: one Pallas launch reading only the routed experts' bytes
        (ops/moe_gemm.py)."""
        from ..util.env import moe_backend
        from ..ops.moe_gemm import selected_expert_mlp

        gk, uk, dk = self.keys_gud
        topv, topi = jax.lax.top_k(weights, self.top_k)
        return selected_expert_mlp(
            xt, topi, topv, p["w_" + uk], p["w_" + dk],
            wg=p["w_" + gk] if self.gated else None,
            bg=p.get("b_" + gk), bu=p.get("b_" + uk), bd=p.get("b_" + dk),
            activation=self.activation, act_limit=self.act_limit,
            act_clamp=self.act_clamp,
            interpret=(moe_backend() == "interpret"),
        )

    def _dense_all_experts(self, xt_exp, weights, p):
        gk, uk, dk = self.keys_gud
        wu, wd = p["w_" + uk], p["w_" + dk]
        xb = xt_exp.astype(jnp.bfloat16)
        u = einsum_f32("th,ehi->eti", xb, wu)
        if "b_" + uk in p:
            u = u + p["b_" + uk][:, None, :]
        if self.gated:
            g = einsum_f32("th,ehi->eti", xb, p["w_" + gk])
            if "b_" + gk in p:
                g = g + p["b_" + gk][:, None, :]
            if self.activation == "silu_oai":
                from .mlp import act_fn_silu_oai

                a = act_fn_silu_oai(g, u, limit=self.act_limit).astype(jnp.bfloat16)
            elif self.act_clamp:
                from .mlp import act_mul_clamped

                a = act_mul_clamped(ACT2FN[self.activation], g, u,
                                    self.act_clamp).astype(jnp.bfloat16)
            else:
                a = (ACT2FN[self.activation](g) * u).astype(jnp.bfloat16)
        else:
            a = ACT2FN[self.activation](u).astype(jnp.bfloat16)
        y = einsum_f32("eti,eih->eth", a, wd)
        if "b_" + dk in p:
            y = y + p["b_" + dk][:, None, :]
        return jnp.einsum("eth,te->th", y, weights)
