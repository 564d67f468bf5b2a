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
(gpt-oss style), "ds3" (grouped, DeepSeek-V3) — ds3 lands with the MLA arch.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, ForwardCtx
from .linear import Linear
from .mlp import ACT2FN


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
        key_expert: str = "experts.{expert_idx}",
        qmap: str | None = None,
        activation: str = "silu",
        routing: str = "std",
        norm_topk_prob: bool = True,
        shared_experts: Module | None = None,
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
        self.out_dtype = out_dtype
        self.key_expert = key_expert
        self.keys_gud = (key_gate, key_up, key_down)
        self.router = Linear(config, f"{key}.{key_routing_gate}", hidden_size,
                             num_experts)
        self.shared_experts = shared_experts
        self.modules = [self.router] + ([shared_experts] if shared_experts else [])
        # expert Linears exist as loaders only; forward uses stacked params
        self._expert_linears = []
        for e in range(num_experts):
            ek = f"{key}.{key_expert.format(expert_idx=e)}"
            for kk, (k_in, n_out) in (
                (key_gate, (hidden_size, intermediate_size)),
                (key_up, (hidden_size, intermediate_size)),
                (key_down, (intermediate_size, hidden_size)),
            ):
                self._expert_linears.append(
                    Linear(config, f"{ek}.{kk}", k_in, n_out,
                           qmap=qmap and f"{qmap}.{kk}")
                )

    def load(self, params: dict) -> None:
        self.router.load(params)
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
        p = {}
        for name, ws in stacked.items():
            p["w_" + name] = jnp.asarray(np.stack(ws), dtype=jnp.bfloat16)
        params[self.key] = p

    # -- routing ---------------------------------------------------------------

    def route(self, logits):
        """logits (T, E) f32 -> (weights (T, E) f32 with zeros off-topk)."""
        T, E = logits.shape
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

    def forward(self, x, params: dict, ctx: ForwardCtx):
        p = params[self.key]
        shape = x.shape
        h = shape[-1]
        xt = x.reshape(-1, h)
        T = xt.shape[0]

        logits = self.router.forward(xt, params, ctx).astype(jnp.float32)
        weights = self.route(logits)  # (T, E)

        gk, uk, dk = self.keys_gud
        wg, wu, wd = p["w_" + gk], p["w_" + uk], p["w_" + dk]
        xb = xt.astype(jnp.bfloat16)
        g = jnp.einsum("th,ehi->eti", xb, wg, preferred_element_type=jnp.float32)
        u = jnp.einsum("th,ehi->eti", xb, wu, preferred_element_type=jnp.float32)
        a = (ACT2FN[self.activation](g) * u).astype(jnp.bfloat16)
        y = jnp.einsum("eti,eih->eth", a, wd, preferred_element_type=jnp.float32)
        out = jnp.einsum("eth,te->th", y, weights)

        if self.shared_experts is not None:
            out = out + self.shared_experts.forward(xt, params, ctx).astype(jnp.float32)

        out = out.reshape(shape[:-1] + (h,))
        if self.out_dtype is not None:
            out = out.astype(self.out_dtype)
        else:
            out = out.astype(x.dtype)
        return out
