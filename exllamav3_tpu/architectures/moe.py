"""MoE architectures: Mixtral, Qwen3-MoE.

Feature reference: /root/reference/exllamav3/architecture/mixtral.py and
qwen3_moe.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.config import no_default
from ..modules import Attention, Embedding, Linear, RMSNorm, TransformerBlock
from ..modules.block_sparse_mlp import BlockSparseMLP
from ..util.rope import RopeStyle
from .llama import LlamaConfig, LlamaModel


class MixtralConfig(LlamaConfig):
    arch_string = "MixtralForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory,
                         derived_model or {"text": MixtralModel}, **kwargs)
        self.num_experts = self.read_cfg(int, ["num_local_experts", "num_experts"],
                                         no_default)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok", 2)
        self.norm_topk_prob = self.read_cfg(bool, "norm_topk_prob", True)
        self.moe_intermediate_size = self.read_cfg(
            int, ["moe_intermediate_size", "intermediate_size"], self.intermediate_size
        )


class MixtralModel(LlamaModel):
    config_class = MixtralConfig
    mlp_key = "block_sparse_moe"
    router_key = "gate"
    expert_key = "experts.{expert_idx}"
    mlp_keys = ("w1", "w3", "w2")  # gate, up, down in Mixtral naming

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        # swap every block's MLP for the block-sparse version
        for m in self.modules:
            if isinstance(m, TransformerBlock) and m.mlp is not None:
                lk = m.key
                kg, ku, kd = self.mlp_keys
                m.mlp = BlockSparseMLP(
                    config=config,
                    key=f"{lk}.{self.mlp_key}",
                    hidden_size=config.hidden_size,
                    intermediate_size=config.moe_intermediate_size,
                    num_experts=config.num_experts,
                    num_experts_per_tok=config.num_experts_per_tok,
                    key_gate=kg,
                    key_up=ku,
                    key_down=kd,
                    key_routing_gate=self.router_key,
                    key_expert=self.expert_key,
                    qmap="block.mlp",
                    norm_topk_prob=config.norm_topk_prob,
                    out_dtype=jnp.float32,
                )
                m.modules = [x for x in (m.attn_norm, m.attn, m.attn_post_norm,
                                         m.mlp_norm, m.mlp, m.mlp_post_norm) if x]


class Qwen3MoeConfig(MixtralConfig):
    arch_string = "Qwen3MoeForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Qwen3MoeModel}, **kwargs)


class Qwen3MoeModel(MixtralModel):
    config_class = Qwen3MoeConfig
    use_qk_norm = True
    mlp_key = "mlp"
    router_key = "gate"
    expert_key = "experts.{expert_idx}"
    mlp_keys = ("gate_proj", "up_proj", "down_proj")


ARCHITECTURES = [MixtralConfig, Qwen3MoeConfig]
