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


class Dots1Config(LlamaConfig):
    """dots.llm1: DeepSeek-V3-style noaux_tc MoE with dense first layers
    (reference architecture/dots1.py)."""

    arch_string = "Dots1ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Dots1Model}, **kwargs)
        self.moe_intermediate_size = self.read_cfg(int, "moe_intermediate_size",
                                                   no_default)
        self.num_shared_experts = self.read_cfg(int, "n_shared_experts", 1)
        self.num_experts = self.read_cfg(int, "n_routed_experts", 128)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok", 8)
        self.first_k_dense_replace = self.read_cfg(int, "first_k_dense_replace", 3)
        self.routed_scaling_factor = self.read_cfg(float, "routed_scaling_factor", 2.5)


class Dots1Model(LlamaModel):
    config_class = Dots1Config
    use_qk_norm = True

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        from ..modules import GatedMLP

        for m in self.modules:
            if not isinstance(m, TransformerBlock) or m.mlp is None:
                continue
            if m.layer_idx < config.first_k_dense_replace:
                continue
            lk = m.key
            m.mlp = BlockSparseMLP(
                config=config, key=f"{lk}.mlp",
                hidden_size=config.hidden_size,
                intermediate_size=config.moe_intermediate_size,
                num_experts=config.num_experts,
                num_experts_per_tok=config.num_experts_per_tok,
                key_routing_gate="gate",
                routing="ds3", norm_topk_prob=True,
                routed_scaling_factor=config.routed_scaling_factor,
                qmap="block.mlp",
                shared_experts=GatedMLP(
                    config=config, key=f"{lk}.mlp.shared_experts",
                    hidden_size=config.hidden_size,
                    intermediate_size=(config.moe_intermediate_size
                                       * config.num_shared_experts),
                    qmap="block.mlp", activation="silu",
                ) if config.num_shared_experts else None,
                out_dtype=jnp.float32,
            )
            m.modules = [x for x in (m.attn_norm, m.attn, m.attn_post_norm,
                                     m.mlp_norm, m.mlp, m.mlp_post_norm) if x]


class Ernie45Config(LlamaConfig):
    arch_string = "Ernie4_5_ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Ernie45Model}, **kwargs)


class Ernie45Model(LlamaModel):
    config_class = Ernie45Config


class Ernie45MoeConfig(LlamaConfig):
    """ERNIE-4.5 MoE (reference architecture/ernie4_5_moe.py: moe_num_experts,
    moe_k, moe_layer_start_index, sigmoid router with correction bias)."""

    arch_string = "Ernie4_5_MoeForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Ernie45MoeModel},
                         **kwargs)
        self.moe_intermediate_size = self.read_cfg(int, "moe_intermediate_size",
                                                   no_default)
        self.num_shared_experts = self.read_cfg(int, "moe_num_shared_experts", 0)
        self.num_experts = self.read_cfg(int, "moe_num_experts", no_default)
        self.num_experts_per_tok = self.read_cfg(int, "moe_k", no_default)
        self.first_k_dense_replace = self.read_cfg(int, "moe_layer_start_index", 0)


class Ernie45MoeModel(LlamaModel):
    config_class = Ernie45MoeConfig

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        from ..modules import GatedMLP

        for m in self.modules:
            if not isinstance(m, TransformerBlock) or m.mlp is None:
                continue
            if m.layer_idx < config.first_k_dense_replace:
                continue
            lk = m.key
            m.mlp = BlockSparseMLP(
                config=config, key=f"{lk}.mlp",
                hidden_size=config.hidden_size,
                intermediate_size=config.moe_intermediate_size,
                num_experts=config.num_experts,
                num_experts_per_tok=config.num_experts_per_tok,
                key_routing_gate="gate",
                routing="ds3", norm_topk_prob=True,
                routed_scaling_factor=1.0,
                qmap="block.mlp",
                shared_experts=GatedMLP(
                    config=config, key=f"{lk}.mlp.shared_experts",
                    hidden_size=config.hidden_size,
                    intermediate_size=(config.moe_intermediate_size
                                       * config.num_shared_experts),
                    qmap="block.mlp", activation="silu",
                ) if config.num_shared_experts else None,
                out_dtype=jnp.float32,
            )
            m.modules = [x for x in (m.attn_norm, m.attn, m.attn_post_norm,
                                     m.mlp_norm, m.mlp, m.mlp_post_norm) if x]


class MiniMaxM2Config(LlamaConfig):
    """MiniMax-M2 (reference architecture/minimax_m2.py): span-head qk norms,
    every layer MoE with sigmoid router + correction bias."""

    arch_string = "MiniMaxM2ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": MiniMaxM2Model},
                         **kwargs)
        self.moe_intermediate_size = self.read_cfg(
            int, ["moe_intermediate_size", "intermediate_size"], no_default)
        self.num_experts = self.read_cfg(int, "num_local_experts", no_default)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok",
                                                 no_default)
        self.routed_scaling_factor = self.read_cfg(float, "routed_scaling_factor",
                                                   1.0)


class MiniMaxM2Model(LlamaModel):
    config_class = MiniMaxM2Config

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        from ..modules import RMSNorm

        for m in self.modules:
            if not isinstance(m, TransformerBlock) or m.mlp is None:
                continue
            lk = m.key
            m.attn.q_norm = RMSNorm(config, f"{lk}.self_attn.q_norm",
                                    config.rms_norm_eps, span_heads=True,
                                    dim=config.num_q_heads * config.head_dim)
            m.attn.k_norm = RMSNorm(config, f"{lk}.self_attn.k_norm",
                                    config.rms_norm_eps, span_heads=True,
                                    dim=config.num_kv_heads * config.head_dim)
            m.attn.modules = [x for x in (m.attn.q_proj, m.attn.k_proj,
                                          m.attn.v_proj, m.attn.o_proj,
                                          m.attn.q_norm, m.attn.k_norm) if x]
            m.mlp = BlockSparseMLP(
                config=config, key=f"{lk}.block_sparse_moe",
                hidden_size=config.hidden_size,
                intermediate_size=config.moe_intermediate_size,
                num_experts=config.num_experts,
                num_experts_per_tok=config.num_experts_per_tok,
                key_routing_gate="gate",
                routing="ds3", norm_topk_prob=True,
                routed_scaling_factor=config.routed_scaling_factor,
                qmap="block.mlp",
                out_dtype=jnp.float32,
            )
            m.modules = [x for x in (m.attn_norm, m.attn, m.attn_post_norm,
                                     m.mlp_norm, m.mlp, m.mlp_post_norm) if x]


ARCHITECTURES = [MixtralConfig, Qwen3MoeConfig, Dots1Config, Ernie45Config,
                 Ernie45MoeConfig, MiniMaxM2Config]
