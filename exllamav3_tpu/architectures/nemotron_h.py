"""NemotronH: hybrid Mamba2 / attention / MLP / MoE architecture.

Feature reference: /root/reference/exllamav3/architecture/nemotronh.py
(NemotronHConfig:20 — hybrid_override_pattern string of M/*/-/E layer types;
NoPE attention; relu2 non-gated MLPs; 30B-A3B MoE with sigmoid router +
correction bias and an always-on shared expert).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import (
    Attention,
    BlockSparseMLP,
    Embedding,
    Linear,
    Mamba2,
    MLP,
    RMSNorm,
    TransformerBlock,
)


class NemotronHConfig(Config):
    arch_string = "NemotronHForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": NemotronHModel},
                         **kwargs)
        # M = Mamba2, * = attention, - = MLP, E = MoE
        self.hybrid_override_pattern = self.read_cfg(
            str, "hybrid_override_pattern", no_default)

        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads

        self.mamba_num_heads = self.read_cfg(int, "mamba_num_heads", no_default)
        self.mamba_head_dim = self.read_cfg(int, "mamba_head_dim", no_default)
        self.ssm_state_size = self.read_cfg(int, "ssm_state_size", no_default)
        self.n_groups = self.read_cfg(int, "n_groups", no_default)
        self.conv_kernel = self.read_cfg(int, "conv_kernel", 4)
        self.time_step_limit = self.read_cfg(list, "time_step_limit",
                                             [0.0, float("inf")])

        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.num_experts = self.read_cfg(int, "n_routed_experts", 0)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok", 0)
        self.moe_intermediate_size = self.read_cfg(int, "moe_intermediate_size", 0)
        self.shared_expert_intermediate_size = self.read_cfg(
            int, "moe_shared_expert_intermediate_size", 0)
        self.routed_scaling_factor = self.read_cfg(float, "routed_scaling_factor", 2.5)

        self.layer_norm_epsilon = self.read_cfg(float, "layer_norm_epsilon",
                                                no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        assert len(self.hybrid_override_pattern) == self.num_hidden_layers
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)


class NemotronHModel(Model):
    config_class = NemotronHConfig

    def __init__(self, config: NemotronHConfig, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="backbone.embeddings",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)

        for idx in range(config.num_hidden_layers):
            bt = config.hybrid_override_pattern[idx]
            lk = f"backbone.layers.{idx}"
            norm = RMSNorm(config, f"{lk}.norm", config.layer_norm_epsilon)
            if bt == "M":
                block = TransformerBlock(
                    config=config, key=lk, layer_idx=idx, attn_norm=norm,
                    attn=Mamba2(
                        config=config, key=f"{lk}.mixer", layer_idx=idx,
                        hidden_size=config.hidden_size,
                        num_heads=config.mamba_num_heads,
                        head_dim=config.mamba_head_dim,
                        num_groups=config.n_groups,
                        state_size=config.ssm_state_size,
                        rms_norm_eps=config.layer_norm_epsilon,
                        conv_kernel_size=config.conv_kernel,
                        dt_limit=tuple(config.time_step_limit),
                        qmap="block.attn", out_dtype=jnp.float32,
                    ),
                )
            elif bt == "*":
                block = TransformerBlock(
                    config=config, key=lk, layer_idx=idx, attn_norm=norm,
                    attn=Attention(
                        config=config, key=f"{lk}.mixer", layer_idx=idx,
                        hidden_size=config.hidden_size, head_dim=config.head_dim,
                        num_q_heads=config.num_q_heads,
                        num_kv_heads=config.num_kv_heads,
                        rope_settings=None,  # NoPE
                        qmap="block.attn", out_dtype=jnp.float32,
                    ),
                )
            elif bt == "-":
                block = TransformerBlock(
                    config=config, key=lk, layer_idx=idx, mlp_norm=norm,
                    mlp=MLP(config=config, key=f"{lk}.mixer",
                            hidden_size=config.hidden_size,
                            intermediate_size=config.intermediate_size,
                            activation="relu2", qmap="block.mlp",
                            out_dtype=jnp.float32),
                )
            elif bt == "E":
                block = TransformerBlock(
                    config=config, key=lk, layer_idx=idx, mlp_norm=norm,
                    mlp=BlockSparseMLP(
                        config=config, key=f"{lk}.mixer",
                        hidden_size=config.hidden_size,
                        intermediate_size=config.moe_intermediate_size,
                        num_experts=config.num_experts,
                        num_experts_per_tok=config.num_experts_per_tok,
                        key_routing_gate="gate",
                        activation="relu2", gated=False,
                        routing="ds3",
                        routed_scaling_factor=config.routed_scaling_factor,
                        qmap="block.mlp",
                        shared_experts=MLP(
                            config=config, key=f"{lk}.mixer.shared_experts",
                            hidden_size=config.hidden_size,
                            intermediate_size=config.shared_expert_intermediate_size,
                            activation="relu2", qmap="block.mlp"),
                        out_dtype=jnp.float32,
                    ),
                )
            else:
                raise ValueError(f"unknown layer type {bt!r}")
            self.modules.append(block)

        self.last_kv_module_idx = len(self.modules) - 1
        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("lm_head.weight"):
            head_alt_key = "backbone.embeddings"
        self.modules += [
            RMSNorm(config, "backbone.norm_f", config.layer_norm_epsilon,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head", in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key, out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1


ARCHITECTURES = [NemotronHConfig]
