"""AFMoE (Arcee Foundation MoE).

Feature reference: /root/reference/exllamav3/architecture/afmoe.py
(AfmoeForCausalLM — full-width attention output gate via gate_proj, dual
attention norms (input + post), pre/post MLP norms, sliding/full layer
types, dense prefix layers, dots router with "expert_bias" key under
router.gate, shared experts).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import (
    Attention,
    BlockSparseMLP,
    Embedding,
    GatedMLP,
    Linear,
    RMSNorm,
    TransformerBlock,
)
from ..util.rope import RopeStyle
from .llama_variants import read_swa_pattern


class AfmoeConfig(Config):
    arch_string = "AfmoeForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": AfmoeModel},
                         **kwargs)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.num_dense_layers = self.read_cfg(int, "num_dense_layers", 0)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.swa_pattern = read_swa_pattern(self)
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.moe_intermediate_size = self.read_cfg(int, "moe_intermediate_size",
                                                   no_default)
        self.num_experts = self.read_cfg(int, "num_experts", no_default)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok",
                                                 no_default)
        self.num_shared_experts = self.read_cfg(int, "num_shared_experts", 0)
        self.route_norm = self.read_cfg(bool, "route_norm", True)
        self.route_scale = self.read_cfg(float, "route_scale", 1.0)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", 1e-5)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.NEOX)


class AfmoeModel(Model):
    config_class = AfmoeConfig

    def __init__(self, config: AfmoeConfig, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="model.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"model.layers.{idx}"
            is_moe = idx >= config.num_dense_layers
            if is_moe:
                mlp = BlockSparseMLP(
                    config=config, key=f"{lk}.mlp",
                    hidden_size=config.hidden_size,
                    intermediate_size=config.moe_intermediate_size,
                    num_experts=config.num_experts,
                    num_experts_per_tok=config.num_experts_per_tok,
                    key_routing_gate="router.gate",
                    key_e_score_bias="expert_bias",
                    routing="ds3", norm_topk_prob=config.route_norm,
                    routed_scaling_factor=config.route_scale,
                    qmap="block.mlp",
                    shared_experts=GatedMLP(
                        config=config, key=f"{lk}.mlp.shared_experts",
                        hidden_size=config.hidden_size,
                        intermediate_size=(config.moe_intermediate_size
                                           * config.num_shared_experts),
                        qmap="block.mlp",
                    ) if config.num_shared_experts else None,
                    out_dtype=jnp.float32,
                )
            else:
                mlp = GatedMLP(config=config, key=f"{lk}.mlp",
                               hidden_size=config.hidden_size,
                               intermediate_size=config.intermediate_size,
                               qmap="block.mlp", out_dtype=jnp.float32)
            self.modules += [
                TransformerBlock(
                    config=config, key=lk, layer_idx=idx,
                    attn_norm=RMSNorm(config, f"{lk}.input_layernorm",
                                      config.rms_norm_eps),
                    attn=Attention(
                        config=config, key=f"{lk}.self_attn", layer_idx=idx,
                        hidden_size=config.hidden_size, head_dim=config.head_dim,
                        num_q_heads=config.num_q_heads,
                        num_kv_heads=config.num_kv_heads,
                        rope_settings=config.rope_settings,
                        sliding_window=config.swa_pattern[idx],
                        key_g="gate_proj", full_gate=True,
                        qmap="block.attn",
                        q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                                       config.rms_norm_eps, dim=config.head_dim),
                        k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                                       config.rms_norm_eps, dim=config.head_dim),
                    ),
                    attn_post_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                           config.rms_norm_eps),
                    mlp_norm=RMSNorm(config, f"{lk}.pre_mlp_layernorm",
                                     config.rms_norm_eps),
                    mlp=mlp,
                    mlp_post_norm=RMSNorm(config, f"{lk}.post_mlp_layernorm",
                                          config.rms_norm_eps,
                                          out_dtype=jnp.float32),
                )
            ]
        self.last_kv_module_idx = len(self.modules) - 1
        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("lm_head.weight"):
            head_alt_key = "model.embed_tokens"
        self.modules += [
            RMSNorm(config, "model.norm", config.rms_norm_eps,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head", in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key, out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1


ARCHITECTURES = [AfmoeConfig]
