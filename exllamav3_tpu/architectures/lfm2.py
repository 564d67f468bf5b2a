"""LFM2-MoE: hybrid short-conv / attention with sparse relu-less MoE.

Feature reference: /root/reference/exllamav3/architecture/lfm2_moe.py
(Lfm2MoeConfig:40 — conv_L_cache kernel, layer_types full_attention|conv,
operator_norm/ffn_norm naming, w1/w3/w2 MLP keys, dots router with
"expert_bias" selection bias, num_dense_layers dense prefix).
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
    ShortConv,
    TransformerBlock,
)
from ..util.rope import RopeStyle
from .qwen3_5 import read_hybrid_layer_types


class Lfm2MoeConfig(Config):
    arch_string = "Lfm2MoeForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": Lfm2MoeModel},
                         **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.conv_kernel_size = self.read_cfg(int, "conv_L_cache", 3)
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.moe_intermediate_size = self.read_cfg(int, "moe_intermediate_size",
                                                   self.intermediate_size)
        self.num_experts = self.read_cfg(int, "num_experts", 0)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok", 0)
        self.num_dense_layers = self.read_cfg(int, "num_dense_layers", 0)
        self.routed_scaling_factor = self.read_cfg(float, "routed_scaling_factor", 1.0)
        self.use_expert_bias = self.read_cfg(bool, "use_expert_bias", True)
        self.rms_norm_eps = self.read_cfg(float, "norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.layer_types = read_hybrid_layer_types(
            self, self.num_hidden_layers, 4, linear_name="conv")
        self.rope_settings = self.read_rope_settings_default(
            RopeStyle.NEOX, default_theta=1000000.0)


class Lfm2MoeModel(Model):
    config_class = Lfm2MoeConfig

    def __init__(self, config: Lfm2MoeConfig, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="model.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"model.layers.{idx}"
            if config.layer_types[idx] == "conv":
                attn = ShortConv(
                    config=config, key=f"{lk}.conv", layer_idx=idx,
                    hidden_size=config.hidden_size,
                    conv_kernel_size=config.conv_kernel_size,
                    qmap="block.attn", out_dtype=jnp.float32,
                )
            else:
                attn = Attention(
                    config=config, key=f"{lk}.self_attn", layer_idx=idx,
                    hidden_size=config.hidden_size, head_dim=config.head_dim,
                    num_q_heads=config.num_q_heads,
                    num_kv_heads=config.num_kv_heads,
                    rope_settings=config.rope_settings,
                    key_o="out_proj",
                    qmap="block.attn",
                    q_norm=RMSNorm(config, f"{lk}.self_attn.q_layernorm",
                                   config.rms_norm_eps, dim=config.head_dim),
                    k_norm=RMSNorm(config, f"{lk}.self_attn.k_layernorm",
                                   config.rms_norm_eps, dim=config.head_dim),
                    out_dtype=jnp.float32,
                )
            use_moe = (config.num_experts > 0
                       and idx >= config.num_dense_layers)
            if use_moe:
                mlp = BlockSparseMLP(
                    config=config, key=f"{lk}.feed_forward",
                    hidden_size=config.hidden_size,
                    intermediate_size=config.moe_intermediate_size,
                    num_experts=config.num_experts,
                    num_experts_per_tok=config.num_experts_per_tok,
                    key_gate="w1", key_up="w3", key_down="w2",
                    key_routing_gate="gate",
                    key_e_score_bias=("expert_bias" if config.use_expert_bias
                                      else None),
                    routing="ds3", norm_topk_prob=True,
                    routed_scaling_factor=config.routed_scaling_factor,
                    qmap="block.mlp", out_dtype=jnp.float32,
                )
            else:
                mlp = GatedMLP(config=config, key=f"{lk}.feed_forward",
                               hidden_size=config.hidden_size,
                               intermediate_size=config.intermediate_size,
                               key_gate="w1", key_up="w3", key_down="w2",
                               qmap="block.mlp", out_dtype=jnp.float32)
            self.modules += [
                TransformerBlock(
                    config=config, key=lk, layer_idx=idx,
                    attn_norm=RMSNorm(config, f"{lk}.operator_norm",
                                      config.rms_norm_eps),
                    attn=attn,
                    mlp_norm=RMSNorm(config, f"{lk}.ffn_norm",
                                     config.rms_norm_eps),
                    mlp=mlp,
                )
            ]
        self.last_kv_module_idx = len(self.modules) - 1
        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("lm_head.weight"):
            head_alt_key = "model.embed_tokens"
        self.modules += [
            RMSNorm(config, "model.embedding_norm", config.rms_norm_eps,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head", in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key, out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1


ARCHITECTURES = [Lfm2MoeConfig]
