"""GLM-4 family: Glm4 (dense), Glm4Moe (GLM-4.5/Air), SolarOpenMoe.

Feature reference: /root/reference/exllamav3/architecture/glm4.py (GPTJ
partial rope, post-attn/post-MLP norms), glm4_moe.py (optional qk norms,
DeepSeek-style sigmoid router with correction bias, first_k_dense_replace,
shared experts), solar_open_moe.py (Glm4Moe subclass).
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


class Glm4Config(Config):
    arch_string = "Glm4ForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": Glm4Model}, **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.GPTJ)


class Glm4Model(Model):
    config_class = Glm4Config

    def __init__(self, config: Glm4Config, key_prefix: str = "model", **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key=f"{key_prefix}.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"{key_prefix}.layers.{idx}"
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
                        qmap="block.attn",
                    ),
                    attn_post_norm=RMSNorm(config, f"{lk}.post_self_attn_layernorm",
                                           config.rms_norm_eps),
                    mlp_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                     config.rms_norm_eps),
                    mlp=GatedMLP(config=config, key=f"{lk}.mlp",
                                 hidden_size=config.hidden_size,
                                 intermediate_size=config.intermediate_size,
                                 qmap="block.mlp", activation="silu"),
                    mlp_post_norm=RMSNorm(config, f"{lk}.post_mlp_layernorm",
                                          config.rms_norm_eps,
                                          out_dtype=jnp.float32),
                )
            ]
        self.last_kv_module_idx = len(self.modules) - 1
        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("lm_head.weight"):
            head_alt_key = f"{key_prefix}.embed_tokens"
        self.modules += [
            RMSNorm(config, f"{key_prefix}.norm", config.rms_norm_eps,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head", in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key, out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1


class Glm4MoeConfig(Config):
    arch_string = "Glm4MoeForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": Glm4MoeModel},
                         **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.use_qk_norm = self.read_cfg(bool, "use_qk_norm", False)
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.moe_intermediate_size = self.read_cfg(int, "moe_intermediate_size",
                                                   no_default)
        self.num_shared_experts = self.read_cfg(int, "n_shared_experts", 1)
        self.num_experts = self.read_cfg(int, "n_routed_experts", 128)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok", 8)
        self.first_k_dense_replace = self.read_cfg(int, "first_k_dense_replace", 3)
        self.routed_scaling_factor = self.read_cfg(float, "routed_scaling_factor", 2.5)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.NEOX)


class Glm4MoeModel(Model):
    config_class = Glm4MoeConfig

    def __init__(self, config: Glm4MoeConfig, key_prefix: str = "model", **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key=f"{key_prefix}.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        qk = config.use_qk_norm
        for idx in range(config.num_hidden_layers):
            lk = f"{key_prefix}.layers.{idx}"
            if idx < config.first_k_dense_replace:
                mlp = GatedMLP(config=config, key=f"{lk}.mlp",
                               hidden_size=config.hidden_size,
                               intermediate_size=config.intermediate_size,
                               qmap="block.mlp", activation="silu",
                               out_dtype=jnp.float32)
            else:
                mlp = BlockSparseMLP(
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
                        qmap="block.attn",
                        q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                                       config.rms_norm_eps,
                                       dim=config.head_dim) if qk else None,
                        k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                                       config.rms_norm_eps,
                                       dim=config.head_dim) if qk else None,
                        out_dtype=jnp.float32,
                    ),
                    mlp_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                     config.rms_norm_eps),
                    mlp=mlp,
                )
            ]
        self.last_kv_module_idx = len(self.modules) - 1
        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("lm_head.weight"):
            head_alt_key = f"{key_prefix}.embed_tokens"
        self.modules += [
            RMSNorm(config, f"{key_prefix}.norm", config.rms_norm_eps,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head", in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key, out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1


class SolarOpenMoeConfig(Glm4MoeConfig):
    arch_string = "SolarOpenForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": SolarOpenMoeModel},
                         **kwargs)


class SolarOpenMoeModel(Glm4MoeModel):
    config_class = SolarOpenMoeConfig


ARCHITECTURES = [Glm4Config, Glm4MoeConfig, SolarOpenMoeConfig]
