"""DeciLM (variable-GQA / no-op blocks) and HunYuan-V3.

Feature references: /root/reference/exllamav3/architecture/decilm.py
(block_configs list: per-layer attention no_op / n_heads_in_group and
ffn no_op / ffn_mult with intermediate = int(2*mult*hidden/3)) and
hy_v3.py (qk norms, sigmoid+bias router under router.gate with expert_bias,
shared experts, first_k_dense_replace, router_scaling_factor).
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


class DeciLMConfig(Config):
    arch_string = "DeciLMForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": DeciLMModel},
                         **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.NEOX)
        self.block_configs = self.read_cfg(list, "block_configs", no_default)
        assert len(self.block_configs) == self.num_hidden_layers


class DeciLMModel(Model):
    config_class = DeciLMConfig

    def __init__(self, config: DeciLMConfig, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="model.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        self.last_kv_module_idx = 0
        for idx, bc in enumerate(config.block_configs):
            cfg_attn, cfg_ffn = bc["attention"], bc["ffn"]
            lk = f"model.layers.{idx}"
            attn_norm = attn = mlp_norm = mlp = None
            if not cfg_attn.get("no_op"):
                attn_norm = RMSNorm(config, f"{lk}.input_layernorm",
                                    config.rms_norm_eps)
                attn = Attention(
                    config=config, key=f"{lk}.self_attn", layer_idx=idx,
                    hidden_size=config.hidden_size, head_dim=config.head_dim,
                    num_q_heads=config.num_q_heads,
                    num_kv_heads=config.num_q_heads // cfg_attn["n_heads_in_group"],
                    rope_settings=config.rope_settings,
                    qmap="block.attn", out_dtype=jnp.float32,
                )
                self.last_kv_module_idx = len(self.modules)
            if not cfg_ffn.get("no_op"):
                interm = int(2 * cfg_ffn["ffn_mult"] * config.hidden_size / 3)
                mlp_norm = RMSNorm(config, f"{lk}.post_attention_layernorm",
                                   config.rms_norm_eps)
                mlp = GatedMLP(config=config, key=f"{lk}.mlp",
                               hidden_size=config.hidden_size,
                               intermediate_size=interm,
                               qmap="block.mlp", out_dtype=jnp.float32)
            self.modules += [
                TransformerBlock(config=config, key=lk, layer_idx=idx,
                                 attn_norm=attn_norm, attn=attn,
                                 mlp_norm=mlp_norm, mlp=mlp)
            ]
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


class HYV3Config(Config):
    arch_string = "HYV3ForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": HYV3Model},
                         **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.use_qk_norm = self.read_cfg(bool, "qk_norm", True)
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.moe_intermediate_size = self.read_cfg(int, "moe_intermediate_size",
                                                   no_default)
        self.num_shared_experts = self.read_cfg(int, "num_shared_experts", 1)
        self.num_experts = self.read_cfg(int, "num_experts", 192)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok", 8)
        self.first_k_dense_replace = self.read_cfg(int, "first_k_dense_replace", 1)
        self.routed_scaling_factor = self.read_cfg(float, "router_scaling_factor",
                                                   2.826)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.NEOX)


class HYV3Model(Model):
    config_class = HYV3Config

    def __init__(self, config: HYV3Config, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="model.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        qk = config.use_qk_norm
        for idx in range(config.num_hidden_layers):
            lk = f"model.layers.{idx}"
            if idx < config.first_k_dense_replace:
                mlp = GatedMLP(config=config, key=f"{lk}.mlp",
                               hidden_size=config.hidden_size,
                               intermediate_size=config.intermediate_size,
                               qmap="block.mlp", out_dtype=jnp.float32)
            else:
                mlp = BlockSparseMLP(
                    config=config, key=f"{lk}.mlp",
                    hidden_size=config.hidden_size,
                    intermediate_size=config.moe_intermediate_size,
                    num_experts=config.num_experts,
                    num_experts_per_tok=config.num_experts_per_tok,
                    key_routing_gate="router.gate",
                    key_e_score_bias="expert_bias",
                    routing="ds3", norm_topk_prob=True,
                    routed_scaling_factor=config.routed_scaling_factor,
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
            head_alt_key = "model.embed_tokens"
        self.modules += [
            RMSNorm(config, "model.norm", config.rms_norm_eps,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head", in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key, out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1


ARCHITECTURES = [DeciLMConfig, HYV3Config]
