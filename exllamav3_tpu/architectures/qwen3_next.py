"""Qwen3-Next: hybrid GatedDeltaNet / gated-attention MoE architecture.

Feature reference: /root/reference/exllamav3/architecture/qwen3_next.py
(Qwen3NextConfig:21, Qwen3NextModel:76). Every full_attention_interval-th
layer is full attention with an interleaved output gate and (1+w) norms; the
rest are GatedDeltaNet linear-attention layers. MLP is MoE with a gated
shared expert. Qwen3.5 ("Qwen3p5ForCausalLM" alias pattern) uses split GDN
projections — covered by the key_qkv/key_z/key_b/key_a path.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import (
    Attention,
    BlockSparseMLP,
    Embedding,
    GatedDeltaNet,
    GatedMLP,
    Linear,
    RMSNorm,
    TransformerBlock,
)
from ..util.rope import RopeStyle


class Qwen3NextConfig(Config):
    arch_string = "Qwen3NextForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": Qwen3NextModel},
                         **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads

        self.full_attention_interval = self.read_cfg(int, "full_attention_interval", 4)
        self.linear_conv_kernel_dim = self.read_cfg(int, "linear_conv_kernel_dim", 4)
        self.linear_num_key_heads = self.read_cfg(int, "linear_num_key_heads", 16)
        self.linear_num_value_heads = self.read_cfg(int, "linear_num_value_heads", 32)
        self.linear_key_head_dim = self.read_cfg(int, "linear_key_head_dim", 128)
        self.linear_value_head_dim = self.read_cfg(int, "linear_value_head_dim", 128)

        self.decoder_sparse_step = self.read_cfg(int, "decoder_sparse_step", 1)
        self.intermediate_size = self.read_cfg(int, "intermediate_size", 0)
        self.moe_intermediate_size = self.read_cfg(int, "moe_intermediate_size",
                                                   no_default)
        self.num_experts = self.read_cfg(int, "num_experts", no_default)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok", no_default)
        self.norm_topk_prob = self.read_cfg(bool, "norm_topk_prob", True)
        self.mlp_only_layers = self.read_cfg(list, "mlp_only_layers", [])
        self.shared_expert_intermediate_size = self.read_cfg(
            int, "shared_expert_intermediate_size", 512)

        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.hidden_act = self.read_cfg(str, "hidden_act", "silu")
        self.rope_settings = self.read_rope_settings_default(RopeStyle.NEOX)


class Qwen3NextModel(Model):
    config_class = Qwen3NextConfig

    def __init__(self, config: Qwen3NextConfig, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="model.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)

        for idx in range(config.num_hidden_layers):
            lk = f"model.layers.{idx}"
            full_attn = (idx + 1) % config.full_attention_interval == 0
            if full_attn:
                attn = Attention(
                    config=config, key=f"{lk}.self_attn", layer_idx=idx,
                    hidden_size=config.hidden_size, head_dim=config.head_dim,
                    num_q_heads=config.num_q_heads,
                    num_kv_heads=config.num_kv_heads,
                    rope_settings=config.rope_settings,
                    qmap="block.attn",
                    q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                                   config.rms_norm_eps, constant_bias=1.0,
                                   dim=config.head_dim),
                    k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                                   config.rms_norm_eps, constant_bias=1.0,
                                   dim=config.head_dim),
                    interleaved_gate=True,
                    out_dtype=jnp.float32,
                )
            else:
                attn = GatedDeltaNet(
                    config=config, key=f"{lk}.linear_attn", layer_idx=idx,
                    hidden_size=config.hidden_size,
                    k_head_dim=config.linear_key_head_dim,
                    v_head_dim=config.linear_value_head_dim,
                    num_k_heads=config.linear_num_key_heads,
                    num_v_heads=config.linear_num_value_heads,
                    rms_norm_eps=config.rms_norm_eps,
                    conv_kernel_size=config.linear_conv_kernel_dim,
                    key_fused_qkvz="in_proj_qkvz",
                    key_fused_ba="in_proj_ba",
                    qmap="block.attn",
                    out_dtype=jnp.float32,
                )
            sparse = (
                config.num_experts > 0
                and idx not in config.mlp_only_layers
                and (config.decoder_sparse_step
                     and (idx + 1) % config.decoder_sparse_step == 0)
            )
            if sparse:
                mlp = BlockSparseMLP(
                    config=config, key=f"{lk}.mlp",
                    hidden_size=config.hidden_size,
                    intermediate_size=config.moe_intermediate_size,
                    num_experts=config.num_experts,
                    num_experts_per_tok=config.num_experts_per_tok,
                    key_routing_gate="gate",
                    key_shared_gate="shared_expert_gate",
                    qmap="block.mlp",
                    activation=config.hidden_act,
                    routing="std_norm",
                    norm_topk_prob=config.norm_topk_prob,
                    shared_experts=GatedMLP(
                        config=config, key=f"{lk}.mlp.shared_expert",
                        hidden_size=config.hidden_size,
                        intermediate_size=config.shared_expert_intermediate_size,
                        qmap="block.mlp", activation=config.hidden_act,
                    ),
                    out_dtype=jnp.float32,
                )
            else:
                mlp = GatedMLP(
                    config=config, key=f"{lk}.mlp",
                    hidden_size=config.hidden_size,
                    intermediate_size=config.intermediate_size,
                    qmap="block.mlp", activation=config.hidden_act,
                    out_dtype=jnp.float32,
                )
            self.modules += [
                TransformerBlock(
                    config=config, key=lk, layer_idx=idx,
                    attn_norm=RMSNorm(config, f"{lk}.input_layernorm",
                                      config.rms_norm_eps, constant_bias=1.0),
                    attn=attn,
                    mlp_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                     config.rms_norm_eps, constant_bias=1.0),
                    mlp=mlp,
                )
            ]
        self.last_kv_module_idx = len(self.modules) - 1

        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("lm_head.weight"):
            head_alt_key = "model.embed_tokens"
        self.modules += [
            RMSNorm(config, "model.norm", config.rms_norm_eps, constant_bias=1.0,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head", in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key, out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1


ARCHITECTURES = [Qwen3NextConfig]
