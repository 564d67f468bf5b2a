"""OlmoHybrid: GDN linear-attention hybrid with post-norm attention layers.

Feature reference: /root/reference/exllamav3/architecture/olmohybrid.py
(OlmoHybridForCausalLM — GDN layers use pre-norms, full-attention layers use
POST norms; per-q/k/v conv weights; separate q/k/v projection fallback;
beta_scale 2.0 under linear_allow_neg_eigval; span-head qk norms;
GDN gated norm key o_norm, hardcoded 1e-5 eps).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import (
    Attention,
    Embedding,
    GatedDeltaNet,
    GatedMLP,
    Linear,
    RMSNorm,
    TransformerBlock,
)
from ..util.rope import RopeStyle
from .qwen3_5 import read_hybrid_layer_types


class OlmoHybridConfig(Config):
    arch_string = "OlmoHybridForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": OlmoHybridModel},
                         **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.full_attention_interval = self.read_cfg(int, "full_attention_interval", 4)
        self.linear_allow_neg_eigval = self.read_cfg(bool, "linear_allow_neg_eigval",
                                                     False)
        self.linear_conv_kernel_dim = self.read_cfg(int, "linear_conv_kernel_dim", 4)
        self.linear_num_key_heads = self.read_cfg(int, "linear_num_key_heads", 16)
        self.linear_num_value_heads = self.read_cfg(int, "linear_num_value_heads", 32)
        self.linear_key_head_dim = self.read_cfg(int, "linear_key_head_dim", 128)
        self.linear_value_head_dim = self.read_cfg(int, "linear_value_head_dim", 128)
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.layer_types = read_hybrid_layer_types(
            self, self.num_hidden_layers, self.full_attention_interval)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.NEOX)


class OlmoHybridModel(Model):
    config_class = OlmoHybridConfig

    def __init__(self, config: OlmoHybridConfig, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="model.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"model.layers.{idx}"
            linear = config.layer_types[idx] == "linear_attention"
            post_norms = not linear
            if linear:
                attn = GatedDeltaNet(
                    config=config, key=f"{lk}.linear_attn", layer_idx=idx,
                    hidden_size=config.hidden_size,
                    k_head_dim=config.linear_key_head_dim,
                    v_head_dim=config.linear_value_head_dim,
                    num_k_heads=config.linear_num_key_heads,
                    num_v_heads=config.linear_num_value_heads,
                    rms_norm_eps=1e-5,  # hardcoded in the reference
                    conv_kernel_size=config.linear_conv_kernel_dim,
                    beta_scale=2.0 if config.linear_allow_neg_eigval else 1.0,
                    key_conv1d_q="q_conv1d", key_conv1d_k="k_conv1d",
                    key_conv1d_v="v_conv1d",
                    key_qkv="in_proj_qkv",
                    key_qkv_alt=["q_proj", "k_proj", "v_proj"],
                    key_z="g_proj", key_b="b_proj", key_a="a_proj",
                    key_norm="o_norm",
                    qmap="block.attn", out_dtype=jnp.float32,
                )
            else:
                attn = Attention(
                    config=config, key=f"{lk}.self_attn", layer_idx=idx,
                    hidden_size=config.hidden_size, head_dim=config.head_dim,
                    num_q_heads=config.num_q_heads,
                    num_kv_heads=config.num_kv_heads,
                    rope_settings=config.rope_settings,
                    qmap="block.attn",
                    q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                                   config.rms_norm_eps, span_heads=True,
                                   dim=config.num_q_heads * config.head_dim),
                    k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                                   config.rms_norm_eps, span_heads=True,
                                   dim=config.num_kv_heads * config.head_dim),
                    out_dtype=jnp.float32,
                )
            self.modules += [
                TransformerBlock(
                    config=config, key=lk, layer_idx=idx,
                    attn_norm=(None if post_norms else
                               RMSNorm(config, f"{lk}.input_layernorm",
                                       config.rms_norm_eps)),
                    attn_post_norm=(RMSNorm(config, f"{lk}.post_attention_layernorm",
                                            config.rms_norm_eps)
                                    if post_norms else None),
                    attn=attn,
                    mlp_norm=(None if post_norms else
                              RMSNorm(config, f"{lk}.post_attention_layernorm",
                                      config.rms_norm_eps)),
                    mlp_post_norm=(RMSNorm(config, f"{lk}.post_feedforward_layernorm",
                                           config.rms_norm_eps,
                                           out_dtype=jnp.float32)
                                   if post_norms else None),
                    mlp=GatedMLP(config=config, key=f"{lk}.mlp",
                                 hidden_size=config.hidden_size,
                                 intermediate_size=config.intermediate_size,
                                 qmap="block.mlp", out_dtype=jnp.float32),
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


ARCHITECTURES = [OlmoHybridConfig]
