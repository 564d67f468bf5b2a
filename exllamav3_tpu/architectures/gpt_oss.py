"""gpt-oss (GptOssForCausalLM): alternating sliding/full attention with
learned sinks, MoE with clamped-swiglu experts and biased softmax routing.

Feature reference: /root/reference/exllamav3/architecture/gpt_oss.py
(sinks via key_sinks, sliding_window-1 because HF's mask includes the query,
std_bias router, swiglu_oai activation with swiglu_limit, stacked dense
expert tensors experts.gate_up_proj interleaved).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import Attention, BlockSparseMLP, Embedding, Linear, RMSNorm, TransformerBlock
from ..util.rope import RopeStyle


class GptOssConfig(Config):
    arch_string = "GptOssForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": GptOssModel},
                         **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.sliding_window = self.read_cfg(int, "sliding_window", no_default)
        self.layer_types = self.read_cfg(list, "layer_types", no_default)
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.num_experts = self.read_cfg(int, "num_local_experts", no_default)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok",
                                                 no_default)
        self.swiglu_limit = self.read_cfg(float, "swiglu_limit", 7.0)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.NEOX)


class GptOssModel(Model):
    config_class = GptOssConfig

    def __init__(self, config: GptOssConfig, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="model.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"model.layers.{idx}"
            swa = config.layer_types[idx] == "sliding_attention"
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
                        # HF's sliding mask includes the query position
                        sliding_window=config.sliding_window - 1 if swa else 0,
                        has_sinks=True,
                        qmap="block.attn", out_dtype=jnp.float32,
                    ),
                    mlp_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                     config.rms_norm_eps),
                    mlp=BlockSparseMLP(
                        config=config, key=f"{lk}.mlp",
                        hidden_size=config.hidden_size,
                        intermediate_size=config.intermediate_size,
                        num_experts=config.num_experts,
                        num_experts_per_tok=config.num_experts_per_tok,
                        key_routing_gate="router",
                        key_gate_up_split="experts.gate_up_proj",
                        key_down_split="experts.down_proj",
                        gate_up_interleaved=True,
                        routing="std_bias",
                        activation="silu_oai",
                        act_limit=config.swiglu_limit,
                        qmap="block.mlp", out_dtype=jnp.float32,
                    ),
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


ARCHITECTURES = [GptOssConfig]
