"""Gemma 2 / Gemma 3 (text) architectures.

Feature reference: /root/reference/exllamav3/architecture/gemma2.py,
gemma3.py. Gemma RMSNorms use (1 + weight); embeddings scale by
sqrt(hidden); Gemma2 softcaps attention and final logits and alternates
sliding-window layers; Gemma3 adds QK norms and a dual-theta RoPE
(local layers use rope_local_base_freq, global layers a scaled rope).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import (
    Attention,
    Embedding,
    GatedMLP,
    Linear,
    RMSNorm,
    TransformerBlock,
)
from ..util.rope import RopeSettings, RopeStyle


class Gemma2Config(Config):
    arch_string = "Gemma2ForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": Gemma2Model}, **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", 256)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", 1e-6)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", True)
        self.hidden_act = self.read_cfg(str, "hidden_act", "gelu_pytorch_tanh")
        self.attn_logit_softcapping = self.read_cfg(float, "attn_logit_softcapping", 50.0)
        self.final_logit_softcapping = self.read_cfg(float, "final_logit_softcapping", 30.0)
        self.sliding_window = self.read_cfg(int, "sliding_window", 4096)
        self.query_pre_attn_scalar = self.read_cfg(float, "query_pre_attn_scalar",
                                                   self.head_dim)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.NEOX,
                                                             head_dim=self.head_dim)

    def layer_is_sliding(self, idx: int) -> bool:
        return idx % 2 == 0  # Gemma2: even layers slide


class Gemma2Model(Model):
    config_class = Gemma2Config
    use_qk_norm = False

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        h = config.hidden_size
        self.modules += [
            Embedding(config, "model.embed_tokens", config.vocab_size, h,
                      scale=math.sqrt(h))
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"model.layers.{idx}"
            sliding = config.layer_is_sliding(idx)
            rope = self.layer_rope_settings(config, idx, sliding)
            q_norm = k_norm = None
            if self.use_qk_norm:
                q_norm = RMSNorm(config, f"{lk}.self_attn.q_norm",
                                 config.rms_norm_eps, constant_bias=1.0,
                                 dim=config.head_dim)
                k_norm = RMSNorm(config, f"{lk}.self_attn.k_norm",
                                 config.rms_norm_eps, constant_bias=1.0,
                                 dim=config.head_dim)
            self.modules += [
                TransformerBlock(
                    config=config,
                    key=lk,
                    layer_idx=idx,
                    attn_norm=RMSNorm(config, f"{lk}.input_layernorm",
                                      config.rms_norm_eps, constant_bias=1.0),
                    attn=Attention(
                        config=config,
                        key=f"{lk}.self_attn",
                        layer_idx=idx,
                        hidden_size=h,
                        head_dim=config.head_dim,
                        num_q_heads=config.num_q_heads,
                        num_kv_heads=config.num_kv_heads,
                        rope_settings=rope,
                        sm_scale=config.query_pre_attn_scalar ** -0.5,
                        sliding_window=config.sliding_window if sliding else 0,
                        logit_softcap=config.attn_logit_softcapping,
                        q_norm=q_norm,
                        k_norm=k_norm,
                        qmap="block.attn",
                        out_dtype=jnp.float32,
                    ),
                    attn_post_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                           config.rms_norm_eps, constant_bias=1.0),
                    mlp_norm=RMSNorm(config, f"{lk}.pre_feedforward_layernorm",
                                     config.rms_norm_eps, constant_bias=1.0),
                    mlp=GatedMLP(
                        config=config,
                        key=f"{lk}.mlp",
                        hidden_size=h,
                        intermediate_size=config.intermediate_size,
                        qmap="block.mlp",
                        activation=config.hidden_act,
                        out_dtype=jnp.float32,
                    ),
                    mlp_post_norm=RMSNorm(config, f"{lk}.post_feedforward_layernorm",
                                          config.rms_norm_eps, constant_bias=1.0),
                )
            ]
        self.last_kv_module_idx = len(self.modules) - 1
        self.modules += [
            RMSNorm(config, "model.norm", config.rms_norm_eps, constant_bias=1.0,
                    out_dtype=jnp.bfloat16),
            Linear(config, "lm_head", h, config.vocab_size, qmap="block.lm_head",
                   alt_key="model.embed_tokens" if config.tie_word_embeddings else None,
                   softcap=config.final_logit_softcapping, out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1

    @staticmethod
    def layer_rope_settings(config, idx: int, sliding: bool) -> RopeSettings:
        return config.rope_settings


class Gemma3Config(Gemma2Config):
    arch_string = "Gemma3ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        # Gemma3 text configs may nest under "text_config"; flatten handled by
        # read_cfg fallback chains below.
        super().__init__(directory, derived_model={"text": Gemma3Model}, **kwargs)
        self.attn_logit_softcapping = 0.0
        self.final_logit_softcapping = 0.0
        self.sliding_window_pattern = self.read_cfg(int, "sliding_window_pattern", 6)
        self.rope_local_base_freq = self.read_cfg(float, "rope_local_base_freq", 10000.0)

    def layer_is_sliding(self, idx: int) -> bool:
        return (idx + 1) % self.sliding_window_pattern != 0


class Gemma3Model(Gemma2Model):
    config_class = Gemma3Config
    use_qk_norm = True

    @staticmethod
    def layer_rope_settings(config, idx: int, sliding: bool) -> RopeSettings:
        if sliding:
            return RopeSettings(
                head_dim=config.head_dim,
                rope_theta=config.rope_local_base_freq,
                rope_style=RopeStyle.NEOX,
                max_position_embeddings=config.max_position_embeddings,
            )
        return config.rope_settings


ARCHITECTURES = [Gemma2Config, Gemma3Config]
