"""Llama-derived architectures with small structural twists.

Feature references (all under /root/reference/exllamav3/architecture/):
seedoss.py, mimo.py, iquestcoder.py, ministral3.py, arcee.py, apertus.py,
smollm3.py, exaone4.py, olmo3.py. Trivial aliases subclass LlamaModel;
post-norm-only and per-layer rope/sliding variants build their own block
loops.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import (
    Attention,
    Embedding,
    GatedMLP,
    Linear,
    MLP,
    RMSNorm,
    TransformerBlock,
)
from ..util.rope import RopeStyle
from .llama import LlamaConfig, LlamaModel


# -- trivial aliases -----------------------------------------------------------

class SeedOssConfig(LlamaConfig):
    arch_string = "SeedOssForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": SeedOssModel}, **kwargs)


class SeedOssModel(LlamaModel):
    config_class = SeedOssConfig


class MiMoConfig(LlamaConfig):
    """MTP layers ignored at base-model level (reference mimo.py)."""

    arch_string = "MiMoForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": MiMoModel}, **kwargs)


class MiMoModel(LlamaModel):
    config_class = MiMoConfig


class IQuestCoderConfig(LlamaConfig):
    arch_string = "IQuestCoderForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": IQuestCoderModel},
                         **kwargs)


class IQuestCoderModel(LlamaModel):
    config_class = IQuestCoderConfig


class Ministral3Config(LlamaConfig):
    arch_string = "Ministral3ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Ministral3Model},
                         **kwargs)


class Ministral3Model(LlamaModel):
    config_class = Ministral3Config


# -- Arcee: relu2 non-gated MLP -------------------------------------------------

class ArceeConfig(LlamaConfig):
    arch_string = "ArceeForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": ArceeModel}, **kwargs)


class ArceeModel(LlamaModel):
    config_class = ArceeConfig

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        for m in self.modules:
            if isinstance(m, TransformerBlock) and m.mlp is not None:
                m.mlp = MLP(config=config, key=f"{m.key}.mlp",
                            hidden_size=config.hidden_size,
                            intermediate_size=config.intermediate_size,
                            activation="relu2", qmap="block.mlp",
                            out_dtype=jnp.float32)
                m.modules = [x for x in (m.attn_norm, m.attn, m.attn_post_norm,
                                         m.mlp_norm, m.mlp, m.mlp_post_norm) if x]


# -- Apertus: xIELU non-gated MLP with learnable alphas, qk norms ----------------

class ApertusConfig(LlamaConfig):
    arch_string = "ApertusForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": ApertusModel}, **kwargs)


class ApertusModel(LlamaModel):
    config_class = ApertusConfig
    use_qk_norm = True

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        for m in self.modules:
            if isinstance(m, TransformerBlock) and m.mlp is not None:
                m.mlp = MLP(config=config, key=f"{m.key}.mlp",
                            hidden_size=config.hidden_size,
                            intermediate_size=config.intermediate_size,
                            activation="xielu", qmap="block.mlp",
                            out_dtype=jnp.float32)
                m.modules = [x for x in (m.attn_norm, m.attn, m.attn_post_norm,
                                         m.mlp_norm, m.mlp, m.mlp_post_norm) if x]


# -- SmolLM3: NoPE on selected layers -------------------------------------------

class SmolLM3Config(LlamaConfig):
    arch_string = "SmolLM3ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": SmolLM3Model}, **kwargs)
        self.no_rope_layers = self.read_cfg(list, "no_rope_layers", no_default)


class SmolLM3Model(LlamaModel):
    config_class = SmolLM3Config

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        for m in self.modules:
            if isinstance(m, TransformerBlock) and m.attn is not None:
                # no_rope_layers: 1 = rope, 0 = NoPE (HF convention)
                if not config.no_rope_layers[m.layer_idx]:
                    m.attn.rope = None


# -- Exaone4: post-norm-only blocks, hybrid sliding window -----------------------

def read_swa_pattern(config, key_prefix: str = "") -> list:
    """Per-layer sliding windows from layer_types / sliding_window_pattern
    (reference exaone4.py:34-70, cohere2.py:34-60). -1 = full attention."""
    pre = key_prefix
    sliding_window = config.read_cfg(int, pre + "sliding_window", -1)
    layer_types = config.read_cfg(list, pre + "layer_types", None)
    n = config.num_hidden_layers
    if layer_types:
        return [sliding_window if t == "sliding_attention" else -1
                for t in layer_types]
    pat = config.read_cfg(str, pre + "sliding_window_pattern", None)
    if isinstance(pat, str) and pat:
        return [sliding_window if pat[i % len(pat)] == "L" else -1
                for i in range(n)]
    ipat = config.read_cfg(int, pre + "sliding_window_pattern", None)
    if ipat:
        return [sliding_window if (i + 1) % ipat != 0 else -1 for i in range(n)]
    return [sliding_window if sliding_window > 0 else -1] * n


class Exaone4Config(LlamaConfig):
    arch_string = "Exaone4ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Exaone4Model}, **kwargs)
        self.swa_pattern = read_swa_pattern(self)


class Exaone4Model(Model):
    """Post-norms only: h = x + post_norm(attn(x)) (reference exaone4.py:108)."""

    config_class = Exaone4Config

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="model.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"model.layers.{idx}"
            swa = config.swa_pattern[idx]
            self.modules += [
                TransformerBlock(
                    config=config, key=lk, layer_idx=idx,
                    attn=Attention(
                        config=config, key=f"{lk}.self_attn", layer_idx=idx,
                        hidden_size=config.hidden_size, head_dim=config.head_dim,
                        num_q_heads=config.num_q_heads,
                        num_kv_heads=config.num_kv_heads,
                        # rope on sliding layers only; global layers are NoPE
                        rope_settings=config.rope_settings if swa >= 0 else None,
                        sliding_window=swa,
                        qmap="block.attn",
                        q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                                       config.rms_norm_eps, dim=config.head_dim),
                        k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                                       config.rms_norm_eps, dim=config.head_dim),
                    ),
                    attn_post_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                           config.rms_norm_eps),
                    mlp=GatedMLP(config=config, key=f"{lk}.mlp",
                                 hidden_size=config.hidden_size,
                                 intermediate_size=config.intermediate_size,
                                 qmap="block.mlp", activation=config.hidden_act),
                    mlp_post_norm=RMSNorm(config, f"{lk}.post_feedforward_layernorm",
                                          config.rms_norm_eps, out_dtype=jnp.float32),
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


# -- Olmo3: post-norm blocks, span-head qk norms, per-layer rope ------------------

class Olmo3Config(LlamaConfig):
    arch_string = "Olmo3ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Olmo3Model}, **kwargs)
        self.swa_pattern = read_swa_pattern(self)
        # sliding layers use unscaled rope (reference olmo3.py:58)
        self.rope_settings_swa = self.read_rope_settings_default(
            RopeStyle.NEOX, override_type="default")


class Olmo3Model(Model):
    config_class = Olmo3Config

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="model.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"model.layers.{idx}"
            swa = config.swa_pattern[idx]
            self.modules += [
                TransformerBlock(
                    config=config, key=lk, layer_idx=idx,
                    attn=Attention(
                        config=config, key=f"{lk}.self_attn", layer_idx=idx,
                        hidden_size=config.hidden_size, head_dim=config.head_dim,
                        num_q_heads=config.num_q_heads,
                        num_kv_heads=config.num_kv_heads,
                        rope_settings=(config.rope_settings if swa < 0
                                       else config.rope_settings_swa),
                        sliding_window=swa,
                        qmap="block.attn",
                        q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                                       config.rms_norm_eps, span_heads=True,
                                       dim=config.num_q_heads * config.head_dim),
                        k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                                       config.rms_norm_eps, span_heads=True,
                                       dim=config.num_kv_heads * config.head_dim),
                    ),
                    attn_post_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                           config.rms_norm_eps),
                    mlp=GatedMLP(config=config, key=f"{lk}.mlp",
                                 hidden_size=config.hidden_size,
                                 intermediate_size=config.intermediate_size,
                                 qmap="block.mlp", activation=config.hidden_act),
                    mlp_post_norm=RMSNorm(config, f"{lk}.post_feedforward_layernorm",
                                          config.rms_norm_eps, out_dtype=jnp.float32),
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


ARCHITECTURES = [SeedOssConfig, MiMoConfig, IQuestCoderConfig, Ministral3Config,
                 ArceeConfig, ApertusConfig, SmolLM3Config, Exaone4Config,
                 Olmo3Config]
