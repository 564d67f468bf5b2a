"""Cohere (Command-R) and Cohere2 (Command-R7B/A) architectures.

Feature reference: /root/reference/exllamav3/architecture/cohere.py,
cohere2.py. Parallel decoder blocks (one LayerNorm feeds attention and MLP
simultaneously), GPTJ rope, tied embeddings, logits scaled by logit_scale.
Cohere2 interleaves sliding-window layers; global layers are NoPE.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import Attention, Embedding, GatedMLP, LayerNorm, Linear
from ..modules.transformer import ParallelDecoderBlock
from ..util.rope import RopeStyle
from .llama_variants import read_swa_pattern


class CohereConfig(Config):
    arch_string = "CohereForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": CohereModel},
                         **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.use_qk_norm = self.read_cfg(bool, "use_qk_norm", False)
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.layernorm_eps = self.read_cfg(float, "layer_norm_eps", 1e-5)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", True)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.GPTJ)
        self.logit_scale = self.read_cfg(float, "logit_scale", 0.0625)
        self.swa_pattern = [-1] * self.num_hidden_layers


class Cohere2Config(CohereConfig):
    arch_string = "Cohere2ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Cohere2Model}, **kwargs)
        self.swa_pattern = read_swa_pattern(self)


class CohereModel(Model):
    config_class = CohereConfig
    # Cohere2: rope on sliding layers only (global layers NoPE)
    nope_global = False

    def __init__(self, config: CohereConfig, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="model.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"model.layers.{idx}"
            swa = config.swa_pattern[idx]
            rope = config.rope_settings
            if self.nope_global and swa < 0:
                rope = None
            qk = config.use_qk_norm
            self.modules += [
                ParallelDecoderBlock(
                    config=config, key=lk, layer_idx=idx,
                    input_norm=LayerNorm(config, f"{lk}.input_layernorm",
                                         config.layernorm_eps),
                    attn=Attention(
                        config=config, key=f"{lk}.self_attn", layer_idx=idx,
                        hidden_size=config.hidden_size, head_dim=config.head_dim,
                        num_q_heads=config.num_q_heads,
                        num_kv_heads=config.num_kv_heads,
                        rope_settings=rope, sliding_window=swa,
                        qmap="block.parallel",
                        q_norm=LayerNorm(config, f"{lk}.self_attn.q_norm",
                                         config.layernorm_eps,
                                         dim=config.head_dim) if qk else None,
                        k_norm=LayerNorm(config, f"{lk}.self_attn.k_norm",
                                         config.layernorm_eps,
                                         dim=config.head_dim) if qk else None,
                        out_dtype=jnp.float32,
                    ),
                    mlp=GatedMLP(config=config, key=f"{lk}.mlp",
                                 hidden_size=config.hidden_size,
                                 intermediate_size=config.intermediate_size,
                                 qmap="block.parallel", activation="silu",
                                 out_dtype=jnp.float32),
                )
            ]
        self.last_kv_module_idx = len(self.modules) - 1
        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("lm_head.weight"):
            head_alt_key = "model.embed_tokens"
        self.modules += [
            LayerNorm(config, "model.norm", config.layernorm_eps,
                      out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head", in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key, post_scale=config.logit_scale,
                   out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1


class Cohere2Model(CohereModel):
    config_class = Cohere2Config
    nope_global = True


ARCHITECTURES = [CohereConfig, Cohere2Config]
