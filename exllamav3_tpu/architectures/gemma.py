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

    def __init__(self, config, key_prefix: str = "model", head_key: str = "lm_head",
                 **kwargs):
        super().__init__(config, **kwargs)
        h = config.hidden_size
        self.modules += [
            Embedding(config, f"{key_prefix}.embed_tokens", config.vocab_size, h,
                      scale=math.sqrt(h))
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"{key_prefix}.layers.{idx}"
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
            RMSNorm(config, f"{key_prefix}.norm", config.rms_norm_eps, constant_bias=1.0,
                    out_dtype=jnp.bfloat16),
            Linear(config, head_key, h, config.vocab_size, qmap="block.lm_head",
                   alt_key=(f"{key_prefix}.embed_tokens"
                            if config.tie_word_embeddings else None),
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


class Gemma3VLConfig(Gemma3Config):
    """Gemma3 multimodal: SigLIP tower + projector + text model under the
    language_model prefix (reference architecture/gemma3.py conditional
    variant). Text params resolve through the text_config fallback."""

    arch_string = "Gemma3ForConditionalGeneration"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, **kwargs)
        self.model_classes = {"text": Gemma3VLModel,
                              "vision": Gemma3VisionModel}
        vc = self.read_cfg(dict, "vision_config", {}) or {}
        self.vision_hidden = int(vc.get("hidden_size", 1152))
        self.vision_heads = int(vc.get("num_attention_heads", 16))
        self.vision_layers = int(vc.get("num_hidden_layers", 27))
        self.vision_intermediate = int(vc.get("intermediate_size", 4304))
        self.vision_image_size = int(vc.get("image_size", 896))
        self.vision_patch_size = int(vc.get("patch_size", 14))
        self.vision_eps = float(vc.get("layer_norm_eps", 1e-6))
        self.mm_tokens_per_image = self.read_cfg(int, "mm_tokens_per_image", 256)
        self.image_token_id = self.read_cfg(int, "image_token_index", 262144)


class Gemma3VLModel(Gemma3Model):
    config_class = Gemma3VLConfig

    def __init__(self, config, **kwargs):
        super().__init__(config, key_prefix="language_model.model",
                         head_key="language_model.lm_head", **kwargs)


class Gemma3VisionModel(Model):
    """Vision component: tower + projector; get_image_embeddings() returns
    text-hidden-size embeddings ready to wrap in an MMEmbedding."""

    config_class = Gemma3VLConfig

    def __init__(self, config: Gemma3VLConfig, **kwargs):
        super().__init__(config, **kwargs)
        from ..modules.vision import SiglipVisionTower, Gemma3MultimodalProjector

        self.tower = SiglipVisionTower(
            config, hidden=config.vision_hidden, heads=config.vision_heads,
            layers=config.vision_layers,
            intermediate=config.vision_intermediate,
            image_size=config.vision_image_size,
            patch_size=config.vision_patch_size, eps=config.vision_eps)
        self.projector = Gemma3MultimodalProjector(
            config, vision_hidden=config.vision_hidden,
            text_hidden=config.hidden_size,
            patches_per_side=self.tower.patches_per_side,
            mm_tokens_per_image=config.mm_tokens_per_image)
        self.modules = [self.tower, self.projector]

    def get_image_embeddings(self, pixels, text_alias: str | None = None):
        """pixels: (H, W, 3) or (B, H, W, 3) f32 in [-1, 1] (SigLIP
        normalization). Returns MMEmbedding (or list for a batch)."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from ..modules.module import ForwardCtx
        from ..tokenizer.mm_embedding import MMEmbedding

        single = pixels.ndim == 3
        if single:
            pixels = pixels[None]
        if "vision_fwd" not in self._step_cache:

            def fn(params, px):
                ctx = ForwardCtx()
                h = self.tower.forward(px, params, ctx)
                return self.projector.forward(h, params, ctx)

            self._step_cache["vision_fwd"] = jax.jit(fn)
        emb = np.asarray(jax.device_get(self._step_cache["vision_fwd"](
            self.params, jnp.asarray(pixels, dtype=jnp.float32))))
        out = [MMEmbedding(e, text_alias=text_alias) for e in emb]
        return out[0] if single else out


ARCHITECTURES = [Gemma2Config, Gemma3Config, Gemma3VLConfig]
