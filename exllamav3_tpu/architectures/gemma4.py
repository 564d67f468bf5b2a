"""Gemma4 (conditional generation): hybrid SWA/global layers with distinct
head dims and kv-head counts per type, V-norms, optional K-as-V global
layers, per-block layer scalars and unit softmax scale.

Feature reference: /root/reference/exllamav3/architecture/gemma4.py
(Gemma4Config:39, Gemma4TextModel:194, Gemma4VisionModel:480,
Gemma4UnifiedVisionModel:735). Includes the MoE block variant
(enable_moe_block: alt residual channel, router/pre/post norms,
per-expert weight scales) and both vision components; per-layer inputs
(hidden_size_per_layer_input) remain unimplemented.
"""
from __future__ import annotations

import numpy as np
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


def _rope_from_params(rp: dict | None, head_dim: int, default_theta: float,
                      max_pos: int | None) -> RopeSettings:
    rp = dict(rp or {})
    theta = float(rp.pop("rope_theta", default_theta))
    rt = rp.get("rope_type", rp.get("type", "default"))
    scaling = None if (rt == "default" or not rp) else rp
    return RopeSettings(head_dim=head_dim, rope_theta=theta,
                        rope_scaling=scaling,
                        max_position_embeddings=max_pos,
                        rope_style=RopeStyle.NEOX)


class Gemma4Config(Config):
    arch_string = "Gemma4ForConditionalGeneration"

    def __init__(self, directory: str, derived_model: dict | None = None, **kwargs):
        super().__init__(directory,
                         derived_model or {"text": Gemma4TextModel}, **kwargs)
        pre = "text_config->"
        self.num_hidden_layers = self.read_cfg(int, pre + "num_hidden_layers",
                                               no_default)
        self.tie_word_embeddings = self.read_cfg(
            bool, pre + "tie_word_embeddings", False)
        self.head_dim = self.read_cfg(int, pre + "head_dim", no_default)
        self.global_head_dim = self.read_cfg(int, pre + "global_head_dim",
                                             self.head_dim)
        self.hidden_size = self.read_cfg(int, pre + "hidden_size", no_default)
        self.num_q_heads = self.read_cfg(int, pre + "num_attention_heads",
                                         no_default)
        self.num_kv_heads = self.read_cfg(int, pre + "num_key_value_heads",
                                          self.num_q_heads)
        self.num_global_kv_heads = self.read_cfg(
            int, pre + "num_global_key_value_heads", self.num_kv_heads)
        self.attention_k_eq_v = self.read_cfg(bool, pre + "attention_k_eq_v",
                                              False)
        self.layer_types = self.read_cfg(list, pre + "layer_types", no_default)
        assert len(self.layer_types) == self.num_hidden_layers
        self.sliding_window = self.read_cfg(int, pre + "sliding_window", -1)
        self.swa_pattern = [
            self.sliding_window if lt == "sliding_attention" else 0
            for lt in self.layer_types
        ]
        self.assert_cfg(str, pre + "hidden_activation", "gelu_pytorch_tanh",
                        optional=True)
        self.intermediate_size = self.read_cfg(int, pre + "intermediate_size",
                                               no_default)
        self.rms_norm_eps = self.read_cfg(float, pre + "rms_norm_eps",
                                          no_default)
        self.attn_logit_softcapping = self.read_cfg(
            float, pre + "attn_logit_softcapping", 0.0)
        self.final_logit_softcapping = self.read_cfg(
            float, pre + "final_logit_softcapping", 0.0)
        if self.read_cfg(int, pre + "hidden_size_per_layer_input", 0):
            raise NotImplementedError("Gemma4 per-layer inputs not implemented")
        self.enable_moe_block = self.read_cfg(bool, pre + "enable_moe_block",
                                              False)
        self.num_experts = self.read_cfg(int, pre + "num_experts", 0)
        self.num_experts_per_tok = self.read_cfg(int, pre + "top_k_experts", 0)
        self.moe_intermediate_size = self.read_cfg(
            int, pre + "moe_intermediate_size", 0)

        rp = self.read_cfg(dict, pre + "rope_parameters", None) or {}
        self.rope_settings_local = _rope_from_params(
            rp.get("sliding_attention"), self.head_dim, 10000.0,
            self.max_position_embeddings)
        self.rope_settings_global = _rope_from_params(
            rp.get("full_attention"), self.global_head_dim, 1000000.0,
            self.max_position_embeddings)

        vc = self.read_cfg(dict, "vision_config", None)
        if vc and "hidden_size" in vc:
            # classic (non-unified) tower only; the unified embedder
            # (mm_embed_dim keys) is round-2 work
            self.vision_config = vc
            self.model_classes["vision"] = Gemma4VisionModel


class Gemma4TextModel(Model):
    config_class = Gemma4Config

    def __init__(self, config: Gemma4Config,
                 key_prefix: str = "model.language_model", **kwargs):
        super().__init__(config, **kwargs)
        h = config.hidden_size
        # reference scales embeddings by sqrt(hidden) rounded through bf16
        emb_scale = float(np.float32(
            jnp.bfloat16(np.float32(h ** 0.5))))
        self.modules += [
            Embedding(config=config, key=f"{key_prefix}.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=h,
                      scale=emb_scale)
        ]
        self.first_block_idx = len(self.modules)

        use_moe = config.enable_moe_block
        for idx in range(config.num_hidden_layers):
            lk = f"{key_prefix}.layers.{idx}"
            is_full = config.layer_types[idx] == "full_attention"
            hd = config.global_head_dim if is_full else config.head_dim
            attn = Attention(
                config=config,
                key=f"{lk}.self_attn",
                layer_idx=idx,
                hidden_size=h,
                head_dim=hd,
                num_q_heads=config.num_q_heads,
                num_kv_heads=(config.num_global_kv_heads if is_full
                              else config.num_kv_heads),
                rope_settings=(config.rope_settings_global if is_full
                               else config.rope_settings_local),
                logit_softcap=config.attn_logit_softcapping,
                sliding_window=config.swa_pattern[idx],
                use_k_as_v=is_full and config.attention_k_eq_v,
                sm_scale=1.0,
                qmap="block.attn",
                q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                               config.rms_norm_eps, dim=hd),
                k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                               config.rms_norm_eps, dim=hd),
                v_norm=RMSNorm(config, f"{lk}.self_attn.v_norm",
                               config.rms_norm_eps, dim=hd, unweighted=True),
            )
            self.modules += [
                TransformerBlock(
                    config=config,
                    key=lk,
                    layer_idx=idx,
                    key_layer_scalar="layer_scalar",
                    attn_norm=RMSNorm(config, f"{lk}.input_layernorm",
                                      config.rms_norm_eps),
                    attn=attn,
                    attn_post_norm=RMSNorm(
                        config, f"{lk}.post_attention_layernorm",
                        config.rms_norm_eps),
                    mlp_norm=RMSNorm(config, f"{lk}.pre_feedforward_layernorm",
                                     config.rms_norm_eps),
                    mlp=self._build_mlp(config, lk, use_moe),
                    mlp_post_norm=RMSNorm(
                        config, f"{lk}.post_feedforward_layernorm",
                        config.rms_norm_eps),
                )
            ]

        self.last_kv_module_idx = len(self.modules) - 1
        self.modules += [
            RMSNorm(config, f"{key_prefix}.norm", config.rms_norm_eps,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head", in_features=h,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=(f"{key_prefix}.embed_tokens"
                            if config.tie_word_embeddings else None),
                   softcap=config.final_logit_softcapping,
                   out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1

    @staticmethod
    def _build_mlp(config, lk: str, use_moe: bool):
        from ..modules import BlockSparseMLP

        h = config.hidden_size
        dense = GatedMLP(
            config=config,
            key=f"{lk}.mlp",
            hidden_size=h,
            intermediate_size=config.intermediate_size,
            qmap="block.mlp",
            activation="gelu_pytorch_tanh",
        )
        if not use_moe:
            return dense
        # Gemma4 MoE block (reference gemma4.py:320-362): the dense MLP is
        # the shared side (own post norm); the routed side reads the
        # RESIDUAL stream through a constant-scaled router norm with a
        # per-expert weight scale, plus its own pre/post norms
        return BlockSparseMLP(
            config=config,
            key=lk,
            hidden_size=h,
            intermediate_size=config.moe_intermediate_size,
            num_experts=config.num_experts,
            num_experts_per_tok=config.num_experts_per_tok,
            key_expert="experts.{expert_idx}",
            key_gate_up_split="experts.gate_up_proj",
            key_down_split="experts.down_proj",
            key_routing_gate="router.proj",
            key_per_expert_scale="router.per_expert_scale",
            routing="std",
            norm_topk_prob=False,
            activation="gelu_pytorch_tanh",
            qmap="block.moe",
            alt_residual_channel=True,
            shared_experts=dense,
            shared_experts_post_norm=RMSNorm(
                config, f"{lk}.post_feedforward_layernorm_1",
                config.rms_norm_eps),
            router_pre_norm=RMSNorm(
                config, f"{lk}.router.scale", config.rms_norm_eps,
                tensor_suffix=False, constant_scale=h ** -0.5),
            routed_pre_norm=RMSNorm(
                config, f"{lk}.pre_feedforward_layernorm_2",
                config.rms_norm_eps),
            routed_post_norm=RMSNorm(
                config, f"{lk}.post_feedforward_layernorm_2",
                config.rms_norm_eps),
        )

    def default_chat_prompt(self, prompt: str, system_prompt: str | None = None) -> str:
        p = "<bos>"
        if system_prompt:
            p += f"<|turn>system\n{system_prompt}<turn|>\n"
        return p + f"<|turn>user\n{prompt}<turn|>\n<|turn>model\n"


class Gemma4VisionModel:
    """Vision component wrapper for the Gemma4 (non-unified) tower."""

    def __new__(cls, config, **kwargs):
        from ..model.model import Model
        from ..modules.vision_gemma4 import Gemma4VisionTower

        vc = config.vision_config

        class _VisionModel(Model):
            def __init__(self, config, **kw):
                super().__init__(config, **kw)
                self.tower = Gemma4VisionTower(
                    config,
                    depth=int(vc.get("num_hidden_layers", 27)),
                    hidden=int(vc.get("hidden_size", 1152)),
                    heads=int(vc.get("num_attention_heads", 16)),
                    kv_heads=int(vc.get("num_key_value_heads",
                                        vc.get("num_attention_heads", 16))),
                    head_dim=vc.get("head_dim"),
                    intermediate=int(vc.get("intermediate_size", 4304)),
                    patch_size=int(vc.get("patch_size", 16)),
                    pooling_kernel_size=int(vc.get("pooling_kernel_size", 2)),
                    position_embedding_size=int(
                        vc.get("position_embedding_size", 64)),
                    out_hidden=config.hidden_size,
                    eps=float(vc.get("rms_norm_eps", 1e-6)),
                    text_rms_eps=config.rms_norm_eps,
                    rope_theta=float(vc.get("rope_theta", 100.0)),
                    standardize=bool(vc.get("standardize", False)),
                )
                self.modules = [self.tower]

            def get_image_embeddings(self, pixels, text_alias=None):
                import numpy as np
                import jax
                import jax.numpy as jnp
                from ..modules.module import ForwardCtx
                from ..tokenizer.mm_embedding import MMEmbedding

                single = pixels.ndim == 3
                if single:
                    pixels = pixels[None]
                if "vision_fwd" not in self._step_cache:
                    self._step_cache["vision_fwd"] = jax.jit(
                        lambda params, px: self.tower.forward(
                            px, params, ForwardCtx()))
                emb = np.asarray(jax.device_get(self._step_cache["vision_fwd"](
                    self.params, jnp.asarray(pixels, dtype=jnp.float32))))
                out = [MMEmbedding(e, text_alias=text_alias) for e in emb]
                return out[0] if single else out

        return _VisionModel(config, **kwargs)


class Gemma4UnifiedVisionModel:
    """Vision component wrapper for the Gemma4-Unified embedder."""

    def __new__(cls, config, **kwargs):
        from ..model.model import Model
        from ..modules.vision_gemma4 import Gemma4UnifiedVisionEmbedder

        vc = config.vision_config

        class _VisionModel(Model):
            def __init__(self, config, **kw):
                super().__init__(config, **kw)
                self.tower = Gemma4UnifiedVisionEmbedder(
                    config,
                    patch_size=int(vc.get("model_patch_size",
                                          vc.get("patch_size", 16))),
                    mm_embed_dim=int(vc.get("mm_embed_dim", 1152)),
                    output_proj_dims=vc.get("output_proj_dims"),
                    pooling_kernel_size=int(vc.get("pooling_kernel_size", 2)),
                    out_hidden=config.hidden_size,
                    norm_eps=float(vc.get("rms_norm_eps", 1e-6)),
                )
                self.modules = [self.tower]

            def preprocess(self, image):
                """PIL image -> [0, 1] pixels (the patch embedder scales
                to [-1, 1] internally); aspect-preserving resize to a
                multiple of patch*pool."""
                from ..tokenizer.image_processing import preprocess_image

                f = self.tower.patch_size * self.tower.pool_k
                return preprocess_image(image, factor=f, mean=None, std=None)

            def get_image_embeddings_pil(self, image, text_alias=None):
                return self.get_image_embeddings(self.preprocess(image),
                                                 text_alias=text_alias)

            def preprocess(self, image):
                from ..tokenizer.image_processing import (
                    preprocess_image, HALF_MEAN, HALF_STD)

                f = self.tower.patch_size * self.tower.pool_k
                return preprocess_image(image, factor=f, mean=HALF_MEAN,
                                        std=HALF_STD)

            def get_image_embeddings_pil(self, image, text_alias=None):
                return self.get_image_embeddings(self.preprocess(image),
                                                 text_alias=text_alias)

            def get_image_embeddings(self, pixels, text_alias=None):
                import numpy as np
                import jax
                import jax.numpy as jnp
                from ..modules.module import ForwardCtx
                from ..tokenizer.mm_embedding import MMEmbedding

                single = pixels.ndim == 3
                if single:
                    pixels = pixels[None]
                if "vision_fwd" not in self._step_cache:
                    self._step_cache["vision_fwd"] = jax.jit(
                        lambda params, px: self.tower.forward(
                            px, params, ForwardCtx()))
                emb = np.asarray(jax.device_get(self._step_cache["vision_fwd"](
                    self.params, jnp.asarray(pixels, dtype=jnp.float32))))
                out = [MMEmbedding(e, text_alias=text_alias) for e in emb]
                return out[0] if single else out

        return _VisionModel(config, **kwargs)


class Gemma4UnifiedConfig(Gemma4Config):
    arch_string = "Gemma4UnifiedForConditionalGeneration"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, **kwargs)
        vc = self.read_cfg(dict, "vision_config", None)
        if vc and "mm_embed_dim" in vc:
            self.vision_config = vc
            self.model_classes["vision"] = Gemma4UnifiedVisionModel


ARCHITECTURES = [Gemma4Config, Gemma4UnifiedConfig]
