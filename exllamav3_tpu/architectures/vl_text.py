"""Text sides of the multimodal (ForConditionalGeneration) architectures.

Feature reference: /root/reference/exllamav3/architecture/qwen2_5_vl.py:150,
qwen3_vl.py:149, glm4v.py:134, mistral3.py:153 — each wraps its base text
model under a language_model key prefix; text params resolve through the
text_config fallback (model/config.py _walk). Vision towers are implemented:
SigLIP/Gemma3 (modules/vision.py), Qwen-VL window attention
(modules/vision_qwen.py), Pixtral (modules/vision_pixtral.py); images can
also be fed as precomputed MMEmbedding payloads.

Text-only MRoPE note: with no image grid every t/h/w position stream equals
the token index, which makes mrope identical to standard NEOX rope, so the
base models' rope is exact for text.
"""
from __future__ import annotations

from .llama import LlamaConfig, LlamaModel, Qwen2Config, Qwen2Model, Qwen3Model
from .glm import Glm4Config, Glm4Model, Glm4MoeConfig, Glm4MoeModel
from .moe import Qwen3MoeConfig, Qwen3MoeModel


class Qwen25VLConfig(LlamaConfig):
    arch_string = "Qwen2_5_VLForConditionalGeneration"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Qwen25VLModel},
                         **kwargs)
        vc = self.read_cfg(dict, "vision_config", None)
        if vc:
            self.vision_config = vc
            self.model_classes["vision"] = Qwen25VLVisionModel


class Qwen25VLModel(Qwen2Model):
    config_class = Qwen25VLConfig

    def __init__(self, config, **kwargs):
        super().__init__(config, key_prefix="model.language_model", **kwargs)


class Qwen25VLVisionModel:
    """Vision component wrapper (Model-like) for the Qwen2.5-VL tower."""

    def __new__(cls, config, **kwargs):
        from ..model.model import Model
        from ..modules.vision_qwen import Qwen25VisionTower

        vc = config.vision_config

        class _VisionModel(Model):
            def __init__(self, config, **kw):
                super().__init__(config, **kw)
                self.tower = Qwen25VisionTower(
                    config, key="model.visual",
                    depth=int(vc.get("depth", 32)),
                    hidden=int(vc.get("hidden_size", 1280)),
                    heads=int(vc.get("num_heads", 16)),
                    intermediate=int(vc.get("intermediate_size", 3420)),
                    patch_size=int(vc.get("patch_size", 14)),
                    temporal_patch_size=int(vc.get("temporal_patch_size", 2)),
                    spatial_merge_size=int(vc.get("spatial_merge_size", 2)),
                    window_size=int(vc.get("window_size", 112)),
                    fullatt_block_indexes=tuple(
                        vc.get("fullatt_block_indexes", (7, 15, 23, 31))),
                    out_hidden=int(vc.get("out_hidden_size",
                                          config.hidden_size)),
                )
                self.modules = [self.tower]


            def preprocess(self, image):
                """PIL image (or raw array) -> normalized pixels for
                get_image_embeddings (CLIP statistics, smart resize)."""
                from ..tokenizer.image_processing import preprocess_image

                f = self.tower.patch_size * self.tower.merge
                return preprocess_image(image, factor=f)

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
                P = self.tower.patch_size
                grid = (1, pixels.shape[1] // P, pixels.shape[2] // P)
                out = [MMEmbedding(e, text_alias=text_alias, grid_thw=grid,
                                   mrope_merge_size=self.tower.merge)
                       for e in emb]
                return out[0] if single else out

        return _VisionModel(config, **kwargs)


def _insert_deepstack(model, n_ds: int, vocab_size: int):
    """Insert DeepstackEmbed modules after the first n_ds transformer blocks
    (reference qwen3_vl.py text side / qwen3_5.py:442)."""
    from ..modules.deepstack import DeepstackEmbed
    from ..modules.transformer import TransformerBlock

    out = []
    for m in model.modules:
        out.append(m)
        if isinstance(m, TransformerBlock) and m.layer_idx < n_ds:
            out.append(DeepstackEmbed(
                model.config, f"{m.key}.deepstack_embed",
                deepstack_index=m.layer_idx, vocab_size=vocab_size))
    inserted = len(out) - len(model.modules)
    model.modules = out
    model.last_kv_module_idx += inserted
    model.logit_layer_idx += inserted


class Qwen3VLConfig(LlamaConfig):
    arch_string = "Qwen3VLForConditionalGeneration"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Qwen3VLModel},
                         **kwargs)
        vc = self.read_cfg(dict, "vision_config", None)
        if vc:
            self.vision_config = vc
            self.model_classes["vision"] = Qwen3VLVisionModel


class Qwen3VLModel(Qwen3Model):
    config_class = Qwen3VLConfig

    def __init__(self, config, **kwargs):
        super().__init__(config, key_prefix="model.language_model", **kwargs)
        vc = getattr(config, "vision_config", None)
        if vc:
            _insert_deepstack(
                self, len(vc.get("deepstack_visual_indexes", [8, 16, 24])),
                config.vocab_size)


class Qwen3VLVisionModel:
    """Vision component wrapper for the Qwen3-VL tower (deepstack taps)."""

    def __new__(cls, config, **kwargs):
        from ..model.model import Model
        from ..modules.vision_qwen import Qwen3VisionTower

        vc = config.vision_config

        class _VisionModel(Model):
            def __init__(self, config, **kw):
                super().__init__(config, **kw)
                self.tower = Qwen3VisionTower(
                    config, key="model.visual",
                    depth=int(vc.get("depth", 27)),
                    hidden=int(vc.get("hidden_size", 1152)),
                    heads=int(vc.get("num_heads", 16)),
                    intermediate=int(vc.get("intermediate_size", 4304)),
                    patch_size=int(vc.get("patch_size", 16)),
                    temporal_patch_size=int(vc.get("temporal_patch_size", 2)),
                    spatial_merge_size=int(vc.get("spatial_merge_size", 2)),
                    out_hidden=int(vc.get("out_hidden_size",
                                          config.hidden_size)),
                    num_position_embeddings=int(
                        vc.get("num_position_embeddings", 2304)),
                    deepstack_visual_indexes=tuple(
                        vc.get("deepstack_visual_indexes", (8, 16, 24))),
                )
                self.modules = [self.tower]


            def preprocess(self, image):
                """PIL image (or raw array) -> normalized pixels for
                get_image_embeddings (CLIP statistics, smart resize)."""
                from ..tokenizer.image_processing import preprocess_image

                f = self.tower.patch_size * self.tower.merge
                return preprocess_image(image, factor=f)

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
                main, ds = self._step_cache["vision_fwd"](
                    self.params, jnp.asarray(pixels, dtype=jnp.float32))
                main = np.asarray(jax.device_get(main))
                ds = [np.asarray(jax.device_get(d)) for d in ds]
                P = self.tower.patch_size
                grid = (1, pixels.shape[1] // P, pixels.shape[2] // P)
                out = [MMEmbedding(main[i], text_alias=text_alias,
                                   deepstack=[d[i] for d in ds],
                                   grid_thw=grid,
                                   mrope_merge_size=self.tower.merge)
                       for i in range(main.shape[0])]
                return out[0] if single else out

        return _VisionModel(config, **kwargs)


class Qwen3VLMoeConfig(Qwen3MoeConfig):
    arch_string = "Qwen3VLMoeForConditionalGeneration"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, **kwargs)
        self.model_classes = {"text": Qwen3VLMoeModel}
        vc = self.read_cfg(dict, "vision_config", None)
        if vc:
            self.vision_config = vc
            self.model_classes["vision"] = Qwen3VLVisionModel


class Qwen3VLMoeModel(Qwen3MoeModel):
    config_class = Qwen3VLMoeConfig

    def __init__(self, config, **kwargs):
        super().__init__(config, key_prefix="model.language_model", **kwargs)
        vc = getattr(config, "vision_config", None)
        if vc:
            _insert_deepstack(
                self, len(vc.get("deepstack_visual_indexes", [8, 16, 24])),
                config.vocab_size)


class Glm4vVisionModel:
    """Vision component wrapper for the GLM-4V tower."""

    def __new__(cls, config, **kwargs):
        from ..model.model import Model
        from ..modules.vision_glm import Glm4vVisionTower

        vc = config.vision_config

        class _VisionModel(Model):
            def __init__(self, config, **kw):
                super().__init__(config, **kw)
                self.tower = Glm4vVisionTower(
                    config, key="model.visual",
                    depth=int(vc.get("depth", 24)),
                    hidden=int(vc.get("hidden_size", 1536)),
                    heads=int(vc.get("num_heads", 12)),
                    intermediate=int(vc.get("intermediate_size", 10944)),
                    patch_size=int(vc.get("patch_size", 14)),
                    temporal_patch_size=int(vc.get("temporal_patch_size", 2)),
                    spatial_merge_size=int(vc.get("spatial_merge_size", 2)),
                    out_hidden=int(vc.get("out_hidden_size",
                                          config.hidden_size)),
                    image_size=int(vc.get("image_size", 336)),
                    rms_norm_eps=float(vc.get("rms_norm_eps", 1e-5)),
                )
                self.modules = [self.tower]


            def preprocess(self, image):
                """PIL image (or raw array) -> normalized pixels for
                get_image_embeddings (CLIP statistics, smart resize)."""
                from ..tokenizer.image_processing import preprocess_image

                f = self.tower.patch_size * self.tower.merge
                return preprocess_image(image, factor=f)

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
                P = self.tower.patch_size
                grid = (1, pixels.shape[1] // P, pixels.shape[2] // P)
                out = [MMEmbedding(e, text_alias=text_alias, grid_thw=grid,
                                   mrope_merge_size=self.tower.merge)
                       for e in emb]
                return out[0] if single else out

        return _VisionModel(config, **kwargs)


class Glm4vConfig(Glm4Config):
    arch_string = "Glm4vForConditionalGeneration"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Glm4vModel},
                         **kwargs)
        vc = self.read_cfg(dict, "vision_config", None)
        if vc:
            self.vision_config = vc
            self.model_classes["vision"] = Glm4vVisionModel


class Glm4vModel(Glm4Model):
    config_class = Glm4vConfig

    def __init__(self, config, **kwargs):
        super().__init__(config, key_prefix="model.language_model", **kwargs)


class Glm4vMoeConfig(Glm4MoeConfig):
    arch_string = "Glm4vMoeForConditionalGeneration"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Glm4vMoeModel},
                         **kwargs)
        vc = self.read_cfg(dict, "vision_config", None)
        if vc:
            self.vision_config = vc
            self.model_classes["vision"] = Glm4vVisionModel


class Glm4vMoeModel(Glm4MoeModel):
    config_class = Glm4vMoeConfig

    def __init__(self, config, **kwargs):
        super().__init__(config, key_prefix="model.language_model", **kwargs)


class Mistral3VisionModel:
    """Vision component wrapper for the Pixtral tower."""

    def __new__(cls, config, **kwargs):
        from ..model.model import Model
        from ..modules.vision_pixtral import PixtralVisionTower

        vc = config.vision_config
        new_style = getattr(config, "_mistral3_new_keys", False)

        class _VisionModel(Model):
            def __init__(self, config, **kw):
                super().__init__(config, **kw)
                self.tower = PixtralVisionTower(
                    config,
                    key="model.vision_tower" if new_style else "vision_tower",
                    mm_key=("model.multi_modal_projector" if new_style
                            else "multi_modal_projector"),
                    depth=int(vc.get("num_hidden_layers", 24)),
                    hidden=int(vc.get("hidden_size", 1024)),
                    heads=int(vc.get("num_attention_heads", 16)),
                    intermediate=int(vc.get("intermediate_size", 4096)),
                    patch_size=int(vc.get("patch_size", 14)),
                    spatial_merge_size=int(vc.get("spatial_merge_size", 2)),
                    out_hidden=config.hidden_size,
                    rope_theta=float(vc.get("rope_theta", 10000.0)),
                )
                self.modules = [self.tower]


            def preprocess(self, image):
                """PIL image (or raw array) -> normalized pixels for
                get_image_embeddings (CLIP statistics, smart resize)."""
                from ..tokenizer.image_processing import preprocess_image

                f = self.tower.patch_size * self.tower.merge
                return preprocess_image(image, factor=f)

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


class Mistral3Config(LlamaConfig):
    arch_string = "Mistral3ForConditionalGeneration"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Mistral3Model},
                         **kwargs)
        # original keys: language_model.model / vision_tower; new exports
        # nest everything under model. (reference mistral3.py new_key_style)
        self._mistral3_new_keys = self.stc.has_tensor(
            "model.language_model.embed_tokens.weight")
        vc = self.read_cfg(dict, "vision_config", None)
        if vc:
            self.vision_config = vc
            self.model_classes["vision"] = Mistral3VisionModel


class Mistral3Model(LlamaModel):
    config_class = Mistral3Config

    def __init__(self, config, **kwargs):
        if getattr(config, "_mistral3_new_keys", False):
            super().__init__(config, key_prefix="model.language_model",
                             head_key="lm_head", **kwargs)
        else:
            super().__init__(config, key_prefix="language_model.model",
                             head_key="language_model.lm_head", **kwargs)


ARCHITECTURES = [Qwen25VLConfig, Qwen3VLConfig, Qwen3VLMoeConfig,
                 Glm4vConfig, Glm4vMoeConfig, Mistral3Config]
