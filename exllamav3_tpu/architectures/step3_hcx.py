"""Step-3.5 and HyperCLOVAX architectures.

Feature references: /root/reference/exllamav3/architecture/step3_5.py
(Step3p5ForCausalLM — dual attention geometries for sliding vs full layers,
per-layer rope theta/partial factors, headwise attention output gate,
clamped-swiglu MLPs with per-layer limits, dots-routed MoE on enumerated
layers with router_bias) and hyperclovax.py (HyperCLOVAXForCausalLM —
Granite-style embedding/attention/logits multipliers, pre+post norms).
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


class Step3p5Config(Config):
    arch_string = "Step3p5ForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": Step3p5Model},
                         **kwargs)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_attention_groups", no_default)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.sliding_window = self.read_cfg(int, "sliding_window", -1)
        self.alt_head_dim = self.read_cfg(
            int, "attention_other_setting->head_dim", None) or self.head_dim
        self.alt_num_q_heads = self.read_cfg(
            int, "attention_other_setting->num_attention_heads", no_default)
        self.alt_num_kv_heads = self.read_cfg(
            int, "attention_other_setting->num_attention_groups", no_default)
        self.layer_types = self.read_cfg(list, "layer_types", no_default)
        rope_theta = self.read_cfg(list, "rope_theta", no_default)
        prf = self.read_cfg(list, "partial_rotary_factors", no_default)
        from ..util.rope import RopeSettings

        self.rope_settings_list = []
        for rt, pf, lt in zip(rope_theta, prf, self.layer_types):
            hd = (self.head_dim if lt == "sliding_attention"
                  else self.alt_head_dim)
            self.rope_settings_list.append(RopeSettings(
                head_dim=hd, rope_theta=float(rt),
                partial_rotary_factor=float(pf),
                max_position_embeddings=self.max_position_embeddings,
                rope_style=RopeStyle.NEOX,
            ))
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.moe_intermediate_size = self.read_cfg(int, "moe_intermediate_size",
                                                   no_default)
        self.num_experts = self.read_cfg(int, "moe_num_experts", no_default)
        self.num_experts_per_tok = self.read_cfg(int, "moe_top_k", no_default)
        self.shared_expert_intermediate_size = self.read_cfg(
            int, "share_expert_dim", no_default)
        self.routed_scaling_factor = self.read_cfg(
            float, "moe_router_scaling_factor", 3.0)
        moe_layers = self.read_cfg(str, "moe_layers_enum", no_default)
        self.moe_layers = set(int(l) for l in str(moe_layers).split(","))
        self.swiglu_limits = self.read_cfg(list, "swiglu_limits", no_default)
        self.swiglu_limits_shared = self.read_cfg(list, "swiglu_limits_shared",
                                                  no_default)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", 1e-5)
        self.use_qk_norm = self.read_cfg(bool, "use_qk_norm", True)


class Step3p5Model(Model):
    config_class = Step3p5Config

    def __init__(self, config: Step3p5Config, key_prefix: str = "model",
                 **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key=f"{key_prefix}.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"{key_prefix}.layers.{idx}"
            is_moe = idx in config.moe_layers
            is_swa = config.layer_types[idx] == "sliding_attention"
            nq = config.num_q_heads if not is_swa else config.alt_num_q_heads
            nkv = config.num_kv_heads if not is_swa else config.alt_num_kv_heads
            hd = config.head_dim if is_swa else config.alt_head_dim
            act_limit = float(config.swiglu_limits[idx])
            qk = config.use_qk_norm
            if is_moe:
                mlp = BlockSparseMLP(
                    config=config, key=f"{lk}.moe",
                    hidden_size=config.hidden_size,
                    intermediate_size=config.moe_intermediate_size,
                    num_experts=config.num_experts,
                    num_experts_per_tok=config.num_experts_per_tok,
                    key_routing_gate="gate",
                    key_e_score_bias="router_bias",
                    routing="ds3", norm_topk_prob=True,
                    routed_scaling_factor=config.routed_scaling_factor,
                    activation="silu_oai", act_limit=act_limit or 7.0,
                    qmap="block.mlp",
                    shared_experts=GatedMLP(
                        config=config, key=f"{lk}.share_expert",
                        hidden_size=config.hidden_size,
                        intermediate_size=config.shared_expert_intermediate_size,
                        act_limit=float(config.swiglu_limits_shared[idx]),
                        qmap="block.mlp",
                    ),
                    out_dtype=jnp.float32,
                )
            else:
                mlp = GatedMLP(config=config, key=f"{lk}.mlp",
                               hidden_size=config.hidden_size,
                               intermediate_size=config.intermediate_size,
                               act_limit=act_limit, qmap="block.mlp",
                               out_dtype=jnp.float32)
            self.modules += [
                TransformerBlock(
                    config=config, key=lk, layer_idx=idx,
                    attn_norm=RMSNorm(config, f"{lk}.input_layernorm",
                                      config.rms_norm_eps, constant_bias=1.0),
                    attn=Attention(
                        config=config, key=f"{lk}.self_attn", layer_idx=idx,
                        hidden_size=config.hidden_size, head_dim=hd,
                        num_q_heads=nq, num_kv_heads=nkv,
                        rope_settings=config.rope_settings_list[idx],
                        sliding_window=config.sliding_window if is_swa else 0,
                        key_g="g_proj",  # headwise output gate
                        qmap="block.attn",
                        q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                                       config.rms_norm_eps, constant_bias=1.0,
                                       dim=hd) if qk else None,
                        k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                                       config.rms_norm_eps, constant_bias=1.0,
                                       dim=hd) if qk else None,
                        out_dtype=jnp.float32,
                    ),
                    mlp_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                     config.rms_norm_eps, constant_bias=1.0),
                    mlp=mlp,
                )
            ]
        self.last_kv_module_idx = len(self.modules) - 1
        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("lm_head.weight"):
            head_alt_key = f"{key_prefix}.embed_tokens"
        self.modules += [
            RMSNorm(config, f"{key_prefix}.norm", config.rms_norm_eps,
                    constant_bias=1.0, out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head", in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key, out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1


class HyperClovaxConfig(Config):
    arch_string = "HyperCLOVAXForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory,
                         derived_model or {"text": HyperClovaxModel}, **kwargs)
        self.embedding_multiplier = self.read_cfg(float, "embedding_multiplier", 1.0)
        self.logits_scaling = self.read_cfg(float, "logits_scaling", 1.0)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.attention_multiplier = self.read_cfg(float, "attention_multiplier", None)
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.NEOX)


class HyperClovaxModel(Model):
    config_class = HyperClovaxConfig

    def __init__(self, config: HyperClovaxConfig, key_prefix: str = "model",
                 post_norms: bool = True, head_key: str = "lm_head",
                 **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key=f"{key_prefix}.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size,
                      scale=config.embedding_multiplier)
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"{key_prefix}.layers.{idx}"
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
                        sm_scale=config.attention_multiplier,
                        qmap="block.attn",
                    ),
                    attn_post_norm=RMSNorm(config, f"{lk}.post_norm1",
                                           config.rms_norm_eps)
                    if post_norms else None,
                    mlp_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                     config.rms_norm_eps),
                    mlp=GatedMLP(config=config, key=f"{lk}.mlp",
                                 hidden_size=config.hidden_size,
                                 intermediate_size=config.intermediate_size,
                                 qmap="block.mlp"),
                    mlp_post_norm=RMSNorm(config, f"{lk}.post_norm2",
                                          config.rms_norm_eps,
                                          out_dtype=jnp.float32)
                    if post_norms else None,
                )
            ]
        self.last_kv_module_idx = len(self.modules) - 1
        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("lm_head.weight"):
            head_alt_key = f"{key_prefix}.embed_tokens"
        self.modules += [
            RMSNorm(config, f"{key_prefix}.norm", config.rms_norm_eps,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head", in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key,
                   post_scale=1.0 / config.logits_scaling,
                   out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1


class Step3p7Config(Step3p5Config):
    """Step-3.7 (reference architecture/step3_7.py:18): the Step-3.5 stack
    with the text config nested under text_config (resolved through the
    read_cfg fallback), yarn applied only to yarn_only_types layer types,
    and q/k norms always on (the HF config says use_qk_norm=false but the
    reference modeling code applies them unconditionally). Vision tower
    (step3_7.py:151) not ported yet — text component only."""

    arch_string = "Step3p7ForConditionalGeneration"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Step3p7Model},
                         **kwargs)
        self.use_qk_norm = True
        vc = self.read_cfg(dict, "vision_config", None)
        if vc:
            self.vision_config = vc
            self.model_classes["vision"] = Step3p7VisionModel
        yarn_only = self.read_cfg(list, "yarn_only_types", None)
        scaling = self.read_cfg(dict, "rope_scaling", None)
        if scaling:
            for rs, lt in zip(self.rope_settings_list, self.layer_types):
                if not yarn_only or lt in yarn_only:
                    rs.rope_scaling = scaling


class Step3p7Model(Step3p5Model):
    config_class = Step3p7Config


class Step3p7VisionModel:
    """Vision component wrapper for the Step-3.7 CLIP tower."""

    def __new__(cls, config, **kwargs):
        from ..model.model import Model
        from ..modules.vision_step3 import Step3VisionTower

        vc = config.vision_config

        class _VisionModel(Model):
            def __init__(self, config, **kw):
                super().__init__(config, **kw)
                key = ("model.vision_model" if config.stc.has_tensor(
                    "model.vision_model.conv1.weight") else "vision_model")
                pk = ("model.vit_large_projector" if config.stc.has_tensor(
                    "model.vit_large_projector.weight")
                    else "vit_large_projector")
                self.tower = Step3VisionTower(
                    config, key=key, projector_key=pk,
                    depth=int(vc.get("layers", 63)),
                    width=int(vc.get("width", 1792)),
                    heads=int(vc.get("heads", 16)),
                    mlp_ratio=float(vc.get("mlp_ratio", 8960 / 1536)),
                    patch_size=int(vc.get("patch_size", 14)),
                    image_size=int(vc.get("image_size", 728)),
                    out_hidden=config.hidden_size,
                    eps=float(vc.get("layer_norm_eps", 1e-5)),
                    use_rope2d=bool(vc.get("use_rope2d", True)),
                    rope_theta=float(vc.get("rope_theta", 10000.0)),
                    rope_theta_rescale=float(
                        vc.get("rope_theta_rescale_factor", 1.0)),
                )
                self.modules = [self.tower]

            def preprocess(self, image):
                """PIL image -> CLIP-normalized square image_size crop."""
                from ..tokenizer.image_processing import preprocess_image

                side = self.tower.base_grid * self.tower.patch_size
                return preprocess_image(image, factor=self.tower.patch_size,
                                        fixed_size=side)

            def get_image_embeddings_pil(self, image, text_alias=None,
                                         tokenizer=None):
                """Multi-tile embedding (reference architecture/step3_7.py
                get_image_embeddings:326-385): large images tile into
                square window crops embedded alongside the global view,
                interleaved with <patch_start>/<patch_end>/<patch_newline>
                delimiters via the MMEmbedding token string. Without a
                tokenizer (no delimiter ids) only the global view embeds.
                """
                import numpy as np
                from ..tokenizer.image_processing import (
                    preprocess_image, step37_get_patches)
                from ..tokenizer.mm_embedding import MMEmbedding

                tok_ids = None
                if tokenizer is not None:
                    cfg_d = config.cfg
                    names = {
                        "im_start": cfg_d.get("im_start_token", "<im_start>"),
                        "im_end": cfg_d.get("im_end_token", "<im_end>"),
                        "p_start": "<patch_start>",
                        "p_end": "<patch_end>",
                        "p_nl": "<patch_newline>",
                    }
                    tok_ids = {k: tokenizer.single_id(v)
                               for k, v in names.items()}
                    if any(v is None for v in tok_ids.values()):
                        tok_ids = None

                glob, patches, nl_mask = step37_get_patches(image)
                if tok_ids is None or not patches:
                    return self.get_image_embeddings(self.preprocess(glob),
                                                     text_alias=text_alias)

                side_pp = int(config.cfg.get("patch_size_pp", 504))
                patch_px = np.stack([
                    preprocess_image(pimg, factor=self.tower.patch_size,
                                     fixed_size=side_pp)
                    for pimg in patches])
                emb_p = [e.embeddings for e in
                         self.get_image_embeddings(patch_px)]
                emb_g = self.get_image_embeddings(
                    self.preprocess(glob)).embeddings

                feats, ts = [], []
                for i, ep in enumerate(emb_p):
                    feats.append(ep)
                    ts += [tok_ids["p_start"]] + [-1] * ep.shape[0] \
                        + [tok_ids["p_end"]]
                    if nl_mask and nl_mask[i]:
                        ts.append(tok_ids["p_nl"])
                feats.append(emb_g)
                ts += [tok_ids["im_start"]] + [-1] * emb_g.shape[0] \
                    + [tok_ids["im_end"]]
                return MMEmbedding(np.concatenate(feats, axis=0),
                                   text_alias=text_alias, token_string=ts)

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


class HCXVisionV2Config(HyperClovaxConfig):
    """HyperCLOVAX Vision V2 (reference architecture/hcxvisionv2.py:10): the
    HyperCLOVAX text stack without block post-norms, nested under
    model.language_model.model, with logits_scaling required and a
    Qwen2.5-VL-style vision tower under model.vision_model (tower not wired
    yet — text component only)."""

    arch_string = "HCXVisionV2ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory,
                         derived_model={"text": HCXVisionV2Model}, **kwargs)


class HCXVisionV2Model(HyperClovaxModel):
    config_class = HCXVisionV2Config

    def __init__(self, config, **kwargs):
        super().__init__(config, key_prefix="model.language_model.model",
                         post_norms=False,
                         head_key="model.language_model.lm_head", **kwargs)


ARCHITECTURES = [Step3p5Config, HyperClovaxConfig, Step3p7Config,
                 HCXVisionV2Config]
