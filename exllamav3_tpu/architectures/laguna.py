"""Laguna (Poolside Laguna-XS): hybrid full/SWA attention with per-layer
q-head counts, softplus per-head output gates, dots-style MoE with a dense
layer 0, and per-layer-type rope parameters; plus the matching DFlash
block-diffusion drafter.

Feature reference: /root/reference/exllamav3/architecture/laguna.py
(LagunaConfig:23, LagunaModel:95) and dflash_laguna.py
(DFlashLagunaConfig:27, DFlashLagunaModel:94). SWA layers run on the
fixed-size ring cache (recurrent SWAState in the reference; swa_ring spec
here), so long contexts hold only window-sized K/V for those layers.
"""
from __future__ import annotations

import jax
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
from ..util.rope import RopeSettings, RopeStyle
from .dflash import DFlashConfig, DFlashModel


def _rope_from_parameters(rp: dict, head_dim: int, max_pos: int | None,
                          unscaled: bool = False) -> RopeSettings:
    """Transformers-v5 style nested rope_parameters entry -> RopeSettings.
    The reference synthesizes a config dict per layer type
    (laguna.py rope_settings_for:63); unscaled drops the scaling entirely
    (sliding layers use plain rope)."""
    rp = dict(rp or {})
    theta = float(rp.pop("rope_theta", 10000.0))
    rt = rp.get("rope_type", rp.get("type", "default"))
    scaling = None if (unscaled or rt == "default" or not rp) else rp
    return RopeSettings(
        head_dim=head_dim,
        rope_theta=theta,
        rope_scaling=scaling,
        max_position_embeddings=max_pos,
        rope_style=RopeStyle.NEOX,
    )


class LagunaConfig(Config):
    arch_string = "LagunaForCausalLM"

    def __init__(self, directory: str, derived_model: dict | None = None, **kwargs):
        super().__init__(directory, derived_model or {"text": LagunaModel},
                         **kwargs)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.head_dim = self.read_cfg(int, "head_dim", no_default)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", no_default)
        # full-attention and SWA layers may differ in q-head count
        self.num_q_heads_list = self.read_cfg(
            list, "num_attention_heads_per_layer", None) or \
            [self.num_q_heads] * self.num_hidden_layers
        self.assert_cfg(str, "gating", "per-head")
        self.layer_types = self.read_cfg(list, "layer_types", no_default)
        self.sliding_window = self.read_cfg(int, "sliding_window", -1)

        # rope settings nested per layer type (transformers v5); sliding
        # layers use unscaled rope
        rope_parameters = self.read_cfg(dict, "rope_parameters", None) or {}
        self.rope_settings_list = [
            _rope_from_parameters(
                rope_parameters.get(lt, rope_parameters),
                self.head_dim, self.max_position_embeddings,
                unscaled=(lt == "sliding_attention"))
            for lt in self.layer_types
        ]

        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.moe_intermediate_size = self.read_cfg(
            int, "moe_intermediate_size", no_default)
        self.shared_expert_intermediate_size = self.read_cfg(
            int, "shared_expert_intermediate_size", no_default)
        self.num_experts = self.read_cfg(int, "num_experts", no_default)
        self.num_experts_per_tok = self.read_cfg(
            int, "num_experts_per_tok", no_default)
        self.mlp_only_layers = set(self.read_cfg(list, "mlp_only_layers", [0]))
        self.routed_scaling_factor = self.read_cfg(
            float, "moe_routed_scaling_factor", 1.0)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", 1e-6)


class LagunaModel(Model):
    config_class = LagunaConfig

    def __init__(self, config: LagunaConfig, key_prefix: str = "model", **kwargs):
        super().__init__(config, **kwargs)

        self.modules += [
            Embedding(config=config, key=f"{key_prefix}.embed_tokens",
                      vocab_size=config.vocab_size,
                      hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)

        for idx in range(config.num_hidden_layers):
            lk = f"{key_prefix}.layers.{idx}"
            is_moe = idx not in config.mlp_only_layers
            is_swa = config.layer_types[idx] == "sliding_attention"
            attn = Attention(
                config=config,
                key=f"{lk}.self_attn",
                layer_idx=idx,
                hidden_size=config.hidden_size,
                head_dim=config.head_dim,
                num_q_heads=config.num_q_heads_list[idx],
                num_kv_heads=config.num_kv_heads,
                rope_settings=config.rope_settings_list[idx],
                sliding_window=config.sliding_window if is_swa else 0,
                key_g="g_proj",
                gate_softplus=True,
                qmap="block.attn",
                q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                               config.rms_norm_eps, dim=config.head_dim),
                k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                               config.rms_norm_eps, dim=config.head_dim),
            )
            if is_moe:
                mlp = BlockSparseMLP(
                    config=config,
                    key=f"{lk}.mlp",
                    hidden_size=config.hidden_size,
                    intermediate_size=config.moe_intermediate_size,
                    num_experts=config.num_experts,
                    num_experts_per_tok=config.num_experts_per_tok,
                    # "dots" routing = ds3 noaux_tc without expert groups:
                    # sigmoid scores, bias-shifted selection, normalized
                    # unbiased weights x scaling (reference
                    # block_sparse_mlp.py routing_dots:167)
                    routing="ds3",
                    n_group=1,
                    norm_topk_prob=True,
                    routed_scaling_factor=config.routed_scaling_factor,
                    key_e_score_bias="experts.e_score_correction_bias",
                    qmap="block.mlp",
                    shared_experts=GatedMLP(
                        config=config,
                        key=f"{lk}.mlp.shared_expert",
                        hidden_size=config.hidden_size,
                        intermediate_size=config.shared_expert_intermediate_size,
                        qmap="block.mlp",
                    ),
                )
            else:
                mlp = GatedMLP(config=config, key=f"{lk}.mlp",
                               hidden_size=config.hidden_size,
                               intermediate_size=config.intermediate_size,
                               qmap="block.mlp")
            self.modules += [
                TransformerBlock(
                    config=config,
                    key=lk,
                    layer_idx=idx,
                    attn_norm=RMSNorm(config, f"{lk}.input_layernorm",
                                      config.rms_norm_eps),
                    attn=attn,
                    mlp_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                     config.rms_norm_eps),
                    mlp=mlp,
                )
            ]

        self.last_kv_module_idx = len(self.modules) - 1

        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("lm_head.weight"):
            head_alt_key = f"{key_prefix}.embed_tokens"
        self.modules += [
            RMSNorm(config, f"{key_prefix}.norm", config.rms_norm_eps,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head",
                   in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key, out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1

    def default_chat_prompt(self, prompt: str, system_prompt: str | None = None) -> str:
        p = "〈|EOS|〉"
        if system_prompt:
            p += f"<system>{system_prompt}</system>\n"
        return p + f"<user>{prompt}</user>\n<assistant>"


class DFlashLagunaConfig(DFlashConfig):
    """DFlash drafter for Laguna targets (reference dflash_laguna.py):
    Laguna-flavored layers (fused qkv tensor, QK norms, softplus head gate,
    uniform sliding window), per-tap norms on the captured target hiddens,
    optionally causal in-block drafting, and RAW target_layer_ids (the
    z-lab drafter shifts them one layer deeper)."""

    arch_string = "DFlashLagunaForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory,
                         derived_model={"text": DFlashLagunaModel}, **kwargs)
        self.assert_cfg(str, "gating", "per-head")
        # undo the base class's one-deeper shift: ids are capture points
        # "output of layer i" for this family
        self.target_layer_ids = [i - 1 for i in self.target_layer_ids]
        eagle_ids = self.read_cfg(list, "eagle_aux_hidden_state_layer_ids", None)
        if eagle_ids is not None:
            assert eagle_ids == [i + 1 for i in self.target_layer_ids], \
                "eagle_aux_hidden_state_layer_ids inconsistent with target_layer_ids"
        assert len(set(self.layer_types)) == 1, \
            "DFlashLaguna drafter requires uniform layer_types"
        self.is_swa = self.layer_types[0] == "sliding_attention"
        self.dflash_causal = self.read_cfg(bool, "dflash_config->causal", True)
        draft_vocab = self.read_cfg(int, "draft_vocab_size", self.vocab_size)
        assert draft_vocab == self.vocab_size, \
            "DFlashLaguna: reduced draft vocabularies are not supported"


class DFlashLagunaModel(DFlashModel):
    config_class = DFlashLagunaConfig

    def __init__(self, config: DFlashLagunaConfig, **kwargs):
        super().__init__(config, **kwargs)
        self.causal_draft = config.dflash_causal
        if not config.is_swa:
            self.sliding_window = 0
        h = config.hidden_size
        hd = config.head_dim
        nq, nkv = config.num_q_heads, config.num_kv_heads
        # per-tap norms ahead of the fc projection
        self.aux_norms = [
            RMSNorm(config, f"aux_hidden_norms.{i}", config.rms_norm_eps)
            for i in range(len(config.target_layer_ids))
        ]
        self.modules = self.modules[:2] + self.aux_norms + self.modules[2:]
        self.first_block_idx += len(self.aux_norms)
        for blk in self.blocks:
            attn = blk.attn
            # checkpoint stores one fused qkv tensor per layer
            fk = f"{attn.key}.qkv_proj"
            attn.q_proj.fkey = fk
            attn.q_proj.frange = (0, nq * hd)
            attn.k_proj.fkey = fk
            attn.k_proj.frange = (nq * hd, (nq + nkv) * hd)
            attn.v_proj.fkey = fk
            attn.v_proj.frange = ((nq + nkv) * hd, (nq + 2 * nkv) * hd)
            attn.g_proj = Linear(config, f"{attn.key}.g_proj", h, nq)
            attn.gate_softplus = True
            attn.full_gate = False
            attn.modules.append(attn.g_proj)

    def _project_context(self, th, d_params, ctx):
        """Per-tap norm -> concat -> fc -> hidden_norm (reference
        dflash_laguna.py update_kv_from_target:249)."""
        B, S, _ = th.shape
        L = len(self.aux_norms)
        taps = th.reshape(B, S, L, -1)
        taps = jnp.stack([
            n.forward(taps[:, :, i], d_params, ctx)
            for i, n in enumerate(self.aux_norms)
        ], axis=2)
        h = self.fc.forward(taps.reshape(B, S, -1), d_params, ctx)
        return self.hidden_norm.forward(h, d_params, ctx)

    def update_fn(self):
        from ..modules.module import ForwardCtx
        from ..constants import PAGE_SIZE

        def fn(d_params, th, cache_state, positions, block_tables, seqlens):
            ctx = ForwardCtx(positions=positions, attn_mode="paged",
                             cache=dict(cache_state),
                             block_tables=block_tables, cache_seqlens=seqlens)
            h = self._project_context(th, d_params, ctx)
            B, S, _ = h.shape
            page_slot = positions // PAGE_SIZE
            rows = jnp.take_along_axis(block_tables, page_slot, axis=1)
            cols = positions % PAGE_SIZE
            for blk in self.blocks:
                attn = blk.attn
                # each layer's input_layernorm applies to the shared context
                # features before its K/V projection (vLLM convention)
                hn = blk.attn_norm.forward(h, d_params, ctx)
                k = attn.k_proj.forward(hn, d_params, ctx).reshape(
                    B, S, attn.num_kv_heads, attn.head_dim)
                if attn.k_norm is not None:
                    k = attn.k_norm.forward(k, d_params, ctx)
                sin, cos = attn.rope.sin_cos(positions)
                k = attn.rope.apply(k, sin, cos)
                v = attn.v_proj.forward(hn, d_params, ctx).reshape(
                    B, S, attn.num_kv_heads, attn.head_dim)
                layer = ctx.cache[attn.key]
                ctx.cache[attn.key] = {
                    "k": layer["k"].at[rows, cols].set(k.astype(layer["k"].dtype)),
                    "v": layer["v"].at[rows, cols].set(v.astype(layer["v"].dtype)),
                }
            return ctx.cache

        return fn


ARCHITECTURES = [LagunaConfig, DFlashLagunaConfig]
