"""DeepSeek family: V1 (dense-attn MoE), V2/V2-Lite and V3/R1/Kimi-K2 (MLA).

Feature reference: /root/reference/exllamav3/architecture/deepseek_v3.py
(DeepseekV3Config reads q/kv lora ranks, nope/rope head dims, grouped
routing; sm_scale yarn mscale_all_dim adjustment :79-84) — the reference
serves V2 checkpoints through the same class. DeepSeek rope is GPTJ
(interleaved) style applied to the rope slice only.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import Embedding, GatedMLP, Linear, RMSNorm, TransformerBlock
from ..modules.mla_attn import MLAttention
from ..modules.block_sparse_mlp import BlockSparseMLP
from ..util.rope import RopeStyle
from .llama import LlamaConfig, LlamaModel


def _yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


class DeepseekV3Config(Config):
    arch_string = "DeepseekV3ForCausalLM"

    def __init__(self, directory: str, derived_model=None, **kwargs):
        super().__init__(directory, derived_model or {"text": DeepseekV3Model},
                         **kwargs)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.q_lora_rank = self.read_cfg(int, "q_lora_rank", None)
        self.kv_lora_rank = self.read_cfg(int, "kv_lora_rank", no_default)
        self.qk_nope_head_dim = self.read_cfg(int, "qk_nope_head_dim", no_default)
        self.qk_rope_head_dim = self.read_cfg(int, "qk_rope_head_dim", no_default)
        self.v_head_dim = self.read_cfg(int, "v_head_dim", no_default)
        self.qk_head_dim = self.qk_nope_head_dim + self.qk_rope_head_dim

        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.moe_intermediate_size = self.read_cfg(int, "moe_intermediate_size",
                                                   no_default)
        self.num_shared_experts = self.read_cfg(int, "n_shared_experts", 1)
        self.num_experts = self.read_cfg(int, "n_routed_experts", no_default)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok", 8)
        self.first_k_dense_replace = self.read_cfg(int, "first_k_dense_replace", 3)
        self.routed_scaling_factor = self.read_cfg(float, "routed_scaling_factor", 1.0)
        self.n_group = self.read_cfg(int, "n_group", 1)
        self.topk_group = self.read_cfg(int, "topk_group", 1)
        self.norm_topk_prob = self.read_cfg(bool, "norm_topk_prob", True)
        self.scoring_func = self.read_cfg(str, "scoring_func", "sigmoid")

        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.hidden_act = self.read_cfg(str, "hidden_act", "silu")

        # rope applies only to the rope slice; yarn mscale folds into sm_scale
        self.rope_settings = self.read_rope_settings_default(
            RopeStyle.GPTJ, head_dim=self.qk_rope_head_dim)
        self.rope_settings.yarn_mscale_ratio = True
        self.sm_scale = self.qk_head_dim ** -0.5
        rs = self.rope_settings.rope_scaling
        if rs is not None and rs.get("mscale_all_dim", 0):
            ms = _yarn_mscale(float(rs["factor"]), float(rs["mscale_all_dim"]))
            self.sm_scale *= ms * ms

    def routing_mode(self) -> str:
        return "ds3" if self.scoring_func == "sigmoid" else "group_greedy"


class DeepseekV2Config(DeepseekV3Config):
    arch_string = "DeepseekV2ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": DeepseekV2Model},
                         **kwargs)


class DeepseekV3Model(Model):
    config_class = DeepseekV3Config

    def __init__(self, config: DeepseekV3Config, **kwargs):
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key="model.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)

        for idx in range(config.num_hidden_layers):
            lk = f"model.layers.{idx}"
            attn = MLAttention(
                config=config,
                key=f"{lk}.self_attn",
                layer_idx=idx,
                hidden_size=config.hidden_size,
                num_q_heads=config.num_q_heads,
                kv_lora_rank=config.kv_lora_rank,
                qk_nope_head_dim=config.qk_nope_head_dim,
                qk_rope_head_dim=config.qk_rope_head_dim,
                v_head_dim=config.v_head_dim,
                q_lora_rank=config.q_lora_rank,
                rope_settings=config.rope_settings,
                sm_scale=config.sm_scale,
                rms_norm_eps=config.rms_norm_eps,
                qmap="block.attn",
                out_dtype=jnp.float32,
            )
            if idx < config.first_k_dense_replace:
                mlp = GatedMLP(
                    config=config, key=f"{lk}.mlp",
                    hidden_size=config.hidden_size,
                    intermediate_size=config.intermediate_size,
                    qmap="block.mlp", activation=config.hidden_act,
                    out_dtype=jnp.float32,
                )
            else:
                shared = None
                if config.num_shared_experts:
                    shared = GatedMLP(
                        config=config, key=f"{lk}.mlp.shared_experts",
                        hidden_size=config.hidden_size,
                        intermediate_size=(config.moe_intermediate_size
                                           * config.num_shared_experts),
                        qmap="block.mlp", activation=config.hidden_act,
                    )
                mlp = BlockSparseMLP(
                    config=config, key=f"{lk}.mlp",
                    hidden_size=config.hidden_size,
                    intermediate_size=config.moe_intermediate_size,
                    num_experts=config.num_experts,
                    num_experts_per_tok=config.num_experts_per_tok,
                    key_routing_gate="gate",
                    qmap="block.mlp",
                    activation=config.hidden_act,
                    routing=config.routing_mode(),
                    norm_topk_prob=config.norm_topk_prob,
                    n_group=config.n_group,
                    topk_group=config.topk_group,
                    routed_scaling_factor=config.routed_scaling_factor,
                    shared_experts=shared,
                    out_dtype=jnp.float32,
                )
            self.modules += [
                TransformerBlock(
                    config=config, key=lk, layer_idx=idx,
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
            head_alt_key = "model.embed_tokens"
        self.modules += [
            RMSNorm(config, "model.norm", config.rms_norm_eps,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="lm_head",
                   in_features=config.hidden_size, out_features=config.vocab_size,
                   qmap="block.lm_head", alt_key=head_alt_key,
                   out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1


class DeepseekV2Model(DeepseekV3Model):
    config_class = DeepseekV2Config


class DeepseekV1Config(LlamaConfig):
    """DeepSeek-MoE 16B era: standard attention, softmax top-k MoE with
    shared experts and first_k_dense_replace dense layers."""

    arch_string = "DeepseekForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": DeepseekV1Model},
                         **kwargs)
        self.moe_intermediate_size = self.read_cfg(int, "moe_intermediate_size",
                                                   self.intermediate_size)
        self.num_shared_experts = self.read_cfg(int, "n_shared_experts", 0)
        self.num_experts = self.read_cfg(int, "n_routed_experts", 0)
        self.num_experts_per_tok = self.read_cfg(int, "num_experts_per_tok", 6)
        self.first_k_dense_replace = self.read_cfg(int, "first_k_dense_replace", 1)
        self.norm_topk_prob = self.read_cfg(bool, "norm_topk_prob", False)


class DeepseekV1Model(LlamaModel):
    config_class = DeepseekV1Config

    def __init__(self, config: DeepseekV1Config, **kwargs):
        super().__init__(config, **kwargs)
        if not config.num_experts:
            return
        for m in self.modules:
            if not isinstance(m, TransformerBlock) or m.mlp is None:
                continue
            if m.layer_idx < config.first_k_dense_replace:
                continue
            lk = m.key
            shared = None
            if config.num_shared_experts:
                shared = GatedMLP(
                    config=config, key=f"{lk}.mlp.shared_experts",
                    hidden_size=config.hidden_size,
                    intermediate_size=(config.moe_intermediate_size
                                       * config.num_shared_experts),
                    qmap="block.mlp", activation=config.hidden_act,
                )
            m.mlp = BlockSparseMLP(
                config=config, key=f"{lk}.mlp",
                hidden_size=config.hidden_size,
                intermediate_size=config.moe_intermediate_size,
                num_experts=config.num_experts,
                num_experts_per_tok=config.num_experts_per_tok,
                key_routing_gate="gate",
                qmap="block.mlp",
                activation=config.hidden_act,
                routing="std_norm",
                norm_topk_prob=config.norm_topk_prob,
                shared_experts=shared,
                out_dtype=jnp.float32,
            )
            m.modules = [x for x in (m.attn_norm, m.attn, m.attn_post_norm,
                                     m.mlp_norm, m.mlp, m.mlp_post_norm) if x]


class DeepseekV32Config(DeepseekV3Config):
    """DeepSeek-V3.2: V3 + lightning-indexer sparse attention (DSA).
    Feature reference: /root/reference/exllamav3/architecture/deepseek_v4.py
    (index_n_heads/index_head_dim/index_topk); the V4 compressor pool layer
    types are round-2 work."""

    arch_string = "DeepseekV32ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": DeepseekV32Model},
                         **kwargs)
        self.index_n_heads = self.read_cfg(int, "index_n_heads", 64)
        self.index_head_dim = self.read_cfg(int, "index_head_dim", 128)
        self.index_topk = self.read_cfg(int, "index_topk", 2048)


class DeepseekV32Model(DeepseekV3Model):
    config_class = DeepseekV32Config

    def __init__(self, config: DeepseekV32Config, **kwargs):
        super().__init__(config, **kwargs)
        from ..modules.dsa_attn import DSAttention
        from ..modules import TransformerBlock

        for m in self.modules:
            if not isinstance(m, TransformerBlock) or m.attn is None:
                continue
            lk = m.key
            m.attn = DSAttention(
                config, f"{lk}.self_attn", m.layer_idx,
                config.hidden_size, config.num_q_heads,
                config.kv_lora_rank, config.qk_nope_head_dim,
                config.qk_rope_head_dim, config.v_head_dim,
                rope_settings=config.rope_settings,
                q_lora_rank=config.q_lora_rank or 128,
                sm_scale=config.sm_scale,
                rms_norm_eps=config.rms_norm_eps,
                qmap="block.attn",
                index_n_heads=config.index_n_heads,
                index_head_dim=config.index_head_dim,
                index_topk=config.index_topk,
                out_dtype=jnp.float32,
            )
            m.modules = [x for x in (m.attn_norm, m.attn, m.attn_post_norm,
                                     m.mlp_norm, m.mlp, m.mlp_post_norm) if x]


ARCHITECTURES = [DeepseekV3Config, DeepseekV2Config, DeepseekV1Config,
                 DeepseekV32Config]
