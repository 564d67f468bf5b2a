"""DeepSeek-V4: hybrid sparse attention (sliding/CSA/HCA per compress_ratios),
mHC hyper-connection residual streams, hash-MoE bootstrap layers and
sqrt-softplus routing, in DeepSeek's native tensor namespace
(layers.N.attn.wq_a, hc_attn_fn, embed/head/norm).

Feature reference: /root/reference/exllamav3/architecture/deepseek_v4.py
(DeepseekV4Config:21, DeepseekV4Model:108). The DSpark MTP drafter
(deepseek_v4_mtp.py) is not ported yet — tracked in doc/COMPONENTS.md.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import (
    BlockSparseMLP,
    Embedding,
    ExpandStreams,
    GatedMLP,
    HyperConnection,
    HyperHead,
    Linear,
    RMSNorm,
    TransformerBlock,
)
from ..modules.dsv4_attn import DSV4Attention

_RATIO_TO_TYPE = {0: "sliding", 4: "csa", 128: "hca"}


class DeepseekV4Config(Config):
    arch_string = "DeepseekV4ForCausalLM"

    def __init__(self, directory: str, derived_model: dict | None = None, **kwargs):
        super().__init__(directory, derived_model or {"text": DeepseekV4Model},
                         **kwargs)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads", 1)
        assert self.num_kv_heads == 1, \
            "DeepseekV4: expected shared-KV MQA (num_key_value_heads == 1)"
        self.head_dim = self.read_cfg(int, "head_dim", 512)
        self.qk_rope_head_dim = self.read_cfg(int, "qk_rope_head_dim", 64)
        self.q_lora_rank = self.read_cfg(int, "q_lora_rank", no_default)
        self.o_groups = self.read_cfg(int, "o_groups", 8)
        self.o_lora_rank = self.read_cfg(int, "o_lora_rank", 1024)
        self.sliding_window = self.read_cfg(int, "sliding_window", 128)
        self.index_n_heads = self.read_cfg(int, "index_n_heads", 64)
        self.index_head_dim = self.read_cfg(int, "index_head_dim", 128)
        self.index_topk = self.read_cfg(int, "index_topk", 512)

        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        ratios = self.read_cfg(list, "compress_ratios", None)
        if ratios is not None:
            self.layer_types = [
                _RATIO_TO_TYPE[r] for r in ratios[: self.num_hidden_layers]]
        else:
            inter = ["csa" if i % 2 else "hca"
                     for i in range(max(self.num_hidden_layers - 2, 0))]
            self.layer_types = \
                ["hca"] * min(self.num_hidden_layers, 2) + inter
        self.compress_rate_csa = self.read_cfg(int, "compress_rate_csa", 4)
        self.compress_rate_hca = self.read_cfg(int, "compress_rate_hca", 128)

        self.hc_mult = self.read_cfg(int, "hc_mult", 4)
        self.hc_sinkhorn_iters = self.read_cfg(int, "hc_sinkhorn_iters", 20)
        self.hc_eps = self.read_cfg(float, "hc_eps", 1e-6)

        self.assert_cfg(str, "scoring_func", "sqrtsoftplus", optional=True)
        self.assert_cfg(str, "topk_method", "noaux_tc", optional=True)
        self.moe_intermediate_size = self.read_cfg(
            int, "moe_intermediate_size", no_default)
        self.num_experts = self.read_cfg(int, "n_routed_experts", no_default)
        self.num_experts_per_tok = self.read_cfg(
            int, "num_experts_per_tok", no_default)
        self.num_shared_experts = self.read_cfg(int, "n_shared_experts", 1)
        self.num_hash_layers = self.read_cfg(int, "num_hash_layers", 3)
        self.routed_scaling_factor = self.read_cfg(
            float, "routed_scaling_factor", 1.0)
        self.swiglu_limit = self.read_cfg(float, "swiglu_limit", 10.0)

        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", 1e-6)
        self.rope_theta = self.read_cfg(float, "rope_theta", 10000.0)
        self.compress_rope_theta = self.read_cfg(
            float, "compress_rope_theta", 160000.0)
        self.rope_scaling = self.read_cfg(dict, "rope_scaling", None)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings",
                                                 False)


class DeepseekV4Model(Model):
    config_class = DeepseekV4Config

    def __init__(self, config: DeepseekV4Config, **kwargs):
        super().__init__(config, **kwargs)

        self.modules += [
            Embedding(config=config, key="embed",
                      vocab_size=config.vocab_size,
                      hidden_size=config.hidden_size),
            ExpandStreams(config=config, key="hc_expand",
                          hc_mult=config.hc_mult),
        ]
        self.first_block_idx = len(self.modules)

        for idx in range(config.num_hidden_layers):
            lt = config.layer_types[idx]
            key = f"layers.{idx}"
            attn = DSV4Attention(
                config=config,
                key=f"{key}.attn",
                layer_idx=idx,
                layer_type=lt,
                hidden_size=config.hidden_size,
                num_q_heads=config.num_q_heads,
                head_dim=config.head_dim,
                rope_head_dim=config.qk_rope_head_dim,
                q_lora_rank=config.q_lora_rank,
                o_groups=config.o_groups,
                o_lora_rank=config.o_lora_rank,
                sliding_window=config.sliding_window,
                compress_rate={"sliding": None,
                               "csa": config.compress_rate_csa,
                               "hca": config.compress_rate_hca}[lt],
                index_n_heads=config.index_n_heads,
                index_head_dim=config.index_head_dim,
                index_topk=config.index_topk,
                rope_theta=config.rope_theta,
                compress_rope_theta=config.compress_rope_theta,
                rope_scaling=config.rope_scaling,
                rms_norm_eps=config.rms_norm_eps,
                qmap="block.attn",
            )
            is_hash = idx < config.num_hash_layers
            mlp = BlockSparseMLP(
                config=config,
                key=f"{key}.ffn",
                hidden_size=config.hidden_size,
                intermediate_size=config.moe_intermediate_size,
                num_experts=config.num_experts,
                num_experts_per_tok=config.num_experts_per_tok,
                key_up="w3", key_gate="w1", key_down="w2",
                key_expert="experts.{expert_idx}",
                key_routing_gate="gate",
                key_e_score_bias="gate.bias",
                key_tid2eid="gate.tid2eid" if is_hash else None,
                qmap="block.mlp",
                activation="silu",
                act_clamp=config.swiglu_limit,
                routing="sqrtsp",
                routed_scaling_factor=config.routed_scaling_factor,
                shared_experts=GatedMLP(
                    config=config,
                    key=f"{key}.ffn.shared_experts",
                    hidden_size=config.hidden_size,
                    intermediate_size=(config.moe_intermediate_size
                                       * config.num_shared_experts),
                    key_up="w3", key_gate="w1", key_down="w2",
                    qmap="block.mlp",
                    activation="silu",
                    act_clamp=config.swiglu_limit,
                ),
            )

            def _hc(tag):
                return HyperConnection(
                    config=config, key=f"{key}.hc_{tag}",
                    hc_mult=config.hc_mult,
                    hidden_size=config.hidden_size,
                    sinkhorn_iters=config.hc_sinkhorn_iters,
                    hc_eps=config.hc_eps,
                    rms_norm_eps=config.rms_norm_eps)

            self.modules += [
                TransformerBlock(
                    config=config,
                    key=key,
                    layer_idx=idx,
                    attn_norm=RMSNorm(config, f"{key}.attn_norm",
                                      config.rms_norm_eps),
                    attn=attn,
                    attn_hc=_hc("attn"),
                    mlp_norm=RMSNorm(config, f"{key}.ffn_norm",
                                     config.rms_norm_eps),
                    mlp=mlp,
                    mlp_hc=_hc("ffn"),
                )
            ]

        self.last_kv_module_idx = len(self.modules) - 1

        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("head.weight"):
            head_alt_key = "embed"
        self.modules += [
            HyperHead(config=config, key="hc_head", hc_mult=config.hc_mult,
                      rms_norm_eps=config.rms_norm_eps, hc_eps=config.hc_eps),
            RMSNorm(config, "norm", config.rms_norm_eps,
                    out_dtype=jnp.bfloat16),
            Linear(config=config, key="head",
                   in_features=config.hidden_size,
                   out_features=config.vocab_size, qmap="block.lm_head",
                   alt_key=head_alt_key, out_dtype=jnp.float32),
        ]
        self.logit_layer_idx = len(self.modules) - 1

    def default_chat_prompt(self, prompt: str, system_prompt: str | None = None) -> str:
        p = f"{system_prompt}\n\n" if system_prompt else ""
        return p + f"<|User|>{prompt}<|Assistant|>"


ARCHITECTURES = [DeepseekV4Config]
