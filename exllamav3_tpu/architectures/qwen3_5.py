"""Qwen3.5 family: hybrid GDN (split projections) / gated attention.

Feature reference: /root/reference/exllamav3/architecture/qwen3_5.py
(Qwen3_5ForCausalLM dense and Qwen3_5MoeForCausalLM; per-layer layer_types
or every full_attention_interval-th layer full attention; GDN uses split
in_proj_qkv/in_proj_z/in_proj_b/in_proj_a projections; (1+w) norms;
interleaved attention output gate). VL/MTP variants share the config shape
via the text_config prefix.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import (
    Attention,
    BlockSparseMLP,
    Embedding,
    GatedDeltaNet,
    GatedMLP,
    Linear,
    RMSNorm,
    TransformerBlock,
)
from ..util.rope import RopeStyle


def read_hybrid_layer_types(config, num_layers: int, interval: int,
                            key_prefix: str = "",
                            linear_name: str = "linear_attention") -> list:
    lt = config.read_cfg(list, key_prefix + "layer_types", None)
    if lt is not None:
        return lt
    return ["full_attention" if (i + 1) % interval == 0 else linear_name
            for i in range(num_layers)]


class Qwen3_5Config(Config):
    arch_string = "Qwen3_5ForCausalLM"
    use_moe = False

    def __init__(self, directory: str, derived_model=None, text_cfg: str = "",
                 **kwargs):
        super().__init__(directory,
                         derived_model or {"text": Qwen3_5Model}, **kwargs)
        pre = f"{text_cfg}->" if text_cfg else ""
        self.head_dim = self.read_cfg(int, pre + "head_dim", None)
        self.hidden_size = self.read_cfg(int, pre + "hidden_size", self.hidden_size)
        self.num_q_heads = self.read_cfg(int, pre + "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, pre + "num_key_value_heads",
                                          self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.full_attention_interval = self.read_cfg(
            int, pre + "full_attention_interval", 4)
        self.linear_conv_kernel_dim = self.read_cfg(int, pre + "linear_conv_kernel_dim", 4)
        self.linear_num_key_heads = self.read_cfg(int, pre + "linear_num_key_heads", 16)
        self.linear_num_value_heads = self.read_cfg(int, pre + "linear_num_value_heads", 32)
        self.linear_key_head_dim = self.read_cfg(int, pre + "linear_key_head_dim", 128)
        self.linear_value_head_dim = self.read_cfg(int, pre + "linear_value_head_dim", 128)
        self.intermediate_size = self.read_cfg(int, pre + "intermediate_size", 0)
        self.moe_intermediate_size = self.read_cfg(int, pre + "moe_intermediate_size", 0)
        self.num_experts = self.read_cfg(int, pre + "num_experts", 0)
        self.num_experts_per_tok = self.read_cfg(int, pre + "num_experts_per_tok", 0)
        self.shared_expert_intermediate_size = self.read_cfg(
            int, pre + "shared_expert_intermediate_size", 512)
        self.rms_norm_eps = self.read_cfg(float, pre + "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, pre + "num_hidden_layers",
                                               no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.layer_types = read_hybrid_layer_types(
            self, self.num_hidden_layers, self.full_attention_interval, pre)
        self.rope_settings = self.read_rope_settings_default(
            RopeStyle.NEOX, key_prefix=pre)
        self.mtp_num_hidden_layers = self.read_cfg(
            int, pre + "mtp_num_hidden_layers", 0)
        if self.mtp_num_hidden_layers:
            self.model_classes["mtp"] = Qwen3_5MTPModel


class Qwen3_5MoeConfig(Qwen3_5Config):
    arch_string = "Qwen3_5MoeForCausalLM"
    use_moe = True

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Qwen3_5MoeModel},
                         **kwargs)


class Qwen3_5VLConfig(Qwen3_5Config):
    """Qwen3.5 VL (reference qwen3_5.py Qwen3_5VLConfig:131): text config
    nested under text_config; shares the Qwen3-VL vision tower and its
    deepstack early-layer injection."""

    arch_string = "Qwen3_5ForConditionalGeneration"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Qwen3_5Model},
                         text_cfg="text_config", **kwargs)
        vc = self.read_cfg(dict, "vision_config", None)
        if vc:
            from .vl_text import Qwen3VLVisionModel

            self.vision_config = vc
            self.model_classes["vision"] = Qwen3VLVisionModel


class Qwen3_5VLMoeConfig(Qwen3_5Config):
    arch_string = "Qwen3_5MoeForConditionalGeneration"
    use_moe = True

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Qwen3_5MoeModel},
                         text_cfg="text_config", **kwargs)
        vc = self.read_cfg(dict, "vision_config", None)
        if vc:
            from .vl_text import Qwen3VLVisionModel

            self.vision_config = vc
            self.model_classes["vision"] = Qwen3VLVisionModel


class Qwen3_5Model(Model):
    config_class = Qwen3_5Config
    use_moe = False

    def __init__(self, config: Qwen3_5Config, key_prefix: str | None = None,
                 **kwargs):
        # real Qwen3.5 checkpoints nest the text stack under
        # model.language_model (reference qwen3_5.py:525); plain model.* is
        # kept for flat exports
        if key_prefix is None:
            key_prefix = ("model.language_model" if config.stc.has_tensor(
                "model.language_model.embed_tokens.weight") else "model")
        self._want_deepstack = getattr(config, "vision_config", None)
        super().__init__(config, **kwargs)
        self.modules += [
            Embedding(config=config, key=f"{key_prefix}.embed_tokens",
                      vocab_size=config.vocab_size, hidden_size=config.hidden_size)
        ]
        self.first_block_idx = len(self.modules)
        for idx in range(config.num_hidden_layers):
            lk = f"{key_prefix}.layers.{idx}"
            if config.layer_types[idx] == "linear_attention":
                attn = GatedDeltaNet(
                    config=config, key=f"{lk}.linear_attn", layer_idx=idx,
                    hidden_size=config.hidden_size,
                    k_head_dim=config.linear_key_head_dim,
                    v_head_dim=config.linear_value_head_dim,
                    num_k_heads=config.linear_num_key_heads,
                    num_v_heads=config.linear_num_value_heads,
                    rms_norm_eps=config.rms_norm_eps,
                    conv_kernel_size=config.linear_conv_kernel_dim,
                    key_qkv="in_proj_qkv", key_z="in_proj_z",
                    key_b="in_proj_b", key_a="in_proj_a",
                    qmap="block.attn", out_dtype=jnp.float32,
                )
            else:
                attn = Attention(
                    config=config, key=f"{lk}.self_attn", layer_idx=idx,
                    hidden_size=config.hidden_size, head_dim=config.head_dim,
                    num_q_heads=config.num_q_heads,
                    num_kv_heads=config.num_kv_heads,
                    rope_settings=config.rope_settings,
                    qmap="block.attn",
                    q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                                   config.rms_norm_eps, constant_bias=1.0,
                                   dim=config.head_dim),
                    k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                                   config.rms_norm_eps, constant_bias=1.0,
                                   dim=config.head_dim),
                    interleaved_gate=True,
                    out_dtype=jnp.float32,
                )
            if self.use_moe:
                mlp = BlockSparseMLP(
                    config=config, key=f"{lk}.mlp",
                    hidden_size=config.hidden_size,
                    intermediate_size=config.moe_intermediate_size,
                    num_experts=config.num_experts,
                    num_experts_per_tok=config.num_experts_per_tok,
                    key_routing_gate="gate",
                    key_shared_gate="shared_expert_gate",
                    qmap="block.mlp", routing="std_norm", norm_topk_prob=True,
                    shared_experts=GatedMLP(
                        config=config, key=f"{lk}.mlp.shared_expert",
                        hidden_size=config.hidden_size,
                        intermediate_size=config.shared_expert_intermediate_size,
                        qmap="block.mlp"),
                    out_dtype=jnp.float32,
                )
            else:
                mlp = GatedMLP(config=config, key=f"{lk}.mlp",
                               hidden_size=config.hidden_size,
                               intermediate_size=config.intermediate_size,
                               qmap="block.mlp", out_dtype=jnp.float32)
            self.modules += [
                TransformerBlock(
                    config=config, key=lk, layer_idx=idx,
                    attn_norm=RMSNorm(config, f"{lk}.input_layernorm",
                                      config.rms_norm_eps, constant_bias=1.0),
                    attn=attn,
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
        if self._want_deepstack:
            from .vl_text import _insert_deepstack

            _insert_deepstack(
                self,
                len(self._want_deepstack.get("deepstack_visual_indexes",
                                             [8, 16, 24])),
                config.vocab_size)


class Qwen3_5MoeModel(Qwen3_5Model):
    config_class = Qwen3_5MoeConfig
    use_moe = True


class Qwen3_5MTPModel(Model):
    """MTP draft head (reference architecture/qwen3_5_mtp.py): input layer
    (pre_fc norms + 2H->H fc) -> mtp.layers.N full-attention blocks ->
    mtp.norm; embedding and lm_head are BORROWED from the target model
    (attach()). Drives near-free speculative drafting in the generator."""

    config_class = None

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        from ..modules.mtp import MTPInputLayer

        self.input_layer = MTPInputLayer(
            config, "mtp", config.hidden_size, config.rms_norm_eps,
            key_pre_fc_norm_hidden="mtp.pre_fc_norm_hidden",
            key_pre_fc_norm_embedding="mtp.pre_fc_norm_embedding",
            key_fc="mtp.fc", constant_bias=1.0, out_dtype=jnp.float32,
        )
        self.modules = [self.input_layer]
        self.first_block_idx = len(self.modules)
        n_layers = getattr(config, "mtp_num_hidden_layers", 1) or 1
        for idx in range(n_layers):
            lk = f"mtp.layers.{idx}"
            self.modules += [
                TransformerBlock(
                    config=config, key=lk, layer_idx=idx,
                    attn_norm=RMSNorm(config, f"{lk}.input_layernorm",
                                      config.rms_norm_eps, constant_bias=1.0),
                    attn=Attention(
                        config=config, key=f"{lk}.self_attn", layer_idx=idx,
                        hidden_size=config.hidden_size,
                        head_dim=config.head_dim,
                        num_q_heads=config.num_q_heads,
                        num_kv_heads=config.num_kv_heads,
                        rope_settings=config.rope_settings,
                        qmap="block.attn",
                        q_norm=RMSNorm(config, f"{lk}.self_attn.q_norm",
                                       config.rms_norm_eps, constant_bias=1.0,
                                       dim=config.head_dim),
                        k_norm=RMSNorm(config, f"{lk}.self_attn.k_norm",
                                       config.rms_norm_eps, constant_bias=1.0,
                                       dim=config.head_dim),
                        interleaved_gate=True,
                        out_dtype=jnp.float32,
                    ),
                    mlp_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                     config.rms_norm_eps, constant_bias=1.0),
                    mlp=GatedMLP(config=config, key=f"{lk}.mlp",
                                 hidden_size=config.hidden_size,
                                 intermediate_size=config.intermediate_size
                                 or config.moe_intermediate_size,
                                 qmap="block.mlp", out_dtype=jnp.float32),
                )
            ]
        self.last_kv_module_idx = len(self.modules) - 1
        self.modules += [
            RMSNorm(config, "mtp.norm", config.rms_norm_eps, constant_bias=1.0,
                    out_dtype=jnp.bfloat16),
        ]
        self.caps["mtp_draft"] = True
        self.target = None

    def attach(self, target_model):
        """Borrow the target's embedding and lm_head modules."""
        from ..modules import Embedding

        self.target = target_model
        self.embed = next(m for m in target_model.root.walk()
                          if isinstance(m, Embedding))
        self.head = target_model.modules[target_model.logit_layer_idx]

    def mtp_step_fn(self, attn_mode: str = "paged"):
        """(t_params, m_params, ids, target_hidden, cache_state, positions,
        seqlens, block_tables) -> (logits, hidden_out, new_cache)."""
        from ..modules.module import ForwardCtx

        def fn(t_params, m_params, ids, target_hidden, cache_state, positions,
               seqlens, block_tables):
            ctx = ForwardCtx(
                positions=positions, attn_mode=attn_mode,
                cache=dict(cache_state) if cache_state is not None else None,
                block_tables=block_tables, cache_seqlens=seqlens,
            )
            ctx.extras["target_hidden"] = target_hidden
            x = self.embed.forward(ids, t_params, ctx)
            for m in self.modules[:-1]:
                x = m.forward(x, m_params, ctx)
            hidden = x
            x = self.modules[-1].forward(x, m_params, ctx)
            logits = self.head.forward(x, t_params, ctx)
            return logits, hidden, ctx.cache

        return fn


ARCHITECTURES = [Qwen3_5Config, Qwen3_5MoeConfig, Qwen3_5VLConfig,
                 Qwen3_5VLMoeConfig]
