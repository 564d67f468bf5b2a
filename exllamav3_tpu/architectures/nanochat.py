"""NanoChat architecture: value embeddings, per-layer residual/x0 scalars,
mid-stack backout, unweighted norms, post-rope QK norm, relu² MLP and an
opposite-spin rope.

Feature reference: /root/reference/exllamav3/architecture/nanochat.py
(NanoChatConfig:18, NanoChatModel:78), modules/value_embeddings.py,
modules/transformer.py (_apply_resid_lambda/_extract_backout/_apply_backout/
_compute_ve_addend). Supports both the native key scheme (transformer.h.N,
c_q/c_k/c_v/c_proj, c_fc) and the HF export (model.layers.N, q_proj...,
fc1/fc2), auto-detected from transformer.wte.weight.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.config import Config, no_default
from ..model.model import Model
from ..modules import (
    Attention,
    Embedding,
    Linear,
    MLP,
    RMSNorm,
    TransformerBlock,
    ValueEmbeddings,
)
from ..util.rope import RopeStyle


class NanoChatConfig(Config):
    arch_string = "NanoChatForCausalLM"

    def __init__(self, directory: str, derived_model: dict | None = None, **kwargs):
        super().__init__(directory, derived_model or {"text": NanoChatModel},
                         **kwargs)
        self.head_dim = self.read_cfg(int, "head_dim", None)
        self.num_q_heads = self.read_cfg(int, "num_attention_heads", no_default)
        self.num_kv_heads = self.read_cfg(int, "num_key_value_heads",
                                          self.num_q_heads)
        if not self.head_dim:
            self.head_dim = self.hidden_size // self.num_q_heads
        self.assert_cfg(str, "hidden_act", "relu2", optional=True)
        self.intermediate_size = self.read_cfg(int, "intermediate_size", no_default)
        self.rms_norm_eps = self.read_cfg(float, "rms_norm_eps", no_default)
        self.num_hidden_layers = self.read_cfg(int, "num_hidden_layers", no_default)
        self.tie_word_embeddings = self.read_cfg(bool, "tie_word_embeddings", False)
        self.rope_settings = self.read_rope_settings_default(RopeStyle.NANOCHAT)
        self.final_logit_softcapping = self.read_cfg(
            float, "final_logit_softcapping", 0.0)

        # native (transformer.h.*) vs HF (model.layers.*) key scheme
        self.native_keys = self.stc.has_tensor("transformer.wte.weight")

        # value embeddings live on odd layers; the gate is one scalar per kv
        # head computed from the first kv_heads channels of the hidden state
        self.ve_gate_channels = self.read_cfg(int, "ve_gate_channels",
                                              self.num_kv_heads)
        assert self.ve_gate_channels == self.num_kv_heads, \
            "expected ve_gate_channels == num_key_value_heads"
        self.has_ve = self.stc.has_tensor("value_embeds.1.weight")
        self.has_resid = self.stc.has_tensor("resid_lambdas")
        self.has_backout = self.stc.has_tensor("backout_lambda")


class NanoChatModel(Model):
    config_class = NanoChatConfig

    def __init__(self, config: NanoChatConfig, **kwargs):
        super().__init__(config, **kwargs)

        if config.native_keys:
            emb_key = "transformer.wte"
            layer_prefix = "transformer.h"
            kq, kk, kv, ko = "c_q", "c_k", "c_v", "c_proj"
            kup, kdown = "c_fc", "c_proj"
            kattn = "attn"
        else:
            emb_key = "model.embed_tokens"
            layer_prefix = "model.layers"
            kq, kk, kv, ko = "q_proj", "k_proj", "v_proj", "o_proj"
            kup, kdown = "fc1", "fc2"
            kattn = "self_attn"

        # per-layer scalars are host floats baked into the trace (the
        # reference reads them to python floats too: nanochat.py:119-126)
        resid_lambdas = x0_lambdas = None
        if config.has_resid:
            resid_lambdas = [float(v) for v in config.stc.get_tensor("resid_lambdas")]
            x0_lambdas = [float(v) for v in config.stc.get_tensor("x0_lambdas")]
            assert len(resid_lambdas) == len(x0_lambdas) == config.num_hidden_layers
        backout_lambda = None
        if config.has_backout:
            backout_lambda = float(
                config.stc.get_tensor("backout_lambda").reshape(-1)[0])

        ve_layers = (
            [2 * i + 1 for i in range(config.num_hidden_layers // 2)]
            if config.has_ve else []
        )

        # the VE module runs FIRST (on token ids), stashing every target
        # layer's lookup for the blocks; the reference instead threads
        # input_ids through params (nanochat.py prepare_inputs:265)
        if ve_layers:
            self.modules += [ValueEmbeddings(
                config=config,
                key="value_embeds",
                target_layers=ve_layers,
                vocab_size=config.vocab_size,
                kv_head_dim=config.head_dim,
                num_kv_heads=config.num_kv_heads,
            )]

        self.modules += [
            Embedding(config=config, key=emb_key, vocab_size=config.vocab_size,
                      hidden_size=config.hidden_size),
            RMSNorm(config, "_emb_norm", config.rms_norm_eps, unweighted=True),
        ]
        self.first_block_idx = len(self.modules)

        for idx in range(config.num_hidden_layers):
            lk = f"{layer_prefix}.{idx}"
            ve_gate = None
            if idx in ve_layers:
                ve_gate = Linear(config, f"{lk}.{kattn}.ve_gate",
                                 config.num_kv_heads, config.num_kv_heads)
            self.modules += [
                TransformerBlock(
                    config=config,
                    key=lk,
                    layer_idx=idx,
                    ve_gate=ve_gate,
                    resid_lambda=resid_lambdas[idx] if resid_lambdas else None,
                    x0_lambda=x0_lambdas[idx] if x0_lambdas else None,
                    backout_extract=(idx == config.num_hidden_layers // 2
                                     and backout_lambda is not None),
                    backout_lambda=(backout_lambda
                                    if idx == config.num_hidden_layers - 1
                                    else None),
                    attn_norm=RMSNorm(config, f"{lk}.input_layernorm",
                                      config.rms_norm_eps, unweighted=True),
                    attn=Attention(
                        config=config,
                        key=f"{lk}.{kattn}",
                        layer_idx=idx,
                        hidden_size=config.hidden_size,
                        head_dim=config.head_dim,
                        num_q_heads=config.num_q_heads,
                        num_kv_heads=config.num_kv_heads,
                        rope_settings=config.rope_settings,
                        key_q=kq, key_k=kk, key_v=kv, key_o=ko,
                        qmap="block.attn",
                        post_rope_norm=True,
                        post_rope_eps=config.rms_norm_eps,
                        ve_gate=idx in ve_layers,
                    ),
                    mlp_norm=RMSNorm(config, f"{lk}.post_attention_layernorm",
                                     config.rms_norm_eps, unweighted=True),
                    mlp=MLP(
                        config=config,
                        key=f"{lk}.mlp",
                        hidden_size=config.hidden_size,
                        intermediate_size=config.intermediate_size,
                        key_up=kup,
                        key_down=kdown,
                        qmap="block.mlp",
                        activation="relu2",
                    ),
                )
            ]

        self.last_kv_module_idx = len(self.modules) - 1

        head_alt_key = None
        if config.tie_word_embeddings and not config.stc.has_tensor("lm_head.weight"):
            head_alt_key = emb_key
        self.modules += [
            RMSNorm(config, "model.norm", config.rms_norm_eps,
                    out_dtype=jnp.bfloat16, unweighted=True),
            Linear(
                config=config,
                key="lm_head",
                in_features=config.hidden_size,
                out_features=config.vocab_size,
                qmap="block.lm_head",
                alt_key=head_alt_key,
                out_dtype=jnp.float32,
                softcap=config.final_logit_softcapping,
            ),
        ]
        self.logit_layer_idx = len(self.modules) - 1

    def default_chat_prompt(self, prompt: str, system_prompt: str | None = None) -> str:
        p = "<|bos|>"
        if system_prompt:
            p += system_prompt + "\n\n"
        p += "User: " + prompt + "\n\nAssistant:"
        return p


ARCHITECTURES = [NanoChatConfig]
