"""DeepSeek-V4: hybrid sparse attention (sliding/CSA/HCA per compress_ratios),
mHC hyper-connection residual streams, hash-MoE bootstrap layers and
sqrt-softplus routing, in DeepSeek's native tensor namespace
(layers.N.attn.wq_a, hc_attn_fn, embed/head/norm).

Feature reference: /root/reference/exllamav3/architecture/deepseek_v4.py
(DeepseekV4Config:21, DeepseekV4Model:108). The DSpark MTP drafter
(deepseek_v4_mtp.py) is not ported yet — tracked in doc/COMPONENTS.md.
"""
from __future__ import annotations

import jax
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
from ..modules.dsv4_attn import DSV4Attention, DSparkAttention

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

        # DSpark drafter (mtp.* namespace; reference deepseek_v4.py:91-106).
        # The compress_ratios tail past the trunk layers describes the MTP
        # blocks; the component exists only when the checkpoint carries it.
        self.dspark_block_size = self.read_cfg(int, "dspark_block_size", 0)
        self.dspark_noise_token_id = self.read_cfg(
            int, "dspark_noise_token_id", 0)
        self.dspark_markov_rank = self.read_cfg(int, "dspark_markov_rank", 256)
        self.dspark_target_layer_ids = self.read_cfg(
            list, "dspark_target_layer_ids", [])
        if ratios is not None and len(ratios) > self.num_hidden_layers:
            self.num_mtp_layers = len(ratios) - self.num_hidden_layers
            self.mtp_layer_types = [
                _RATIO_TO_TYPE[r] for r in ratios[self.num_hidden_layers:]]
        else:
            self.num_mtp_layers = 0
            self.mtp_layer_types = []
        # empty stc = synthetic-checkpoint build time: register so the
        # writer emits the component's tensors
        if self.num_mtp_layers and (
                not any(True for _ in self.stc.keys())
                or self.stc.has_tensor("mtp.0.attn.wkv.weight")):
            self.model_classes["mtp"] = DeepseekV4MTPModel


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


class DeepseekV4MTPModel(Model):
    """DSpark block drafter (reference deepseek_v4_mtp.py:31 and
    modules/arch_specific/dspark.py): n_mtp compressor-less DSA blocks with
    mHC streams and sqrtsp MoE, entered through main_proj/main_norm over the
    trunk's stream-mean taps at dspark_target_layer_ids and exited through
    the last block's hc_head + norm into the SHARED trunk head. The last
    block carries a factorized-bigram markov head (per-step logit bias in
    the sequential greedy loop) and a confidence head that caps the usable
    draft length. Drives the generator's DFlash flow."""

    config_class = None  # component model

    def __init__(self, config: DeepseekV4Config, **kwargs):
        super().__init__(config, **kwargs)
        h = config.hidden_size
        n_taps = max(len(config.dspark_target_layer_ids), 1)
        self.block_size = config.dspark_block_size + 1  # + the seed slot
        self.mask_token_id = config.dspark_noise_token_id
        self.target_layer_ids = list(config.dspark_target_layer_ids)
        self.hc_mult = config.hc_mult

        self.main_proj = Linear(config, "mtp.0.main_proj", n_taps * h, h)
        self.main_norm = RMSNorm(config, "mtp.0.main_norm",
                                 config.rms_norm_eps)
        self.modules = [self.main_proj, self.main_norm]
        self.first_block_idx = len(self.modules)
        self.blocks = []
        self.attn_modules = []
        for idx in range(config.num_mtp_layers):
            assert config.mtp_layer_types[idx] == "sliding", \
                "DeepseekV4 MTP: expected compressor-less (sliding) blocks"
            key = f"mtp.{idx}"
            attn = DSparkAttention(
                config=config, key=f"{key}.attn", layer_idx=idx,
                layer_type="sliding", hidden_size=h,
                num_q_heads=config.num_q_heads, head_dim=config.head_dim,
                rope_head_dim=config.qk_rope_head_dim,
                q_lora_rank=config.q_lora_rank, o_groups=config.o_groups,
                o_lora_rank=config.o_lora_rank,
                sliding_window=config.sliding_window,
                rope_theta=config.rope_theta,
                compress_rope_theta=config.compress_rope_theta,
                rope_scaling=config.rope_scaling,
                rms_norm_eps=config.rms_norm_eps, qmap="block.attn")
            self.attn_modules.append(attn)
            mlp = BlockSparseMLP(
                config=config, key=f"{key}.ffn", hidden_size=h,
                intermediate_size=config.moe_intermediate_size,
                num_experts=config.num_experts,
                num_experts_per_tok=config.num_experts_per_tok,
                key_up="w3", key_gate="w1", key_down="w2",
                key_routing_gate="gate", key_e_score_bias="gate.bias",
                qmap="block.mlp", activation="silu",
                act_clamp=config.swiglu_limit, routing="sqrtsp",
                routed_scaling_factor=config.routed_scaling_factor,
                shared_experts=GatedMLP(
                    config=config, key=f"{key}.ffn.shared_experts",
                    hidden_size=h,
                    intermediate_size=(config.moe_intermediate_size
                                       * config.num_shared_experts),
                    key_up="w3", key_gate="w1", key_down="w2",
                    qmap="block.mlp", activation="silu",
                    act_clamp=config.swiglu_limit))

            def _hc(tag):
                return HyperConnection(
                    config=config, key=f"{key}.hc_{tag}",
                    hc_mult=config.hc_mult, hidden_size=h,
                    sinkhorn_iters=config.hc_sinkhorn_iters,
                    hc_eps=config.hc_eps, rms_norm_eps=config.rms_norm_eps)

            blk = TransformerBlock(
                config=config, key=key, layer_idx=idx,
                attn_norm=RMSNorm(config, f"{key}.attn_norm",
                                  config.rms_norm_eps),
                attn=attn, attn_hc=_hc("attn"),
                mlp_norm=RMSNorm(config, f"{key}.ffn_norm",
                                 config.rms_norm_eps),
                mlp=mlp, mlp_hc=_hc("ffn"))
            self.blocks.append(blk)
            self.modules.append(blk)
        self.last_kv_module_idx = len(self.modules) - 1
        last = f"mtp.{config.num_mtp_layers - 1}"
        self.hc_head = HyperHead(config, f"{last}.hc_head",
                                 hc_mult=config.hc_mult,
                                 rms_norm_eps=config.rms_norm_eps,
                                 hc_eps=config.hc_eps)
        self.final_norm = RMSNorm(config, f"{last}.norm", config.rms_norm_eps,
                                  out_dtype=jnp.bfloat16)
        self.markov_w1 = Embedding(config, f"{last}.markov_head.markov_w1",
                                   vocab_size=config.vocab_size,
                                   hidden_size=config.dspark_markov_rank)
        self.markov_w2 = Linear(config, f"{last}.markov_head.markov_w2",
                                config.dspark_markov_rank, config.vocab_size)
        self.confidence = Linear(config, f"{last}.confidence_head.proj",
                                 h + config.dspark_markov_rank, 1)
        self.modules += [self.hc_head, self.final_norm, self.markov_w1,
                         self.markov_w2, self.confidence]
        self.logit_layer_idx = None
        self.caps["dflash_draft"] = True
        self.draft_conf_threshold = 0.5
        self.target = None

    def attach(self, target_model):
        self.target = target_model
        self.embed = next(m for m in target_model.root.walk()
                          if isinstance(m, Embedding))
        self.head = target_model.modules[target_model.logit_layer_idx]

    # -- context update: trunk taps -> main-kv rows -----------------------------

    def update_fn(self):
        from ..modules.module import ForwardCtx

        def fn(d_params, th, cache_state, positions, block_tables, seqlens):
            ctx = ForwardCtx(positions=positions, attn_mode="paged",
                             cache=dict(cache_state),
                             block_tables=block_tables, cache_seqlens=seqlens)
            if th.ndim == 4:
                # trunk taps are mHC stream stacks; export the stream mean
                # (reference transformer.py export_state:~255)
                th = jnp.mean(th, axis=2)
            mx = self.main_norm.forward(
                self.main_proj.forward(th, d_params, ctx), d_params, ctx)
            for attn in self.attn_modules:
                attn.update_kv_rows(mx, d_params, ctx)
            return ctx.cache

        return fn

    # -- drafting: [seed | noise x (block-1)] + markov/confidence heads ---------

    def draft_fn(self):
        from ..modules.module import ForwardCtx

        def fn(t_params, d_params, ids, cache_state, positions, block_tables):
            # the generator sizes the block to block_size = ds_block + 1
            # (seed slot convention); the DSpark forward runs ds_block tokens
            s = ids.shape[1] - 1
            ids_b = ids[:, :s]
            pos_b = positions[:, :s]
            ctx = ForwardCtx(positions=pos_b, attn_mode="paged",
                             cache=dict(cache_state),
                             block_tables=block_tables)
            x = self.embed.forward(ids_b, t_params, ctx)
            x = jnp.broadcast_to(
                x.astype(jnp.float32)[:, :, None, :],
                x.shape[:2] + (self.hc_mult, x.shape[-1]))
            for blk in self.blocks:
                x = blk.forward(x, d_params, ctx)
            prenorm = self.hc_head.forward(x, d_params, ctx)
            state = self.final_norm.forward(prenorm, d_params, ctx)
            logits = self.head.forward(state, t_params, ctx) \
                .astype(jnp.float32)                          # (B, s, V)

            # sequential greedy chain with the markov bigram bias
            w1 = d_params[self.markov_w1.key]["weight"]       # (V, rank)

            def body(tok, i):
                emb = w1[tok]                                 # (B, rank)
                bias = self.markov_w2.forward(
                    emb[:, None, :].astype(jnp.bfloat16), d_params,
                    ctx)[:, 0].astype(jnp.float32)
                nxt = jnp.argmax(logits[:, i] + bias, axis=-1) \
                    .astype(jnp.int32)
                return nxt, (nxt, emb.astype(jnp.float32))

            _, (toks, embs) = jax.lax.scan(body, ids[:, 0],
                                           jnp.arange(s, dtype=jnp.int32))
            drafts = jnp.swapaxes(toks, 0, 1)                 # (B, s)
            embs = jnp.swapaxes(embs, 0, 1)                   # (B, s, rank)

            # confidence-capped draft length (pre-norm hidden + markov emb)
            ci = jnp.concatenate(
                [prenorm.astype(jnp.float32), embs], axis=-1)
            conf = self.confidence.forward(
                ci.astype(jnp.bfloat16), d_params, ctx).astype(jnp.float32)
            keep = jax.nn.sigmoid(conf[..., 0]) >= self.draft_conf_threshold
            lens = jnp.sum(jnp.cumprod(keep.astype(jnp.int32), axis=1),
                           axis=1)
            return drafts, lens

        return fn


ARCHITECTURES = [DeepseekV4Config]
