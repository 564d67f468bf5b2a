"""Architecture breadth: synthetic dense checkpoints for every registered
arch must load and produce finite logits, and cached decode must match the
cacheless forward (exercises sliding windows, softcaps, QK norms, MoE...)."""
import numpy as np
import jax.numpy as jnp
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec

BASE = dict(
    bos_token_id=1, eos_token_id=2, vocab_size=512, hidden_size=128,
    intermediate_size=256, max_position_embeddings=4096,
    num_attention_heads=4, num_key_value_heads=2, num_hidden_layers=2,
    rms_norm_eps=1e-5, rope_theta=10000.0, torch_dtype="bfloat16",
    head_dim=32,
)

ARCH_CFGS = {
    "LlamaForCausalLM": dict(BASE, hidden_act="silu",
                             rope_scaling={"rope_type": "llama3", "factor": 8.0,
                                           "low_freq_factor": 1.0,
                                           "high_freq_factor": 4.0,
                                           "original_max_position_embeddings": 1024}),
    "MistralForCausalLM": dict(BASE, hidden_act="silu"),
    "Qwen2ForCausalLM": dict(BASE, hidden_act="silu"),
    "Qwen3ForCausalLM": dict(BASE, hidden_act="silu"),
    "Gemma2ForCausalLM": dict(BASE, hidden_act="gelu_pytorch_tanh",
                              sliding_window=64, query_pre_attn_scalar=32,
                              attn_logit_softcapping=50.0,
                              final_logit_softcapping=30.0,
                              tie_word_embeddings=True),
    "Gemma3ForCausalLM": dict(BASE, hidden_act="gelu_pytorch_tanh",
                              sliding_window=64, sliding_window_pattern=2,
                              rope_local_base_freq=10000.0,
                              query_pre_attn_scalar=32,
                              tie_word_embeddings=True),
    "Phi3ForCausalLM": dict(BASE, hidden_act="silu"),
    "MixtralForCausalLM": dict(BASE, hidden_act="silu", num_local_experts=4,
                               num_experts_per_tok=2),
    "Qwen3MoeForCausalLM": dict(BASE, hidden_act="silu", num_experts=4,
                                num_experts_per_tok=2, norm_topk_prob=True,
                                moe_intermediate_size=128),
    "DeepseekV3ForCausalLM": dict(BASE, hidden_act="silu", kv_lora_rank=64,
                                  qk_nope_head_dim=32, qk_rope_head_dim=32,
                                  v_head_dim=32, n_routed_experts=8,
                                  num_experts_per_tok=2, n_shared_experts=1,
                                  moe_intermediate_size=64,
                                  first_k_dense_replace=1, n_group=2,
                                  topk_group=1, routed_scaling_factor=2.5,
                                  scoring_func="sigmoid"),
    "DeepseekV2ForCausalLM": dict(BASE, hidden_act="silu", q_lora_rank=48,
                                  kv_lora_rank=64, qk_nope_head_dim=32,
                                  qk_rope_head_dim=32, v_head_dim=32,
                                  n_routed_experts=4, num_experts_per_tok=2,
                                  n_shared_experts=2, moe_intermediate_size=64,
                                  first_k_dense_replace=1,
                                  scoring_func="softmax",
                                  topk_method="group_limited_greedy"),
    "DeepseekForCausalLM": dict(BASE, hidden_act="silu", n_routed_experts=4,
                                num_experts_per_tok=2, n_shared_experts=1,
                                moe_intermediate_size=64,
                                first_k_dense_replace=1),
    "Qwen3NextForCausalLM": dict(BASE, hidden_act="silu",
                                 full_attention_interval=2,
                                 linear_conv_kernel_dim=4,
                                 linear_num_key_heads=2,
                                 linear_num_value_heads=4,
                                 linear_key_head_dim=16,
                                 linear_value_head_dim=16,
                                 num_experts=4, num_experts_per_tok=2,
                                 moe_intermediate_size=64,
                                 shared_expert_intermediate_size=64,
                                 decoder_sparse_step=1, norm_topk_prob=True,
                                 partial_rotary_factor=0.25),
    "NemotronHForCausalLM": dict(BASE, num_hidden_layers=4,
                                 hybrid_override_pattern="M*-E",
                                 mamba_num_heads=4, mamba_head_dim=16,
                                 ssm_state_size=16, n_groups=2, conv_kernel=4,
                                 n_routed_experts=4, num_experts_per_tok=2,
                                 moe_intermediate_size=64,
                                 moe_shared_expert_intermediate_size=64,
                                 layer_norm_epsilon=1e-5),
    "SeedOssForCausalLM": dict(BASE, hidden_act="silu"),
    "MiMoForCausalLM": dict(BASE, hidden_act="silu"),
    "IQuestCoderForCausalLM": dict(BASE, hidden_act="silu"),
    "Ministral3ForCausalLM": dict(BASE, hidden_act="silu"),
    "ArceeForCausalLM": dict(BASE, hidden_act="relu2"),
    "ApertusForCausalLM": dict(BASE, hidden_act="xielu"),
    "SmolLM3ForCausalLM": dict(BASE, hidden_act="silu",
                               no_rope_layers=[1, 0], tie_word_embeddings=True),
    "Exaone4ForCausalLM": dict(BASE, hidden_act="silu", sliding_window=64,
                               sliding_window_pattern="LG"),
    "Olmo3ForCausalLM": dict(BASE, hidden_act="silu", sliding_window=64,
                             layer_types=["sliding_attention", "full_attention"],
                             rope_scaling={"rope_type": "yarn", "factor": 4.0,
                                           "original_max_position_embeddings": 1024}),
    "CohereForCausalLM": dict(BASE, hidden_act="silu", use_qk_norm=True,
                              layer_norm_eps=1e-5, logit_scale=0.125,
                              tie_word_embeddings=True),
    "Cohere2ForCausalLM": dict(BASE, hidden_act="silu", sliding_window=64,
                               sliding_window_pattern=2, layer_norm_eps=1e-5,
                               order_of_interleaved_layers="local_attn_first",
                               tie_word_embeddings=True),
    "GptOssForCausalLM": dict(BASE, hidden_act="silu", sliding_window=64,
                              layer_types=["sliding_attention", "full_attention"],
                              num_local_experts=4, num_experts_per_tok=2,
                              swiglu_limit=7.0),
    "Glm4ForCausalLM": dict(BASE, hidden_act="silu",
                            partial_rotary_factor=0.5),
    "Glm4MoeForCausalLM": dict(BASE, hidden_act="silu", use_qk_norm=True,
                               moe_intermediate_size=64, n_routed_experts=8,
                               num_experts_per_tok=2, n_shared_experts=1,
                               first_k_dense_replace=1, n_group=1, topk_group=1,
                               norm_topk_prob=True),
    "SolarOpenForCausalLM": dict(BASE, hidden_act="silu",
                                 moe_intermediate_size=64, n_routed_experts=4,
                                 num_experts_per_tok=2, n_shared_experts=1,
                                 first_k_dense_replace=1, norm_topk_prob=True),
    "Dots1ForCausalLM": dict(BASE, hidden_act="silu", scoring_func="noaux_tc",
                             moe_intermediate_size=64, n_routed_experts=8,
                             num_experts_per_tok=2, n_shared_experts=1,
                             first_k_dense_replace=1, norm_topk_prob=True),
    "Ernie4_5_ForCausalLM": dict(BASE, hidden_act="silu"),
    "Ernie4_5_MoeForCausalLM": dict(BASE, hidden_act="silu",
                                    moe_intermediate_size=64,
                                    moe_num_experts=4, moe_k=2,
                                    moe_num_shared_experts=1,
                                    moe_layer_start_index=1),
    "MiniMaxM2ForCausalLM": dict(BASE, hidden_act="silu",
                                 num_local_experts=4, num_experts_per_tok=2,
                                 norm_topk_prob=True),
    "Qwen3_5ForCausalLM": dict(BASE, hidden_act="silu",
                               full_attention_interval=2,
                               linear_conv_kernel_dim=4,
                               linear_num_key_heads=2,
                               linear_num_value_heads=4,
                               linear_key_head_dim=16,
                               linear_value_head_dim=16),
    "Qwen3_5MoeForCausalLM": dict(BASE, hidden_act="silu",
                                  full_attention_interval=2,
                                  linear_conv_kernel_dim=4,
                                  linear_num_key_heads=2,
                                  linear_num_value_heads=4,
                                  linear_key_head_dim=16,
                                  linear_value_head_dim=16,
                                  num_experts=4, num_experts_per_tok=2,
                                  moe_intermediate_size=64,
                                  shared_expert_intermediate_size=64,
                                  norm_topk_prob=True),
    "Lfm2MoeForCausalLM": dict(BASE, hidden_act="silu", conv_L_cache=3,
                               norm_eps=1e-5, num_experts=4,
                               num_experts_per_tok=2, num_dense_layers=1,
                               moe_intermediate_size=64, use_expert_bias=True,
                               layer_types=["conv", "full_attention"]),
    "OlmoHybridForCausalLM": dict(BASE, hidden_act="silu",
                                  full_attention_interval=2,
                                  linear_conv_kernel_dim=4,
                                  linear_num_key_heads=2,
                                  linear_num_value_heads=4,
                                  linear_key_head_dim=16,
                                  linear_value_head_dim=16,
                                  linear_allow_neg_eigval=True),
    "DeciLMForCausalLM": dict(BASE, hidden_act="silu", num_hidden_layers=4,
                              block_configs=[
                                  {"attention": {"n_heads_in_group": 2},
                                   "ffn": {"ffn_mult": 3.0}},
                                  {"attention": {"no_op": True},
                                   "ffn": {"ffn_mult": 1.5}},
                                  {"attention": {"n_heads_in_group": 4},
                                   "ffn": {"no_op": True}},
                                  {"attention": {"n_heads_in_group": 1},
                                   "ffn": {"ffn_mult": 3.0}},
                              ]),
    "HYV3ForCausalLM": dict(BASE, hidden_act="silu", qk_norm=True,
                            moe_intermediate_size=64, num_experts=4,
                            num_experts_per_tok=2, num_shared_experts=1,
                            first_k_dense_replace=1,
                            router_scaling_factor=2.826),
    "DeepseekV32ForCausalLM": dict(BASE, hidden_act="silu", q_lora_rank=48,
                                   kv_lora_rank=64, qk_nope_head_dim=32,
                                   qk_rope_head_dim=32, v_head_dim=32,
                                   n_routed_experts=4, num_experts_per_tok=2,
                                   n_shared_experts=1,
                                   moe_intermediate_size=64,
                                   first_k_dense_replace=1,
                                   scoring_func="sigmoid", index_n_heads=4,
                                   index_head_dim=32, index_topk=8),
    "Step3p5ForCausalLM": dict(
        BASE, num_hidden_layers=2, num_attention_groups=2,
        attention_other_setting={"head_dim": 32, "num_attention_heads": 4,
                                 "num_attention_groups": 2},
        layer_types=["sliding_attention", "full_attention"],
        sliding_window=64, rope_theta=[10000.0, 100000.0],
        partial_rotary_factors=[0.5, 1.0], hidden_act="silu",
        moe_intermediate_size=64, moe_num_experts=4, moe_top_k=2,
        share_expert_dim=64, moe_layers_enum="1",
        swiglu_limits=[7.0, 7.0], swiglu_limits_shared=[7.0, 7.0],
        use_qk_norm=True),
    "HyperCLOVAXForCausalLM": dict(BASE, hidden_act="silu",
                                   embedding_multiplier=12.0,
                                   logits_scaling=8.0,
                                   attention_multiplier=0.13),
    "Qwen2_5_VLForConditionalGeneration": dict(
        BASE, hidden_act="silu",
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]}),
    "Qwen3VLForConditionalGeneration": dict(BASE, hidden_act="silu"),
    "Glm4vForConditionalGeneration": dict(BASE, hidden_act="silu"),
    "Mistral3ForConditionalGeneration": dict(
        BASE, text_config=dict(hidden_size=128, intermediate_size=256,
                               num_attention_heads=4, num_key_value_heads=2,
                               num_hidden_layers=2, rms_norm_eps=1e-5,
                               rope_theta=10000.0, head_dim=32,
                               hidden_act="silu", vocab_size=512)),
    "AfmoeForCausalLM": dict(BASE, hidden_act="silu", num_dense_layers=1,
                             moe_intermediate_size=64, num_experts=4,
                             num_experts_per_tok=2, num_shared_experts=1,
                             route_norm=True, route_scale=1.5,
                             sliding_window=64,
                             layer_types=["sliding_attention", "full_attention"]),
    "NanoChatForCausalLM": dict(BASE, hidden_act="relu2",
                                num_hidden_layers=4,
                                final_logit_softcapping=15.0),
    "LagunaForCausalLM": dict(BASE, hidden_act="silu", gating="per-head",
                              num_attention_heads_per_layer=[4, 2],
                              layer_types=["full_attention",
                                           "sliding_attention"],
                              sliding_window=64,
                              rope_parameters={
                                  "full_attention": {"rope_theta": 10000.0,
                                                     "rope_type": "yarn",
                                                     "factor": 2.0,
                                                     "original_max_position_embeddings": 2048},
                                  "sliding_attention": {"rope_theta": 10000.0}},
                              moe_intermediate_size=64,
                              shared_expert_intermediate_size=64,
                              num_experts=4, num_experts_per_tok=2,
                              mlp_only_layers=[0],
                              moe_routed_scaling_factor=1.5),
}


@pytest.mark.parametrize("arch", sorted(ARCH_CFGS.keys()))
def test_arch_forward_and_cache(arch, tmp_path):
    cfg = dict(ARCH_CFGS[arch])
    cfg["architectures"] = [arch]
    d = str(tmp_path / arch)
    fused = arch == "Phi3ForCausalLM"
    # zlib.crc32 is stable across processes (hash() is salted per run)
    import zlib

    write_synth_dense_for_arch(d, cfg, seed=zlib.crc32(arch.encode()) % 1000,
                               fused_phi3=fused)

    model = Model.from_config(Config.from_directory(d))
    model.load()

    rng = np.random.default_rng(0)
    B, S = 1, 10
    ids = rng.integers(0, 500, size=(B, S)).astype(np.int32)
    full = np.asarray(model.forward_simple(ids))
    assert np.isfinite(full).all(), arch
    assert full.shape == (B, S, cfg["vocab_size"])

    # cached decode parity
    cache = Cache(model, CacheSpec(layout="linear", batch_size=B, max_len=16))
    step = model.jitted_step("dense", donate_cache=False)
    pos = np.broadcast_to(np.arange(6, dtype=np.int32), (B, 6))
    l1, cache.state = step(model.params, jnp.asarray(ids[:, :6]), cache.state,
                           jnp.asarray(pos), jnp.zeros(B, jnp.int32), None)
    outs = [np.asarray(l1)]
    for t in range(6, S):
        pt = np.full((B, 1), t, np.int32)
        lt, cache.state = step(model.params, jnp.asarray(ids[:, t:t+1]), cache.state,
                               jnp.asarray(pt), jnp.full(B, t, np.int32), None)
        outs.append(np.asarray(lt))
    inc = np.concatenate(outs, axis=1)
    assert (inc.argmax(-1) == full.argmax(-1)).mean() > 0.9, arch
