"""DFlash block-diffusion speculative decoding: greedy verification must be
output-identical to plain decode; the drafter actually proposes tokens."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job

TARGET = dict(
    architectures=["LlamaForCausalLM"], bos_token_id=1, eos_token_id=2,
    vocab_size=512, hidden_size=128, intermediate_size=256,
    max_position_embeddings=4096, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
    rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
    hidden_act="silu",
)
DRAFT = dict(
    architectures=["DFlashDraftModel"], bos_token_id=1, eos_token_id=2,
    vocab_size=512, hidden_size=128, intermediate_size=256,
    max_position_embeddings=4096, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
    rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
    hidden_act="silu",
    layer_types=["sliding_attention", "full_attention"],
    sliding_window=16,
    # ids shift one deeper at load (z-lab convention): [0] -> capture the
    # output of target layer 1
    dflash_config=dict(mask_token_id=3, target_layer_ids=[0],
                       block_size=4),
)

LAGUNA_TARGET = dict(
    architectures=["LagunaForCausalLM"], bos_token_id=1, eos_token_id=2,
    vocab_size=512, hidden_size=128, intermediate_size=256,
    max_position_embeddings=4096, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
    torch_dtype="bfloat16", head_dim=32, hidden_act="silu",
    gating="per-head", num_attention_heads_per_layer=[4, 4],
    layer_types=["full_attention", "sliding_attention"], sliding_window=32,
    rope_parameters={"full_attention": {"rope_theta": 10000.0},
                     "sliding_attention": {"rope_theta": 10000.0}},
    moe_intermediate_size=64, shared_expert_intermediate_size=64,
    num_experts=4, num_experts_per_tok=2, mlp_only_layers=[0],
)
LAGUNA_DRAFT = dict(
    architectures=["DFlashLagunaForCausalLM"], bos_token_id=1, eos_token_id=2,
    vocab_size=512, hidden_size=128, intermediate_size=256,
    max_position_embeddings=4096, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
    rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
    hidden_act="silu", gating="per-head",
    layer_types=["sliding_attention", "sliding_attention"],
    sliding_window=16,
    # raw ids for this family: outputs of target layers 0 and 1
    dflash_config=dict(mask_token_id=3, target_layer_ids=[0, 1],
                       block_size=4, causal=True),
)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    dt = str(tmp_path_factory.mktemp("tgt"))
    dd = str(tmp_path_factory.mktemp("dfl"))
    write_synth_dense_for_arch(dt, TARGET, seed=41)
    write_synth_dense_for_arch(dd, DRAFT, seed=42)
    target = Model.from_config(Config.from_directory(dt))
    target.load()
    draft = Model.from_config(Config.from_directory(dd))
    draft.load()
    return target, draft


def test_dflash_matches_plain(models):
    target, draft = models
    assert draft.caps.get("dflash_draft")
    prompt = np.array([5, 9, 13, 2, 7, 44, 91, 30], np.int64)

    plain = Generator(target, Cache(target, CacheSpec(layout="paged",
                                                      num_pages=8)))
    ref = plain.generate(prompt.copy(), max_new_tokens=12)

    gen = Generator(target, Cache(target, CacheSpec(layout="paged",
                                                    num_pages=8)),
                    draft_model=draft, num_draft_tokens=3)
    assert gen.dflash_model is not None
    out = gen.generate(prompt.copy(), max_new_tokens=12)
    assert out == ref
    assert gen.num_drafted > 0


def test_dflash_batched(models):
    target, draft = models
    gen = Generator(target, Cache(target, CacheSpec(layout="paged",
                                                    num_pages=16)),
                    draft_model=draft, num_draft_tokens=3)
    prompts = [np.array([5, 9, 13], np.int64),
               np.array([100, 200, 31, 7, 5], np.int64)]
    outs = gen.generate([p.copy() for p in prompts], max_new_tokens=8)
    for p, o in zip(prompts, outs):
        plain = Generator(target, Cache(target, CacheSpec(layout="paged",
                                                          num_pages=8)))
        assert o == plain.generate(p.copy(), max_new_tokens=8)


@pytest.fixture(scope="module")
def laguna_models(tmp_path_factory):
    dt = str(tmp_path_factory.mktemp("ltgt"))
    dd = str(tmp_path_factory.mktemp("ldfl"))
    write_synth_dense_for_arch(dt, LAGUNA_TARGET, seed=43)
    # fused flag exercises the single qkv_proj tensor layout the real
    # checkpoints use
    write_synth_dense_for_arch(dd, LAGUNA_DRAFT, seed=44, fused_phi3=True)
    target = Model.from_config(Config.from_directory(dt))
    target.load()
    draft = Model.from_config(Config.from_directory(dd))
    draft.load()
    return target, draft


def test_dflash_laguna_matches_plain(laguna_models):
    target, draft = laguna_models
    assert draft.caps.get("dflash_draft")
    assert draft.causal_draft
    assert draft.target_layer_ids == [0, 1]
    prompt = np.array([5, 9, 13, 2, 7, 44, 91, 30], np.int64)

    plain = Generator(target, Cache(target, CacheSpec(layout="paged",
                                                      num_pages=8)))
    ref = plain.generate(prompt.copy(), max_new_tokens=12)

    gen = Generator(target, Cache(target, CacheSpec(layout="paged",
                                                    num_pages=8)),
                    draft_model=draft, num_draft_tokens=3)
    assert gen.dflash_model is not None
    out = gen.generate(prompt.copy(), max_new_tokens=12)
    assert out == ref
    assert gen.num_drafted > 0
