"""MTP (multi-token prediction) speculative decoding: the MTP head drafts
from target hidden states; greedy verification must be output-identical to
plain decode."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job

CFG = dict(
    architectures=["Qwen3_5ForCausalLM"], bos_token_id=1, eos_token_id=2,
    vocab_size=512, hidden_size=128, intermediate_size=256,
    max_position_embeddings=4096, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
    rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
    hidden_act="silu",
    # all-attention layer stack: MTP rejection can't rewind recurrent state
    layer_types=["full_attention", "full_attention"],
    linear_num_key_heads=2, linear_num_value_heads=4,
    linear_key_head_dim=16, linear_value_head_dim=16,
    moe_intermediate_size=64, num_experts=0, num_experts_per_tok=0,
    mtp_num_hidden_layers=1,
)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("q35mtp"))
    write_synth_dense_for_arch(d, CFG, seed=23)
    config = Config.from_directory(d)
    model = Model.from_config(config)
    model.load()
    mtp = Model.from_config(config, component="mtp")
    mtp.load()
    return model, mtp


def _gen_tokens(model, mtp, prompt, n):
    cache = Cache(model, CacheSpec(layout="paged", num_pages=8))
    gen = Generator(model, cache, mtp_model=mtp, num_draft_tokens=3)
    job = Job(prompt.copy(), max_new_tokens=n)
    gen.enqueue(job)
    while gen.num_remaining_jobs():
        gen.iterate()
    return job.new_tokens, gen


def test_mtp_decode_matches_plain(models):
    model, mtp = models
    prompt = np.array([5, 9, 13, 2, 7, 44, 91, 3], np.int64)

    cache = Cache(model, CacheSpec(layout="paged", num_pages=8))
    plain = Generator(model, cache)
    job0 = Job(prompt.copy(), max_new_tokens=12)
    plain.enqueue(job0)
    while plain.num_remaining_jobs():
        plain.iterate()

    out, gen = _gen_tokens(model, mtp, prompt, 12)
    assert out == job0.new_tokens
    assert gen.num_drafted > 0  # the MTP path actually drafted


def test_mtp_multiple_jobs(models):
    model, mtp = models
    cache = Cache(model, CacheSpec(layout="paged", num_pages=12))
    gen = Generator(model, cache, mtp_model=mtp, num_draft_tokens=3)
    prompts = [np.array([5, 9, 13], np.int64),
               np.array([100, 200, 31, 7], np.int64)]
    outs = gen.generate([p.copy() for p in prompts], max_new_tokens=8)

    # reference: each prompt alone without MTP
    for p, o in zip(prompts, outs):
        c2 = Cache(model, CacheSpec(layout="paged", num_pages=8))
        g2 = Generator(model, c2)
        ref = g2.generate(p.copy(), max_new_tokens=8)
        assert o == ref
