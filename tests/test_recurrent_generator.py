"""Generator end-to-end with recurrent-state (GDN) hybrid models: per-job
state slots must isolate concurrent jobs, and batched continuous decoding
must match single-job greedy decoding."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job


CFG = dict(
    architectures=["Qwen3NextForCausalLM"], bos_token_id=1, eos_token_id=2,
    vocab_size=512, hidden_size=128, intermediate_size=256,
    max_position_embeddings=4096, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
    rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
    hidden_act="silu", full_attention_interval=2, linear_conv_kernel_dim=4,
    linear_num_key_heads=2, linear_num_value_heads=4, linear_key_head_dim=16,
    linear_value_head_dim=16, num_experts=4, num_experts_per_tok=2,
    moe_intermediate_size=64, shared_expert_intermediate_size=64,
    decoder_sparse_step=1, norm_topk_prob=True, partial_rotary_factor=0.25,
)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("q3n"))
    write_synth_dense_for_arch(d, CFG, seed=11)
    m = Model.from_config(Config.from_directory(d))
    m.load()
    return m


def _greedy_ref(model, prompt, n):
    """Naive greedy loop with a linear cache (slots = row 0)."""
    import jax.numpy as jnp

    cache = Cache(model, CacheSpec(layout="linear", batch_size=1, max_len=256))
    step = model.jitted_step("dense", donate_cache=False)
    ids = np.asarray(prompt, np.int32)[None]
    pos = np.arange(ids.shape[1], dtype=np.int32)[None]
    logits, cache.state = step(model.params, jnp.asarray(ids), cache.state,
                               jnp.asarray(pos), jnp.zeros(1, np.int32), None)
    toks = []
    tok = int(np.asarray(logits[0, -1]).argmax())
    toks.append(tok)
    t = ids.shape[1]
    for _ in range(n - 1):
        lt, cache.state = step(model.params, jnp.asarray([[tok]]), cache.state,
                               jnp.asarray([[t]]), jnp.full(1, t, np.int32), None)
        tok = int(np.asarray(lt[0, -1]).argmax())
        toks.append(tok)
        t += 1
    return toks


def test_recurrent_generator_matches_reference(model):
    cache = Cache(model, CacheSpec(layout="paged", num_pages=16,
                                   recurrent_slots=9))
    gen = Generator(model, cache, tokenizer=None, max_batch_size=8)
    assert gen.has_recurrent
    assert gen.pagetable.disable_reuse

    prompts = [[5, 9, 13, 2, 7], [3, 3, 8, 1], [100, 200, 300, 17, 4, 90]]
    n = 10
    refs = [_greedy_ref(model, p, n) for p in prompts]
    outs = gen.generate([np.asarray(p, np.int32) for p in prompts],
                        max_new_tokens=n)
    for got, ref in zip(outs, refs):
        # batched paged decode vs single-row linear decode: tiny numeric
        # divergence may flip a rare argmax; demand near-total agreement
        agree = np.mean([a == b for a, b in zip(got, ref)])
        assert agree >= 0.8, (got, ref)


def test_recurrent_ngram_sd_matches_plain(model):
    """Speculative decoding on a recurrent hybrid: per-step state history
    rewinds rejected tokens, so output must equal plain greedy decode."""
    # repetitive prompt so the suffix automaton actually drafts
    prompt = np.array([7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8], np.int64)

    gen_plain = Generator(model, Cache(model, CacheSpec(
        layout="paged", num_pages=16, recurrent_slots=5)), max_batch_size=4)
    ref = gen_plain.generate(prompt.copy(), max_new_tokens=12)

    gen_sd = Generator(model, Cache(model, CacheSpec(
        layout="paged", num_pages=16, recurrent_slots=5)), max_batch_size=4,
        use_ngram_draft=True, num_draft_tokens=3)
    out = gen_sd.generate(prompt.copy(), max_new_tokens=12)
    assert out == ref
    assert gen_sd.num_drafted > 0


def test_recurrent_slot_reuse_is_clean(model):
    """A new job on a recycled slot must not see the previous job's state."""
    cache = Cache(model, CacheSpec(layout="paged", num_pages=16,
                                   recurrent_slots=3))
    gen = Generator(model, cache, tokenizer=None, max_batch_size=2)
    p = [7, 11, 23, 5]
    first = gen.generate([np.asarray(p, np.int32)], max_new_tokens=6)[0]
    # same prompt again — reuses slot 0 after the first job freed it
    second = gen.generate([np.asarray(p, np.int32)], max_new_tokens=6)[0]
    assert first == second
