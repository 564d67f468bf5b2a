"""End-to-end dispatch through the Pallas flash kernel (interpret mode):
prefill + decode + n-gram SD verify + quantized cache must generate the
same tokens as the jnp dense path."""
import os

import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, GreedySampler

CFG = dict(
    architectures=["LlamaForCausalLM"], bos_token_id=1, eos_token_id=2,
    vocab_size=512, hidden_size=128, intermediate_size=256,
    max_position_embeddings=4096, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
    rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
    hidden_act="silu", tie_word_embeddings=True,
)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("flash_e2e"))
    write_synth_dense_for_arch(d, CFG, seed=23)
    return d


def _generate(model_dir, backend, prompt, k_bits=0, v_bits=0, compand=0.0,
              **gkw):
    os.environ["EXL3_TPU_ATTN"] = backend
    try:
        m = Model.from_config(Config.from_directory(model_dir))
        m.load()
        cache = Cache(m, CacheSpec(layout="paged", num_pages=16,
                                   k_bits=k_bits, v_bits=v_bits,
                                   compand_a=compand))
        gen = Generator(m, cache, **gkw)
        return gen.generate(np.asarray(prompt), max_new_tokens=16,
                            sampler=GreedySampler(), decode_text=False)
    finally:
        os.environ.pop("EXL3_TPU_ATTN", None)


def test_flash_generate_matches_dense(model_dir):
    prompt = (np.arange(40) % 300 + 5).tolist()
    dense = _generate(model_dir, "dense", prompt)
    flash = _generate(model_dir, "interpret", prompt)
    assert flash == dense


def test_flash_sd_verify_matches_dense(model_dir):
    base = (np.arange(6) * 7 % 250 + 3).tolist()
    prompt = base * 4 + base[:2]
    kw = dict(use_ngram_draft=True, num_draft_tokens=4)
    dense = _generate(model_dir, "dense", prompt, **kw)
    flash = _generate(model_dir, "interpret", prompt, **kw)
    assert flash == dense


def _paged_logits(model_dir, backend, k_bits=0, compand=0.0):
    """Prefill 32 tokens + one decode step through the paged step fn."""
    import jax.numpy as jnp

    os.environ["EXL3_TPU_ATTN"] = backend
    try:
        m = Model.from_config(Config.from_directory(model_dir))
        m.load()
        cache = Cache(m, CacheSpec(layout="paged", num_pages=4,
                                   k_bits=k_bits, v_bits=k_bits,
                                   compand_a=compand))
        import jax

        step = jax.jit(m.step_fn("paged", k_bits=k_bits, v_bits=k_bits,
                                 compand_a=compand))
        ids = (np.arange(32) % 300 + 5).astype(np.int32)[None]
        pos = np.arange(32, dtype=np.int32)[None]
        bt = np.array([[1, 2, 3]], np.int32)
        lp, state = step(m.params, jnp.asarray(ids), cache.state,
                         jnp.asarray(pos), jnp.zeros(1, jnp.int32),
                         jnp.asarray(bt))
        l1, _ = step(m.params, jnp.asarray([[7]], np.int32), state,
                     jnp.asarray([[32]], np.int32),
                     jnp.full(1, 32, jnp.int32), jnp.asarray(bt))
        return np.asarray(lp[0, -1]), np.asarray(l1[0, -1])
    finally:
        os.environ.pop("EXL3_TPU_ATTN", None)


@pytest.mark.parametrize("compand", [0.0, 0.65])
def test_flash_quant_cache_close_to_dense(model_dir, compand):
    """Quantized caches: the kernel's in-kernel dequant and the jnp
    dequantize-then-attend round bf16 in different places (the group
    rotation folds into q/output on the kernel path), so compare logits
    rather than greedy token streams."""
    dp, dd = _paged_logits(model_dir, "dense", k_bits=4, compand=compand)
    fp, fd = _paged_logits(model_dir, "interpret", k_bits=4, compand=compand)
    for a, b in ((dp, fp), (dd, fd)):
        denom = np.maximum(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.05
        assert a.argmax() == b.argmax()


def test_flash_swa_ring_matches_dense(model_dir, tmp_path):
    """SWA-ring decode kernel through the generator: identical tokens to
    the dense ring path."""
    from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch

    d = str(tmp_path / "g2")
    cfg = dict(
        architectures=["Gemma2ForCausalLM"], bos_token_id=2, eos_token_id=1,
        vocab_size=512, hidden_size=128, intermediate_size=256,
        max_position_embeddings=4096, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
        rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
        hidden_act="gelu_pytorch_tanh", sliding_window=8,
        query_pre_attn_scalar=32, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, tie_word_embeddings=True,
    )
    write_synth_dense_for_arch(d, cfg, seed=19)

    def run(backend):
        os.environ["EXL3_TPU_ATTN"] = backend
        try:
            m = Model.from_config(Config.from_directory(d))
            m.load()
            cache = Cache(m, CacheSpec(layout="paged", num_pages=8,
                                       swa_ring=True, recurrent_slots=5))
            gen = Generator(m, cache, max_batch_size=4)
            prompt = np.arange(30, dtype=np.int64) % 200 + 3
            return gen.generate(prompt, max_new_tokens=16,
                                sampler=GreedySampler(), decode_text=False)
        finally:
            os.environ.pop("EXL3_TPU_ATTN", None)

    assert run("interpret") == run("dense")
