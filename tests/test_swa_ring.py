"""SWA ring cache: sliding-window layers on a fixed W+1-slot ring must be
output-identical to the full-length cache (the ring holds exactly the
visible window), at a fraction of the memory."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job

CFG = dict(
    architectures=["Gemma2ForCausalLM"], bos_token_id=2, eos_token_id=1,
    vocab_size=512, hidden_size=128, intermediate_size=256,
    max_position_embeddings=4096, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
    rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
    hidden_act="gelu_pytorch_tanh", sliding_window=8,
    query_pre_attn_scalar=32, attn_logit_softcapping=50.0,
    final_logit_softcapping=30.0, tie_word_embeddings=True,
)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("g2"))
    write_synth_dense_for_arch(d, CFG, seed=19)
    m = Model.from_config(Config.from_directory(d))
    m.load()
    return m


def _gen(model, ring):
    cache = Cache(model, CacheSpec(layout="paged", num_pages=8,
                                   swa_ring=ring, recurrent_slots=5))
    return Generator(model, cache, max_batch_size=4)


def test_ring_matches_full(model):
    prompt = np.arange(30, dtype=np.int64) % 200 + 3  # spans several windows
    full = _gen(model, ring=False).generate(prompt.copy(), max_new_tokens=20)
    ring = _gen(model, ring=True).generate(prompt.copy(), max_new_tokens=20)
    assert ring == full


def test_ring_memory_shrinks(model):
    c_full = Cache(model, CacheSpec(layout="paged", num_pages=8))
    c_ring = Cache(model, CacheSpec(layout="paged", num_pages=8,
                                    swa_ring=True, recurrent_slots=5))

    def nbytes(state):
        return sum(a.size * a.dtype.itemsize
                   for layer in state.values() for a in layer.values())

    # the sliding layer's ring (5 slots x 9) is far smaller than 8 pages x 256
    assert nbytes(c_ring.state) < 0.7 * nbytes(c_full.state)


def test_ring_slot_reuse(model):
    gen = _gen(model, ring=True)
    p = np.array([7, 11, 23, 5, 9, 13, 2, 7, 44, 91], np.int64)
    a = gen.generate(p.copy(), max_new_tokens=8)
    b = gen.generate(p.copy(), max_new_tokens=8)
    assert a == b


def test_ring_ngram_sd_matches_plain(model):
    """Speculative decoding on a ring-cache model: the ring carries slot
    headroom so rejected draft writes never evict a live window entry."""
    prompt = np.array([7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8], np.int64)
    ref = _gen(model, ring=True).generate(prompt.copy(), max_new_tokens=14)
    cache = Cache(model, CacheSpec(layout="paged", num_pages=8,
                                   swa_ring=True, recurrent_slots=5))
    gen = Generator(model, cache, max_batch_size=4, use_ngram_draft=True,
                    num_draft_tokens=3)
    out = gen.generate(prompt.copy(), max_new_tokens=14)
    assert out == ref
    assert gen.num_drafted > 0
