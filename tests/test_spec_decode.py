"""Speculative decoding: must be output-identical to plain greedy decode,
with nonzero acceptance when drafts are good."""
import os
import tempfile

import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3
from exllamav3_tpu.model import Config, Model, InferParams, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job, GreedySampler
from exllamav3_tpu.generator.ngram import SuffixAutomaton


@pytest.fixture(scope="module")
def model():
    d = os.path.join(tempfile.gettempdir(), "exl3tpu_gen_test")
    if not os.path.exists(os.path.join(d, "config.json")):
        write_tiny_llama_exl3(d, seed=11)
    m = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(linear_mode="bf16")))
    m.load()
    return m


def test_suffix_automaton_drafts():
    sam = SuffixAutomaton()
    seq = [1, 2, 3, 4, 9, 1, 2, 3]
    for t in seq:
        sam.extend(t)
    d = sam.draft(3)
    assert d[:1] == [4], d  # suffix [1,2,3] occurred before, followed by 4


def _gen(model, **kw):
    cache = Cache(model, CacheSpec(layout="paged", num_pages=24))
    return Generator(model, cache, **kw)


def test_ngram_sd_matches_plain_greedy(model):
    rng = np.random.default_rng(4)
    base = rng.integers(0, 400, size=6).tolist()
    prompt = base * 3 + base[:2]  # repetitive → n-gram drafts will hit

    plain = _gen(model).generate(np.asarray(prompt), max_new_tokens=12,
                                 sampler=GreedySampler(), decode_text=False)
    gen_sd = _gen(model, use_ngram_draft=True, num_draft_tokens=4)
    sd = gen_sd.generate(np.asarray(prompt), max_new_tokens=12,
                         sampler=GreedySampler(), decode_text=False)
    assert sd == plain, (sd, plain)
    assert gen_sd.num_drafted > 0


def test_draft_model_sd_matches_and_accepts(model):
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 400, size=9).tolist()
    plain = _gen(model).generate(np.asarray(prompt), max_new_tokens=10,
                                 sampler=GreedySampler(), decode_text=False)
    # the model drafts for itself → near-total acceptance
    gen_sd = _gen(model, draft_model=model, num_draft_tokens=3)
    sd = gen_sd.generate(np.asarray(prompt), max_new_tokens=10,
                         sampler=GreedySampler(), decode_text=False)
    assert sd == plain, (sd, plain)
    assert gen_sd.num_accepted / max(gen_sd.num_drafted, 1) > 0.8


def test_sd_with_batch(model):
    rng = np.random.default_rng(6)
    base = rng.integers(0, 400, size=5).tolist()
    prompts = [base * 4, rng.integers(0, 400, size=7).tolist()]
    plain = _gen(model).generate([np.asarray(p) for p in prompts],
                                 max_new_tokens=8, sampler=GreedySampler(),
                                 decode_text=False)
    sd = _gen(model, use_ngram_draft=True).generate(
        [np.asarray(p) for p in prompts], max_new_tokens=8,
        sampler=GreedySampler(), decode_text=False)
    assert sd == plain
