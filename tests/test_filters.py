"""Constrained decoding filters: mask application in the generator and
ChoiceFilter text-prefix logic."""
import os
import tempfile

import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3
from exllamav3_tpu.model import Config, Model, InferParams, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job, GreedySampler
from exllamav3_tpu.generator.filter import AllowedTokensFilter, ChoiceFilter


@pytest.fixture(scope="module")
def model():
    d = os.path.join(tempfile.gettempdir(), "exl3tpu_gen_test")
    if not os.path.exists(os.path.join(d, "config.json")):
        write_tiny_llama_exl3(d, seed=11)
    m = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(linear_mode="bf16")))
    m.load()
    return m


def test_allowed_tokens_filter(model):
    allowed = [7, 11, 13, 17]
    gen = Generator(model, Cache(model, CacheSpec(layout="paged", num_pages=16)))
    job = Job(np.arange(6) % 300, max_new_tokens=8, sampler=GreedySampler(),
              filters=[AllowedTokensFilter(allowed)])
    gen.enqueue(job)
    out = None
    while gen.num_remaining_jobs():
        for r in gen.iterate():
            if r["stage"] == "finished":
                out = r["new_tokens"]
    assert out is not None and len(out) == 8
    assert all(t in allowed for t in out), out


class _FakeTokenizer:
    vocab_size = 8
    _pieces = ["", "a", "b", "ab", "ba", "c", "abc", "x"]

    def decode(self, ids):
        return "".join(self._pieces[i] for i in np.asarray(ids).reshape(-1))


def test_choice_filter_logic():
    f = ChoiceFilter(["abc", "abba"])
    f.begin(_FakeTokenizer())
    m = f.allowed_mask(8)
    allowed = set(np.nonzero(m == 0)[0].tolist())
    # tokens leading toward "abc"/"abba": "a"(1), "ab"(3), "abc"(6)
    assert allowed == {1, 3, 6}, allowed
    f.feed(3)  # "ab"
    m = f.allowed_mask(8)
    allowed = set(np.nonzero(m == 0)[0].tolist())
    # after "ab": "c"(5) -> abc; "b"(2) -> abb(a); "ba"(4) -> abba
    assert allowed == {2, 4, 5}, allowed
    f.feed(5)
    assert f.is_complete()
    f.rollback(1)
    assert not f.is_complete()
    assert f.text == "ab"
