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


def test_llguidance_adapter_with_stub_engine():
    """The llguidance adapter's mask/feed/rollback plumbing, driven by a
    stub matcher (the real engine is an optional dependency)."""
    from exllamav3_tpu.generator.filter import LLGuidanceFilter, NEG_INF
    import numpy as np

    class StubMatcher:
        def __init__(self):
            self.tokens = []
            self.allowed = {3, 5, 40}

        def unsafe_compute_mask_ptr(self, ptr, nbytes):
            import ctypes

            n = nbytes // 4
            arr = (ctypes.c_int32 * n).from_address(ptr)
            words = [0] * n
            for t in self.allowed:
                words[t // 32] |= 1 << (t % 32)
            for i, w in enumerate(words):
                arr[i] = w - (1 << 32) if w >= (1 << 31) else w

        def is_stopped(self):
            return len(self.tokens) >= 3

        def consume_token(self, t):
            self.tokens.append(t)
            return True

        def rollback(self, n):
            del self.tokens[len(self.tokens) - n:]

    f = LLGuidanceFilter(regex="a+", _engine=StubMatcher())
    m = f.allowed_mask(64)
    assert m.shape == (64,)
    assert (m[[3, 5, 40]] == 0).all()
    assert (m[[0, 1, 63]] == NEG_INF).all()
    f.feed(3)
    f.feed(5)
    assert not f.is_complete()
    f.feed(5)
    assert f.is_complete()
    f.rollback(2)
    assert not f.is_complete()
    # exactly-one-source enforcement
    import pytest

    with pytest.raises(AssertionError):
        LLGuidanceFilter(regex="a", json_schema={}, _engine=StubMatcher())
