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


def test_trigger_and_journal_rewind():
    """Reference filter.py journal semantics: trigger activation, PASS
    tokens, rewind past completion and past the trigger (rebuild)."""
    f = ChoiceFilter(["ab"], trigger_token=5, eos_after_completed=False)
    f.begin(_FakeTokenizer())
    assert not f.is_active
    assert f.feed(1) is False          # PASS (inactive)
    assert f.allowed_mask(8) is None   # inactive -> unconstrained
    f.feed(5)                          # TRIGGER
    assert f.is_active
    m = f.allowed_mask(8)
    assert m[3] == 0.0                 # "ab" allowed
    assert m[7] < -1e29                # "x" banned
    f.feed(3)                          # "ab" -> COMPLETE, deactivates
    assert not f.is_active
    # rewind the completing token: active again, state = post-trigger
    f.rollback(1)
    assert f.is_active and f.text == ""
    # rewind past the trigger: full rebuild to inactive
    f.rollback(1)
    assert not f.is_active
    # replay the same sequence after rebuild
    f.feed(5)
    f.feed(1)                          # "a" accepted
    assert f.text == "a"


def test_journal_replay_without_native_rollback():
    """Engines without rollback_tokens get rewind by journal replay."""

    class Appender(ChoiceFilter):
        def rollback_tokens(self, n):
            return False  # force replay path

    f = Appender(["abc", "abba"], eos_after_completed=False)
    f.begin(_FakeTokenizer())
    f.feed(1)
    f.feed(2)
    assert f.text == "ab"
    f.rollback(1)
    assert f.text == "a"
    f.feed(2)
    f.feed(4)
    assert f.text == "abba"


def test_formatron_adapter_with_stub():
    """FormatronFilter plumbing with a stub formatter engine."""
    from exllamav3_tpu.generator.filter import FormatronFilter

    class StubFormatter:
        def __init__(self):
            self.toks = []
            self._allowed = [1, 3]

        def reset(self):
            self.toks = []

        def accept_token(self, t):
            self.toks.append(t)

        def is_completed(self):
            return len(self.toks) >= 2

        def compute_allowed_tokens(self):
            pass

        def get_allowed_tokens_since_last_computation(self):
            return self._allowed

    f = FormatronFilter(_formatter=StubFormatter())
    f.begin(None)
    m = f.allowed_mask(8)
    assert m[1] == 0.0 and m[3] == 0.0 and m[0] < -1e29
    assert f.feed(1) is False
    assert f.feed(3) is True      # completed + eos_after_completed default
    assert f.is_complete()
    f.rollback(1)                 # journal replay through reset/accept
    assert not f.is_complete()
    assert f._f.toks == [1]


def test_mask_prefetch_roundtrip():
    f = ChoiceFilter(["abc"], eos_after_completed=False)
    f.begin(_FakeTokenizer())
    f.prefetch_mask(8)            # worker-thread mask
    m = f.allowed_mask(8)
    assert m is not None and m[1] == 0.0
    f.prefetch_mask(8)
    f.feed(1)                     # invalidates the pending mask
    m2 = f.allowed_mask(8)        # recomputed from post-feed state
    assert m2[2] == 0.0           # "a"+"b" prefixes "abc"
    assert m2[1] < -1e29          # "a"+"a" does not


def test_ngram_sd_with_filter_matches_plain(model):
    """SD verify must apply filter masks per position: output identical to
    the non-SD filtered run (VERDICT: SD rewind with an active filter)."""
    allowed = [7, 11, 13, 17]
    base = [7, 11, 13, 7, 11, 13]
    prompt = np.asarray(base * 3, dtype=np.int64)

    def run(**kw):
        gen = Generator(model, Cache(model, CacheSpec(layout="paged",
                                                      num_pages=16)), **kw)
        job = Job(prompt, max_new_tokens=10, sampler=GreedySampler(),
                  filters=[AllowedTokensFilter(allowed)])
        gen.enqueue(job)
        out = None
        while gen.num_remaining_jobs():
            for r in gen.iterate():
                if r["stage"] == "finished":
                    out = r["new_tokens"]
        return out, gen

    plain, _ = run()
    sd, gen_sd = run(use_ngram_draft=True, num_draft_tokens=4)
    assert sd == plain
    assert all(t in allowed for t in sd)
