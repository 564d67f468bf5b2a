"""Continuous-batching generator: output correctness vs step-by-step
reference decode, stop conditions, prefix cache reuse, batching pressure."""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.fast

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
from exllamav3_tpu.model import Config, Model, InferParams, Cache, CacheSpec
from exllamav3_tpu.generator.generator import Generator
from exllamav3_tpu.generator.job import Job
from exllamav3_tpu.generator.sampler import GreedySampler, DefaultSampler


@pytest.fixture(scope="module")
def model():
    import tempfile, os

    d = os.path.join(tempfile.gettempdir(), "exl3tpu_gen_test")
    if not os.path.exists(os.path.join(d, "config.json")):
        write_tiny_llama_exl3(d, seed=11)
    config = Config.from_directory(d, infer_params=InferParams(linear_mode="bf16"))
    m = Model.from_config(config)
    m.load()
    return m


def _greedy_reference(model, prompt, n):
    """Slow reference: full cacheless re-forward per generated token."""
    ids = list(prompt)
    out = []
    for _ in range(n):
        logits = np.asarray(model.forward_simple(np.asarray([ids], np.int32)))
        tok = int(logits[0, -1].argmax())
        out.append(tok)
        ids.append(tok)
    return out


def _make_generator(model, num_pages=24, **kw):
    cache = Cache(model, CacheSpec(layout="paged", num_pages=num_pages))
    return Generator(model, cache, **kw)


def test_greedy_matches_reference(model):
    gen = _make_generator(model)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 500, size=19).tolist()
    ref = _greedy_reference(model, prompt, 8)
    got = gen.generate(np.asarray(prompt), max_new_tokens=8, sampler=GreedySampler(),
                       decode_text=False)
    assert got == ref, (got, ref)


def test_batched_jobs_match_individual(model):
    gen = _make_generator(model, num_pages=32)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 500, size=n).tolist() for n in (5, 11, 23)]
    refs = [_greedy_reference(model, p, 6) for p in prompts]
    outs = gen.generate([np.asarray(p) for p in prompts], max_new_tokens=6,
                        sampler=GreedySampler(), decode_text=False)
    assert outs == refs


def test_stop_token(model):
    gen = _make_generator(model)
    prompt = np.arange(10) % 400
    ref = _greedy_reference(model, prompt.tolist(), 12)
    stop_at = ref[3]
    job = Job(prompt, max_new_tokens=12, sampler=GreedySampler(),
              stop_conditions=[int(stop_at)])
    gen.enqueue(job)
    finished = None
    while gen.num_remaining_jobs():
        for r in gen.iterate():
            if r["stage"] == "finished":
                finished = r
    assert finished["eos_reason"] == "stop_token"
    assert finished["new_tokens"] == ref[:3]


def test_prefix_cache_reuse(model):
    gen = _make_generator(model, num_pages=40)
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 500, size=300).tolist()  # > 1 page
    r1 = gen.generate(np.asarray(prompt), max_new_tokens=4, sampler=GreedySampler(),
                      decode_text=False)
    served_before = gen.pagetable.cached_tokens_served
    r2 = gen.generate(np.asarray(prompt), max_new_tokens=4, sampler=GreedySampler(),
                      decode_text=False)
    assert r1 == r2
    assert gen.pagetable.cached_tokens_served > served_before  # page 0 reused


def test_sampling_runs(model):
    gen = _make_generator(model)
    prompt = np.arange(8) % 300
    out = gen.generate(np.asarray(prompt), max_new_tokens=10,
                       sampler=DefaultSampler(temperature=1.0), decode_text=False)
    assert len(out) == 10
    assert all(0 <= t < model.config.vocab_size for t in out)


def test_queue_pressure(model):
    """More jobs than slots/pages: all jobs must eventually finish correctly."""
    gen = _make_generator(model, num_pages=10, max_batch_size=2)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 500, size=rng.integers(3, 30)).tolist() for _ in range(6)]
    refs = [_greedy_reference(model, p, 4) for p in prompts]
    outs = gen.generate([np.asarray(p) for p in prompts], max_new_tokens=4,
                        sampler=GreedySampler(), decode_text=False)
    assert outs == refs
