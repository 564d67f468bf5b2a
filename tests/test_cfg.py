"""Classifier-free guidance: paired positive/negative sequences with mixed
logits l = l_neg + s * (l_pos - l_neg)."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec, InferParams
from exllamav3_tpu.generator import Generator, Job


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cfg"))
    write_tiny_llama_exl3(
        d, tiny_llama_cfg(vocab_size=512, hidden_size=128, intermediate_size=256,
                          num_layers=2, num_q_heads=4, num_kv_heads=4),
        K=4, seed=7)
    m = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(linear_mode="bf16")))
    m.load()
    return m


def _run(model, **job_kw):
    gen = Generator(model, Cache(model, CacheSpec(layout="paged", num_pages=10)))
    job = Job(np.array([5, 9, 13, 2, 7], np.int64), max_new_tokens=8, **job_kw)
    gen.enqueue(job)
    while gen.num_remaining_jobs():
        gen.iterate()
    return job.new_tokens


def test_cfg_scale_one_is_identity(model):
    plain = _run(model)
    cfg1 = _run(model, negative_input_ids=np.array([3, 1, 4], np.int64),
                cfg_scale=1.0)
    assert cfg1 == plain  # s=1 collapses the mix to the positive logits


def test_cfg_scale_changes_output(model):
    plain = _run(model)
    cfg3 = _run(model, negative_input_ids=np.array([3, 1, 4], np.int64),
                cfg_scale=3.0)
    assert cfg3 != plain
    assert len(cfg3) == 8


def test_cfg_batched_with_plain_jobs(model):
    gen = Generator(model, Cache(model, CacheSpec(layout="paged", num_pages=16)))
    j1 = Job(np.array([5, 9, 13, 2, 7], np.int64), max_new_tokens=6)
    j2 = Job(np.array([5, 9, 13, 2, 7], np.int64), max_new_tokens=6,
             negative_input_ids=np.array([3, 1], np.int64), cfg_scale=2.0)
    gen.enqueue([j1, j2])
    while gen.num_remaining_jobs():
        gen.iterate()
    ref = _run(model)[:6]
    assert j1.new_tokens == ref  # plain job unaffected by cfg neighbor
    assert len(j2.new_tokens) == 6
