"""Per-job serving metrics on finished results (reference
generator.py:386-395 parity): timings, token counts, draft accounting."""
import os
import tempfile

import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3
from exllamav3_tpu.model import Config, Model, InferParams, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job, GreedySampler


@pytest.fixture(scope="module")
def model():
    d = os.path.join(tempfile.gettempdir(), "exl3tpu_gen_test")
    if not os.path.exists(os.path.join(d, "config.json")):
        write_tiny_llama_exl3(d, seed=11)
    m = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(linear_mode="bf16")))
    m.load()
    return m


def _run(gen, jobs):
    for j in jobs:
        gen.enqueue(j)
    finished = {}
    while gen.pending or gen.active:
        for ev in gen.iterate():
            if ev["stage"] == "finished":
                finished[ev["identifier"]] = ev
    return finished


def test_finished_event_metrics(model):
    cache = Cache(model, CacheSpec(layout="paged", num_pages=24))
    gen = Generator(model, cache)
    prompt = np.arange(20, dtype=np.int64) % 200 + 3
    out = _run(gen, [Job(prompt, max_new_tokens=8, sampler=GreedySampler(),
                         identifier="m1")])
    ev = out["m1"]
    assert ev["generated_tokens"] == 8
    assert ev["prompt_tokens"] == 20
    assert len(ev["new_tokens"]) == 8
    assert ev["ttft_s"] > 0
    assert ev["prefill_s"] >= 0
    assert ev["generate_s"] >= 0
    assert ev["generate_tok_s"] > 0
    assert ev["accepted_draft_tokens"] == 0


def test_sd_metrics_count_drafts(model):
    cache = Cache(model, CacheSpec(layout="paged", num_pages=24))
    gen = Generator(model, cache, use_ngram_draft=True, num_draft_tokens=4)
    base = (np.arange(6) * 7 % 250 + 3).tolist()
    prompt = np.asarray(base * 4 + base[:2])
    out = _run(gen, [Job(prompt, max_new_tokens=12, sampler=GreedySampler(),
                         identifier="sd")])
    ev = out["sd"]
    total = ev["accepted_draft_tokens"] + ev["rejected_draft_tokens"]
    assert total == gen.num_drafted
    assert ev["accepted_draft_tokens"] == gen.num_accepted
