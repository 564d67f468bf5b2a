"""Adaptive-P sampler (reference sampler/custom.py SS_AdaptiveP +
sampling_extra.cu): sampled-token probability tracks the target via a
decayed running average, per row, through the batched decode path."""
import os
import tempfile

import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3
from exllamav3_tpu.model import Config, Model, InferParams, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job, AdaptivePSampler
from exllamav3_tpu.generator.sampler import SS_AdaptiveP


def test_adapted_target_math():
    s = SS_AdaptiveP(target=0.4, decay=0.5)
    # initial running average == target -> adapted == target
    assert abs(s.adapted_target() - 0.4) < 1e-6
    # sampling too-likely tokens pushes the target down, and vice versa
    s.update(0.9)
    assert s.adapted_target() < 0.4
    s2 = SS_AdaptiveP(target=0.4, decay=0.5)
    s2.update(0.05)
    assert s2.adapted_target() > 0.4


def test_adaptive_tracks_target_e2e():
    d = os.path.join(tempfile.gettempdir(), "exl3tpu_gen_test")
    if not os.path.exists(os.path.join(d, "config.json")):
        write_tiny_llama_exl3(d, seed=11)
    m = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(linear_mode="bf16")))
    m.load()
    gen = Generator(m, Cache(m, CacheSpec(layout="paged", num_pages=16)))
    sampler = AdaptivePSampler(target=0.3, decay=0.8)
    job = Job(np.arange(12, dtype=np.int64) % 300 + 3, max_new_tokens=24,
              sampler=sampler, seed=3)
    gen.enqueue(job)
    while gen.pending or gen.active:
        gen.iterate()
    assert len(job.new_tokens) == 24
    step = next(st for st in sampler.steps if isinstance(st, SS_AdaptiveP))
    # the feedback loop ran: the running average moved off its initial
    # value (total_weight starts AT its fixed point 1/(1-decay) by design)
    assert abs(step.weighted_sum - 0.3 / (1.0 - 0.8)) > 1e-6
    avg = step.weighted_sum / step.total_weight
    assert 0.0 < avg < 1.0
