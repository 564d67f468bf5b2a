"""Multi-step decode burst (Generator.decode_burst): N plain decode steps
scan device-side per dispatch; outputs must be identical to single-step
decode — including stop tokens, stop strings and max_new truncation firing
mid-burst — and penalty counts must be reversed for discarded tokens."""
import numpy as np
import pytest
import jax.numpy as jnp

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
from exllamav3_tpu.model import Config, Model, InferParams, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job, GreedySampler


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("burst"))
    cfg = tiny_llama_cfg(vocab_size=512, hidden_size=128,
                         intermediate_size=256, num_layers=2, num_q_heads=4,
                         num_kv_heads=2, head_dim=64)
    write_tiny_llama_exl3(d, cfg, K=4, seed=29)
    m = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(linear_mode="bf16")))
    m.load()
    return m


def _run(model, burst, prompts, max_new=21, stop_tokens=None, seed=0):
    cache = Cache(model, CacheSpec(layout="paged", num_pages=24))
    gen = Generator(model, cache, max_batch_size=4, seed=seed,
                    decode_burst=burst)
    jobs = [Job(np.asarray(p), max_new_tokens=max_new,
                sampler=GreedySampler(),
                stop_conditions=list(stop_tokens or []))
            for p in prompts]
    for j in jobs:
        gen.enqueue(j)
    while gen.num_remaining_jobs():
        gen.iterate()
    return [list(j.new_tokens) for j in jobs], gen


def test_burst_matches_single(model):
    prompts = [(np.arange(30) % 300 + 5).tolist(),
               (np.arange(45) % 200 + 9).tolist()]
    single, _ = _run(model, 1, prompts)
    burst, _ = _run(model, 8, prompts)
    assert burst == single
    assert all(len(t) == 21 for t in burst)  # 21 % 8 != 0: partial burst


def test_burst_stop_token_truncates_and_reverses_counts(model):
    prompts = [(np.arange(24) % 300 + 5).tolist()]
    ref, _ = _run(model, 1, prompts, max_new=40)
    # pick a token the greedy stream emits mid-way as the stop token
    stop = ref[0][5]
    want = ref[0][: ref[0].index(stop)]
    single, gen1 = _run(model, 1, prompts, max_new=40, stop_tokens=[stop])
    burst, gen8 = _run(model, 8, prompts, max_new=40, stop_tokens=[stop])
    assert single == burst == [want]
    # every discarded token's penalty count was reversed: the persistent
    # count rows must match the single-step run exactly (prompt counts +
    # consumed tokens + the stop token)
    np.testing.assert_array_equal(np.asarray(gen8.token_counts),
                                  np.asarray(gen1.token_counts))
    assert np.asarray(gen8.token_counts)[:gen8.max_batch_size].sum() == \
        len(prompts[0]) + len(want) + 1


def test_burst_gates_off_for_constrained_jobs(model):
    prompts = [(np.arange(16) % 300 + 5).tolist()]
    cache = Cache(model, CacheSpec(layout="paged", num_pages=24))
    gen = Generator(model, cache, max_batch_size=2, decode_burst=8)
    job = Job(np.asarray(prompts[0]), max_new_tokens=6,
              sampler=GreedySampler(), banned_strings=["zzz"])
    gen.enqueue(job)
    gen.iterate()  # prefill
    assert gen._burst_n([job]) == 1  # banned strings -> host per step


def test_burst_cfg_pairs_match_single(model):
    p = (np.arange(20) % 300 + 5).tolist()
    n = (np.arange(12) % 100 + 7).tolist()

    def run(burst):
        cache = Cache(model, CacheSpec(layout="paged", num_pages=24))
        gen = Generator(model, cache, max_batch_size=4, decode_burst=burst)
        job = Job(np.asarray(p), max_new_tokens=10, sampler=GreedySampler(),
                  negative_input_ids=np.asarray(n), cfg_scale=1.5)
        gen.enqueue(job)
        while gen.num_remaining_jobs():
            gen.iterate()
        return list(job.new_tokens)

    assert run(8) == run(1)


def test_burst_degrades_under_page_pressure(model):
    """When the speculative burst-window pages can't be allocated (another
    job pins the free page), decode falls back to single-step instead of
    finishing jobs early, and outputs match the single-step run exactly."""
    pa = (np.arange(504) % 300 + 5).tolist()   # 2 pages, window needs a 3rd
    pb = (np.arange(200) % 300 + 5).tolist()   # pins the 3rd page

    def run(burst):
        cache = Cache(model, CacheSpec(layout="paged", num_pages=3))
        gen = Generator(model, cache, max_batch_size=2, decode_burst=burst)
        ja = Job(np.asarray(pa), max_new_tokens=30, sampler=GreedySampler())
        jb = Job(np.asarray(pb), max_new_tokens=30, sampler=GreedySampler())
        gen.enqueue(ja)
        gen.enqueue(jb)
        while gen.num_remaining_jobs():
            gen.iterate()
        return (list(ja.new_tokens), ja.eos_reason,
                list(jb.new_tokens), jb.eos_reason)

    single = run(1)
    burst = run(8)
    assert burst == single


def test_mixed_load_splits_plain_and_constrained(model):
    """Round-4 mixed-load bursting: plain jobs burst while a host-coupled
    job (return_logits) steps singly; outputs must equal the all-single-step
    run."""
    p1 = (np.arange(30) % 300 + 5).tolist()
    p2 = (np.arange(45) % 200 + 9).tolist()
    p3 = (np.arange(16) % 300 + 5).tolist()

    def run(burst):
        cache = Cache(model, CacheSpec(layout="paged", num_pages=24))
        gen = Generator(model, cache, max_batch_size=4, decode_burst=burst)
        jobs = [Job(np.asarray(p1), max_new_tokens=15, sampler=GreedySampler()),
                Job(np.asarray(p2), max_new_tokens=15, sampler=GreedySampler()),
                Job(np.asarray(p3), max_new_tokens=15, sampler=GreedySampler(),
                    return_logits=True)]
        for j in jobs:
            gen.enqueue(j)
        while gen.num_remaining_jobs():
            gen.iterate()
        return [list(j.new_tokens) for j in jobs]

    single = run(1)
    mixed = run(8)
    assert mixed == single


def test_burst_caps_while_prefill_pending(model):
    """While prefill work exists the burst caps at prefill_burst instead of
    dropping to 1 — and outputs still match single-step decode."""
    pa = (np.arange(30) % 300 + 5).tolist()
    pb = (np.arange(400) % 200 + 9).tolist()

    def run(burst):
        cache = Cache(model, CacheSpec(layout="paged", num_pages=24))
        gen = Generator(model, cache, max_batch_size=2, decode_burst=burst,
                        max_chunk_size=128)  # pb prefills over many chunks
        ja = Job(np.asarray(pa), max_new_tokens=18, sampler=GreedySampler())
        gen.enqueue(ja)
        # prefill ja fully, then start decoding with jb's prefill in flight
        while ja.status != "running":
            gen.iterate()
        jb = Job(np.asarray(pb), max_new_tokens=6, sampler=GreedySampler())
        gen.enqueue(jb)
        seen_cap = []
        while gen.num_remaining_jobs():
            running = [j for j in gen.active if j.status == "running"]
            if running and any(j.status == "prefill" for j in gen.active):
                seen_cap.append(gen._burst_n(running))
            gen.iterate()
        return list(ja.new_tokens), list(jb.new_tokens), seen_cap

    a1, b1, _ = run(1)
    a8, b8, caps = run(8)
    assert (a8, b8) == (a1, b1)
    # bursting continued under mixed load, capped at prefill_burst
    assert caps and max(caps) > 1 and max(caps) <= 4
