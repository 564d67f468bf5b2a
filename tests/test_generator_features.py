"""Generator feature depth: token healing, banned strings, loop detection,
CPU page-cache tier, defragmentation, top-logprobs."""
import json

import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec, InferParams
from exllamav3_tpu.generator import Generator, Job
from exllamav3_tpu.generator.loop_detect import LoopDetector
from exllamav3_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("m"))
    cfg = tiny_llama_cfg(vocab_size=512, hidden_size=128, intermediate_size=256,
                         num_layers=2, num_q_heads=4, num_kv_heads=4)
    write_tiny_llama_exl3(d, cfg, K=4, seed=42)
    # byte-level tokenizer so text-side features are exercised for real
    from tokenizers import Tokenizer as HFT, models, pre_tokenizers, decoders

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    vocab = {tok: i for i, tok in enumerate(alphabet)}
    hft = HFT(models.BPE(vocab=vocab, merges=[]))
    hft.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    hft.decoder = decoders.ByteLevel()
    hft.save(f"{d}/tokenizer.json")
    with open(f"{d}/tokenizer_config.json", "w") as f:
        json.dump({}, f)
    return d


@pytest.fixture(scope="module")
def model(model_dir):
    m = Model.from_config(Config.from_directory(
        model_dir, infer_params=InferParams(linear_mode="bf16")))
    m.load()
    return m


@pytest.fixture()
def tok(model_dir):
    return Tokenizer(model_dir)


def _gen(model, tok=None, pages=16, **kw):
    cache = Cache(model, CacheSpec(layout="paged", num_pages=pages))
    return Generator(model, cache, tokenizer=tok, max_batch_size=4, **kw)


def _run(gen, jobs):
    gen.enqueue(jobs)
    results = []
    while gen.num_remaining_jobs():
        results += gen.iterate()
    return results


def test_token_healing(model, tok):
    gen = _gen(model, tok)
    prompt = tok.encode("hello worl").reshape(-1)
    prefix = tok.decode([int(prompt[-1])])
    job = Job(prompt, max_new_tokens=4, token_healing=True)
    _run(gen, [job])
    assert job.healing_prefix == prefix
    # healed first token must extend the amputated piece's text
    first_piece = tok.decode([job.new_tokens[0]])
    assert first_piece.startswith(prefix), (first_piece, prefix)


def test_banned_strings(model, tok):
    gen = _gen(model, tok)
    probe = Job(tok.encode("abc").reshape(-1), max_new_tokens=8)
    _run(gen, [probe])
    text = probe.emitted_text + probe.held_text
    assert text
    banned = text[:2]  # ban how the unconstrained generation starts

    gen2 = _gen(model, tok)
    job = Job(tok.encode("abc").reshape(-1), max_new_tokens=8,
              banned_strings=[banned])
    _run(gen2, [job])
    out = job.emitted_text + job.held_text
    assert banned not in out, (banned, out)
    assert job.pos_bans  # a rewind happened


def test_loop_detector_unit():
    ld = LoopDetector(max_period=4, min_repeats=3, min_loop_tokens=6)
    for t in [1, 2, 3, 4, 5, 6, 7, 8]:
        assert not ld.feed(t)
    fired = False
    for _ in range(6):
        fired = ld.feed(9) or fired
        fired = ld.feed(10) or fired
    assert fired


def test_top_logprobs(model):
    gen = _gen(model)
    job = Job(np.array([5, 9, 13], np.int64), max_new_tokens=3,
              return_top_logprobs=5)
    results = _run(gen, [job])
    evs = [r for r in results if r["stage"] == "streaming"
           and "top_logprobs" in r]
    assert evs
    lp = evs[0]["top_logprobs"]
    assert len(lp) == 5
    vals = list(lp.values())
    assert vals == sorted(vals, reverse=True)
    assert all(v <= 0.0 for v in vals)


def test_cpu_cache_tier(model):
    # small device cache so pages get evicted, generous CPU tier
    gen = _gen(model, pages=6, cpu_cache_bytes=64 << 20)
    long_prompt = np.arange(300, dtype=np.int64) % 250  # > 1 full page

    j1 = Job(long_prompt.copy(), max_new_tokens=4)
    _run(gen, [j1])
    # churn the cache so j1's pages are evicted to the CPU tier
    for i in range(4):
        churn = (np.arange(300, dtype=np.int64) * (i + 3)) % 250
        _run(gen, [Job(churn, max_new_tokens=4)])
    assert gen.cpu_cache.store, "evicted pages should land in the CPU tier"

    j2 = Job(long_prompt.copy(), max_new_tokens=4)
    _run(gen, [j2])
    assert gen.cpu_cache.hits > 0
    assert j2.cached_tokens > 0  # restored page counted as reused
    assert j2.new_tokens == j1.new_tokens  # identical greedy continuation


def test_defrag_preserves_content(model):
    gen = _gen(model, pages=12)
    prompts = [np.arange(280, dtype=np.int64) % 200 + i for i in range(3)]
    base = [Job(p.copy(), max_new_tokens=4) for p in prompts]
    for j in base:
        _run(gen, [j])
    changed = gen.defrag()
    # rerun the first prompt: prefix pages (possibly relocated) must still
    # serve the same content
    j2 = Job(prompts[0].copy(), max_new_tokens=4)
    _run(gen, [j2])
    assert j2.new_tokens == base[0].new_tokens
    assert j2.cached_tokens > 0 or not changed


def test_encode_special_tokens(model_dir, tok):
    """Literal special-token strings in the prompt encode to their single
    ids when encode_special_tokens=True (reference tokenizer.py)."""
    from tokenizers import Tokenizer as HFT, models, pre_tokenizers, decoders
    from tokenizers import AddedToken
    import json as _json

    d = model_dir
    hft = HFT.from_file(f"{d}/tokenizer.json")
    n = hft.get_vocab_size()
    hft.add_special_tokens([AddedToken("<|sys|>", special=True)])
    hft.save(f"{d}/tokenizer.json")
    with open(f"{d}/tokenizer_config.json", "w") as f:
        _json.dump({"bos_token": "<|sys|>"}, f)
    t2 = Tokenizer(d)
    ids = t2.encode("ab<|sys|>cd", encode_special_tokens=True)[0].tolist()
    assert ids.count(n) == 1  # the special id appears exactly once
    assert ids[0] != n and ids[-1] != n  # surrounding text encoded
    with_bos = t2.encode("x", add_bos=True)[0].tolist()
    assert with_bos[0] == n
