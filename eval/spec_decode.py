#!/usr/bin/env python
"""Speculative-decoding benchmark: acceptance rate and speedup per prompt
class (feature reference: /root/reference/eval/spec_decode.py — tabulates
accepted/rejected draft tokens and tok/s across prompt suites).

    python eval/spec_decode.py -m <model> [-dm <draft model>] [--ngram]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PROMPTS = {
    # repetitive structure drafts well; random tails don't
    "trivial_repetition": lambda rng, tok: np.tile(
        rng.integers(5, 50, size=8), 16).astype(np.int64),
    "structured": lambda rng, tok: np.concatenate(
        [np.arange(40) % 25 + 5, np.arange(40) % 25 + 5]).astype(np.int64),
    "random": lambda rng, tok: rng.integers(
        5, 400, size=96).astype(np.int64),
}


def run_suite(model, cache_factory, tokenizer, gen_kwargs, sd: bool,
              max_new: int = 64):
    from exllamav3_tpu.generator import Generator, Job
    from exllamav3_tpu.generator.sampler import GreedySampler

    kw = dict(gen_kwargs)
    if not sd:
        kw.pop("draft_model", None)
        kw.pop("use_ngram_draft", None)
    gen = Generator(model, cache_factory(), tokenizer, **kw)
    rows = []
    rng = np.random.default_rng(0)
    for name, mk in PROMPTS.items():
        prompt = mk(rng, tokenizer)
        job = Job(prompt, max_new_tokens=max_new, sampler=GreedySampler())
        gen.enqueue(job)
        t0 = time.time()
        while gen.num_remaining_jobs():
            gen.iterate()
        dt = time.time() - t0
        rows.append((name, len(job.new_tokens) / dt,
                     gen.num_accepted, gen.num_drafted))
        gen.num_accepted = gen.num_drafted = 0
    return rows


def main():
    p = argparse.ArgumentParser()
    from exllamav3_tpu import model_init

    model_init.add_args(p)
    p.add_argument("--max_new", type=int, default=64)
    args = p.parse_args()

    from exllamav3_tpu.model import Cache, CacheSpec

    model, config, cache, tokenizer, gen_kwargs = model_init.init(args)
    spec = cache.spec

    def cache_factory():
        from exllamav3_tpu.model import Cache as C

        return C(model, spec)

    base = run_suite(model, cache_factory, tokenizer, gen_kwargs, sd=False,
                     max_new=args.max_new)
    sd = run_suite(model, cache_factory, tokenizer, gen_kwargs, sd=True,
                   max_new=args.max_new)

    print(f"{'suite':<22} {'base tok/s':>11} {'sd tok/s':>9} "
          f"{'speedup':>8} {'accept':>7}")
    for (name, b, _, _), (_, s, acc, drafted) in zip(base, sd):
        rate = acc / drafted if drafted else 0.0
        print(f"{name:<22} {b:>11.1f} {s:>9.1f} {s / b:>7.2f}x {rate:>6.1%}")


if __name__ == "__main__":
    main()
