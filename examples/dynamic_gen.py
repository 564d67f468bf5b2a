#!/usr/bin/env python
"""Continuous dynamic batching demo (feature reference:
/root/reference/examples/dynamic_gen.py): floods the generator with jobs of
mixed prompt lengths, streams completions as they interleave, and prints
the per-job serving metrics (TTFT, prefill/generate throughput, prefix
cache hits) the finished events carry.

    python examples/dynamic_gen.py -m <model_dir> -n 16
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from exllamav3_tpu import model_init
from exllamav3_tpu.generator import Generator, Job, DefaultSampler

PROMPTS = [
    "Write a haiku about", "Explain in one sentence why", "List three uses of",
    "Summarize the history of", "What rhymes with", "Describe the taste of",
]


def main():
    p = argparse.ArgumentParser()
    model_init.add_args(p)
    p.add_argument("-n", "--num_jobs", type=int, default=16)
    p.add_argument("--max_new_tokens", type=int, default=96)
    args = p.parse_args()

    model, config, cache, tokenizer, gen_kwargs = model_init.init(args)
    gen = Generator(model, cache, tokenizer=tokenizer, **gen_kwargs)
    topics = ["the sea", "compilers", "tea", "gravity", "autumn", "chess"]
    for i in range(args.num_jobs):
        text = f"{PROMPTS[i % len(PROMPTS)]} {topics[i % len(topics)]}."
        gen.enqueue(Job(np.asarray(tokenizer.encode(text)),
                        max_new_tokens=args.max_new_tokens,
                        sampler=DefaultSampler(), identifier=i))
    done = 0
    while gen.pending or gen.active:
        for ev in gen.iterate():
            if ev["stage"] == "finished":
                done += 1
                print(f"[job {ev['identifier']:3d}] ttft {ev['ttft_s']*1e3:6.0f} ms  "
                      f"gen {ev['generate_tok_s']:6.1f} tok/s  "
                      f"cached {ev['cached_tokens']:4d}  ({done}/{args.num_jobs})")
    print(f"drafted {gen.num_drafted}, accepted {gen.num_accepted}")


if __name__ == "__main__":
    main()
