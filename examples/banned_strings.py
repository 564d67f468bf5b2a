#!/usr/bin/env python
"""Banned strings (feature reference: /root/reference/examples/
banned_strings.py): when a banned phrase appears mid-stream the generator
rewinds the offending tokens, bans the branch point and resamples — the
stream never shows the banned text.

    python examples/banned_strings.py -m <model_dir> -p "Once upon" \
        --ban "however" --ban "in conclusion"
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from exllamav3_tpu import model_init
from exllamav3_tpu.generator import Generator, Job, DefaultSampler


def main():
    p = argparse.ArgumentParser()
    model_init.add_args(p)
    p.add_argument("-p", "--prompt", required=True)
    p.add_argument("--ban", action="append", default=[])
    p.add_argument("--max_new_tokens", type=int, default=256)
    args = p.parse_args()

    model, config, cache, tokenizer, gen_kwargs = model_init.init(args)
    gen = Generator(model, cache, tokenizer=tokenizer, **gen_kwargs)
    gen.enqueue(Job(np.asarray(tokenizer.encode(args.prompt)),
                    max_new_tokens=args.max_new_tokens,
                    sampler=DefaultSampler(),
                    banned_strings=args.ban))
    while gen.pending or gen.active:
        for ev in gen.iterate():
            if ev["stage"] == "streaming" and "text" in ev:
                print(ev["text"], end="", flush=True)
    print()


if __name__ == "__main__":
    main()
