#!/usr/bin/env python
"""Minimal generation example (reference: examples/ inference scripts).

    python examples/generate.py -m <model_dir> -p "Once upon a time" [-n 128]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav3_tpu import model_init
from exllamav3_tpu.generator import Generator
from exllamav3_tpu import model_init as _mi


def main():
    p = argparse.ArgumentParser()
    model_init.add_args(p)
    p.add_argument("-p", "--prompt", default="Once upon a time")
    p.add_argument("-n", "--max_new_tokens", type=int, default=128)
    args = p.parse_args()

    model, config, cache, tokenizer, gen_kwargs = model_init.init(args)
    generator = Generator(model, cache, tokenizer, **gen_kwargs)
    sampler = _mi.get_arg_sampler(args)
    ids = tokenizer.encode(args.prompt, add_bos=True)
    text = generator.generate(ids, max_new_tokens=args.max_new_tokens,
                              sampler=sampler)
    print(args.prompt + text)


if __name__ == "__main__":
    main()
