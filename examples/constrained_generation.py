#!/usr/bin/env python
"""Constrained generation (feature reference: /root/reference/examples/
constrained_generation_llg.py and constrained_generation_formatron.py).

Three constraint engines through one Filter interface:
  --choice "yes,no,maybe"        built-in ChoiceFilter (engine-less)
  --json_schema schema.json      llguidance grammar (optional dependency)
  --regex "[0-9]{3}-[0-9]{4}"    llguidance regex
Formatron FormatterBuilder objects attach the same way (FormatronFilter).

    python examples/constrained_generation.py -m <model_dir> -p "Answer:" \
        --choice "yes,no"
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from exllamav3_tpu import model_init
from exllamav3_tpu.generator import Generator, Job, GreedySampler
from exllamav3_tpu.generator.filter import (
    ChoiceFilter, LLGuidanceFilter, FormatronFilter)


def main():
    p = argparse.ArgumentParser()
    model_init.add_args(p)
    p.add_argument("-p", "--prompt", required=True)
    p.add_argument("--choice", help="comma-separated allowed outputs")
    p.add_argument("--json_schema", help="path to a JSON schema file")
    p.add_argument("--regex", help="regex the output must match")
    p.add_argument("--max_new_tokens", type=int, default=128)
    args = p.parse_args()

    model, config, cache, tokenizer, gen_kwargs = model_init.init(args)
    filters = []
    if args.choice:
        filters.append(ChoiceFilter(args.choice.split(",")))
    if args.json_schema:
        with open(args.json_schema) as f:
            filters.append(LLGuidanceFilter(tokenizer,
                                            json_schema=json.load(f)))
    if args.regex:
        filters.append(LLGuidanceFilter(tokenizer, regex=args.regex))
    assert filters, "give --choice, --json_schema or --regex"

    gen = Generator(model, cache, tokenizer=tokenizer, **gen_kwargs)
    gen.enqueue(Job(np.asarray(tokenizer.encode(args.prompt)),
                    max_new_tokens=args.max_new_tokens,
                    sampler=GreedySampler(), filters=filters))
    while gen.pending or gen.active:
        for ev in gen.iterate():
            if ev["stage"] == "streaming" and "text" in ev:
                print(ev["text"], end="", flush=True)
            elif ev["stage"] == "finished":
                print(f"\n[{ev['eos_reason']}]")


if __name__ == "__main__":
    main()
