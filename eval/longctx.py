#!/usr/bin/env python
"""Long-context needle retrieval evaluation.

Feature reference: /root/reference/eval/longctx.py (needle-style evaluation
over growing context lengths). Plants a key-value "needle" at varying depths
inside filler context, asks the model to reproduce the value, and reports
accuracy per (context length, depth) cell. Works with any chat or plain
checkpoint; with no tokenizer/model text quality the harness still exercises
long-context paged attention end to end.

    python eval/longctx.py -m <model_dir> --lengths 1024,4096 --depths 0,0.5,1
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_needle_prompt(tokenizer, length: int, depth: float, needle: str,
                        question: str) -> np.ndarray:
    filler = ("The quick brown fox jumps over the lazy dog. "
              "Pack my box with five dozen liquor jugs. ")
    ids_fill = tokenizer.encode(filler).reshape(-1)
    ids_needle = tokenizer.encode(" " + needle + " ").reshape(-1)
    ids_q = tokenizer.encode("\n" + question).reshape(-1)
    body_len = max(length - len(ids_needle) - len(ids_q), 0)
    reps = body_len // max(len(ids_fill), 1) + 1
    body = np.tile(ids_fill, reps)[:body_len]
    pos = int(len(body) * depth)
    return np.concatenate([body[:pos], ids_needle, body[pos:], ids_q])


_NEEDLE_IDS = [101, 103, 107, 109]


def build_needle_ids(vocab: int, length: int, depth: float) -> np.ndarray:
    """Tokenizer-less needle prompt: repeating filler ids with a distinct
    4-id needle planted at `depth` and echoed as the trailing question."""
    filler = (np.arange(32, dtype=np.int64) % 24) + 5
    reps = length // len(filler) + 1
    body = np.tile(filler, reps)[: max(length - 8, 8)]
    pos = int(len(body) * depth)
    needle = np.asarray(_NEEDLE_IDS, dtype=np.int64)
    return np.concatenate([body[:pos], needle, body[pos:], needle[:2]])


def main():
    p = argparse.ArgumentParser()
    from exllamav3_tpu import model_init

    model_init.add_args(p)
    p.add_argument("--lengths", default="1024,2048,4096")
    p.add_argument("--depths", default="0.0,0.25,0.5,0.75,1.0")
    p.add_argument("--max_new", type=int, default=24)
    args = p.parse_args()

    from exllamav3_tpu.generator import Generator, Job
    from exllamav3_tpu.generator.sampler import GreedySampler

    model, config, cache, tokenizer, gen_kwargs = model_init.init(args)
    gen = Generator(model, cache, tokenizer, **gen_kwargs)

    needle_value = "7492"
    needle = f"The secret magic number is {needle_value}."
    question = "What is the secret magic number? The secret magic number is"

    lengths = [int(x) for x in args.lengths.split(",")]
    depths = [float(x) for x in args.depths.split(",")]
    print(f"{'length':>8} {'depth':>6} {'hit':>4}  completion")
    total = hits = 0
    for L in lengths:
        for d in depths:
            if tokenizer is not None:
                ids = build_needle_prompt(tokenizer, L, d, needle, question)
            else:
                # id-level needle for tokenizer-less (synthetic) checkpoints:
                # accuracy is meaningless on a random model, but the run
                # still drives long-context paged attention (and --sp
                # page-sharded serving) end to end
                ids = build_needle_ids(config.vocab_size, L, d)
            job = Job(ids, max_new_tokens=args.max_new,
                      sampler=GreedySampler())
            gen.enqueue(job)
            while gen.num_remaining_jobs():
                gen.iterate()
            if tokenizer is not None:
                text = job.emitted_text + job.held_text
                hit = needle_value in text
            else:
                text = str(job.new_tokens[: args.max_new])
                hit = _NEEDLE_IDS[0] in job.new_tokens
            hits += hit
            total += 1
            print(f"{L:>8} {d:>6.2f} {'Y' if hit else 'n':>4}  {text[:60]!r}")
    print(f"\nneedle accuracy: {hits}/{total} = {hits / max(total, 1):.2%}")


if __name__ == "__main__":
    main()
