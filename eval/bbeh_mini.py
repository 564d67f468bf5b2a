#!/usr/bin/env python
"""BBEH-mini harness (feature reference: /root/reference/eval/bbeh_mini.py
— BIG-Bench Extra Hard mini split: free-form reasoning scored by normalized
exact match on the final answer).

Dataset rows {"input": ..., "target": ..., "task": optional} from a local
JSONL, or --synthetic N. Responses are scored on the text after the last
"answer is"/final line, lowercased and stripped of punctuation (the
reference's extraction behavior).

    python eval/bbeh_mini.py -m <model_dir> --dataset bbeh_mini.jsonl
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def normalize(s: str) -> str:
    s = s.strip().lower()
    s = re.sub(r"[\s]+", " ", s)
    return s.strip(" .,:;!\"'()[]")


def extract_answer(text: str) -> str:
    m = list(re.finditer(r"answer is[:\s]*", text, re.IGNORECASE))
    if m:
        tail = text[m[-1].end():]
        return normalize(tail.split("\n")[0])
    lines = [l for l in text.strip().split("\n") if l.strip()]
    return normalize(lines[-1]) if lines else ""


def synthetic_rows(n: int) -> list:
    return [{"input": f"Q: what comes after {i}? "
                      f"End with 'The answer is <number>.'",
             "target": str(i + 1), "task": "synthetic"} for i in range(n)]


def main():
    from exllamav3_tpu import model_init
    from exllamav3_tpu.generator import Generator, Job, GreedySampler

    p = argparse.ArgumentParser()
    model_init.add_args(p)
    p.add_argument("--dataset", help="JSONL rows with input + target")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--max_tokens", type=int, default=768)
    args = p.parse_args()

    if args.synthetic:
        rows = synthetic_rows(args.synthetic)
    else:
        assert args.dataset, "--dataset or --synthetic required"
        with open(args.dataset) as f:
            rows = [json.loads(l) for l in f if l.strip()]

    model, config, cache, tokenizer, gen_kwargs = model_init.init(args)
    gen = Generator(model, cache, tokenizer=tokenizer, **gen_kwargs)
    for i, row in enumerate(rows):
        ids = tokenizer.encode(row["input"])
        gen.enqueue(Job(np.asarray(ids), max_new_tokens=args.max_tokens,
                        sampler=GreedySampler(), identifier=i))
    outs: dict = {}
    while gen.pending or gen.active:
        for ev in gen.iterate():
            if ev["stage"] == "finished":
                outs[ev["identifier"]] = ev["full_text"]

    per_task = defaultdict(lambda: [0, 0])
    correct = 0
    for i, row in enumerate(rows):
        got = extract_answer(outs.get(i, ""))
        ok = got == normalize(str(row["target"]))
        correct += ok
        t = per_task[row.get("task", "all")]
        t[0] += ok
        t[1] += 1
    print(json.dumps({
        "metric": "bbeh_mini_acc",
        "value": round(correct / max(len(rows), 1), 4),
        "n": len(rows),
        "tasks": {k: round(v[0] / v[1], 4)
                  for k, v in sorted(per_task.items())},
    }))


if __name__ == "__main__":
    main()
