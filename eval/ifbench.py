#!/usr/bin/env python
"""Instruction-following harness (feature reference:
/root/reference/eval/ifbench.py — IFEval-style verifiable instructions).

Each row carries a prompt plus machine-verifiable constraints; the score is
the fraction of responses satisfying ALL their constraints (strict) and the
per-constraint rate (loose). Dataset from local JSONL rows
{"prompt": ..., "checks": [{"type": ..., ...}]} or --synthetic N.

Supported check types (the verifiable core of the reference set):
  max_words {n} / min_words {n}, contains {text}, not_contains {text},
  starts_with {text}, ends_with {text}, n_paragraphs {n}, all_lowercase,
  all_uppercase, json_object.

    python eval/ifbench.py -m <model_dir> --dataset ifbench.jsonl
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check_response(text: str, check: dict) -> bool:
    t = check["type"]
    if t == "max_words":
        return len(text.split()) <= check["n"]
    if t == "min_words":
        return len(text.split()) >= check["n"]
    if t == "contains":
        return check["text"] in text
    if t == "not_contains":
        return check["text"] not in text
    if t == "starts_with":
        return text.lstrip().startswith(check["text"])
    if t == "ends_with":
        return text.rstrip().endswith(check["text"])
    if t == "n_paragraphs":
        return len([p for p in text.split("\n\n") if p.strip()]) == check["n"]
    if t == "all_lowercase":
        return text == text.lower()
    if t == "all_uppercase":
        return text == text.upper()
    if t == "json_object":
        try:
            return isinstance(json.loads(text.strip()), dict)
        except Exception:
            return False
    raise ValueError(f"unknown check type {t}")


def synthetic_rows(n: int) -> list:
    rows = []
    for i in range(n):
        rows.append({
            "prompt": f"Write about topic {i} in under 40 words.",
            "checks": [{"type": "max_words", "n": 40}],
        })
    return rows


def main():
    from exllamav3_tpu import model_init
    from exllamav3_tpu.generator import Generator, Job, GreedySampler

    p = argparse.ArgumentParser()
    model_init.add_args(p)
    p.add_argument("--dataset", help="JSONL rows with prompt + checks")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--max_tokens", type=int, default=512)
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
        ids = tokenizer.encode(row["prompt"])
        gen.enqueue(Job(np.asarray(ids), max_new_tokens=args.max_tokens,
                        sampler=GreedySampler(), identifier=i))
    outs: dict = {}
    while gen.pending or gen.active:
        for ev in gen.iterate():
            if ev["stage"] == "finished":
                outs[ev["identifier"]] = ev["full_text"]

    strict = 0
    checks_pass = checks_total = 0
    for i, row in enumerate(rows):
        text = outs.get(i, "")
        oks = [check_response(text, c) for c in row["checks"]]
        strict += all(oks)
        checks_pass += sum(oks)
        checks_total += len(oks)
    print(json.dumps({
        "metric": "ifbench_strict_acc",
        "value": round(strict / max(len(rows), 1), 4),
        "loose_rate": round(checks_pass / max(checks_total, 1), 4),
        "n": len(rows),
    }))


if __name__ == "__main__":
    main()
