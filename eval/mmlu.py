#!/usr/bin/env python
"""MMLU harness (feature reference: /root/reference/eval/mmlu.py).

Multiple-choice scoring by comparing the model's logprobs of the choice
letters at the answer position (exact, one forward per question). Dataset
from a local JSONL (fields: question, choices [list of 4], answer [0-3],
subject optional) — the reference pulls cais/mmlu from the hub, unreachable
here — or a synthetic set (--synthetic N) that exercises the scoring path.

    python eval/mmlu.py -m <model_dir> --dataset mmlu_test.jsonl [--fewshot 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LETTERS = ["A", "B", "C", "D"]


def format_question(row: dict, with_answer: bool = False) -> str:
    s = row["question"].strip() + "\n"
    for i, c in enumerate(row["choices"]):
        s += f"{LETTERS[i]}. {c}\n"
    s += "Answer:"
    if with_answer:
        s += f" {LETTERS[row['answer']]}\n\n"
    return s


def synthetic_rows(n: int, vocab: int = 500) -> list:
    rng = np.random.default_rng(7)
    rows = []
    for i in range(n):
        a = int(rng.integers(0, 4))
        rows.append({
            "question": f"What is {i} plus {i}?",
            "choices": [str(2 * i + d - a) for d in range(4)],
            "answer": a,
            "subject": "synthetic",
        })
    return rows


def score_questions(model, tokenizer, rows, fewshot_prefix="",
                    batch: int = 8) -> list:
    """-> list of (row, predicted_index). Exact letter-logprob comparison at
    the final prompt position. fewshot_prefix: one shared string, or a
    per-row list (in-subject shots)."""
    letter_ids = [tokenizer.encode(" " + L)[-1] for L in LETTERS]
    if isinstance(fewshot_prefix, str):
        fewshot_prefix = [fewshot_prefix] * len(rows)
    prompts = [np.asarray(tokenizer.encode(pre + format_question(r)),
                          dtype=np.int32)
               for pre, r in zip(fewshot_prefix, rows)]
    preds = []
    for i in range(0, len(prompts), batch):
        chunk = prompts[i : i + batch]
        L = max(p.size for p in chunk)
        ids = np.zeros((len(chunk), L), np.int32)
        for j, p_ in enumerate(chunk):
            ids[j, : p_.size] = p_
        logits = np.asarray(model.forward_simple(ids))
        for j, p_ in enumerate(chunk):
            ll = logits[j, p_.size - 1]
            preds.append(int(np.argmax([ll[t] for t in letter_ids])))
    return preds


def main():
    from exllamav3_tpu import model_init
    from exllamav3_tpu.tokenizer import Tokenizer

    p = argparse.ArgumentParser()
    model_init.add_args(p, cache=False, draft=False)
    p.add_argument("--dataset", help="MMLU-format JSONL")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--fewshot", type=int, default=0,
                   help="N in-subject examples prepended (dev-split style)")
    p.add_argument("--dev_dataset",
                   help="JSONL supplying the few-shot examples (dev split). "
                        "Without it, shots are sampled per-subject from the "
                        "test rows (and removed from scoring) — NOT "
                        "comparable to standard MMLU few-shot; a warning is "
                        "printed.")
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    if args.synthetic:
        rows = synthetic_rows(args.synthetic)
    else:
        assert args.dataset, "--dataset or --synthetic required"
        with open(args.dataset) as f:
            rows = [json.loads(l) for l in f if l.strip()]
    if args.limit:
        rows = rows[: args.limit]

    model, config, cache, tokenizer, _ = model_init.init(args)
    if tokenizer is None:
        tokenizer = Tokenizer(args.model_dir)

    prefix = ""
    if args.fewshot:
        # shots must match each question's subject (dev-split style)
        if args.dev_dataset:
            with open(args.dev_dataset) as f:
                dev_rows = [json.loads(l) for l in f if l.strip()]
        else:
            print("warning: no --dev_dataset; sampling shots per-subject "
                  "from the test rows (removed from scoring) — accuracy is "
                  "not comparable to standard MMLU few-shot",
                  file=sys.stderr)
            by_subj = defaultdict(list)
            for r in rows:
                by_subj[r.get("subject", "all")].append(r)
            dev_rows = [r for rs in by_subj.values()
                        for r in rs[: args.fewshot]]
            drop = {id(r) for r in dev_rows}
            rows = [r for r in rows if id(r) not in drop]
        dev_by_subj = defaultdict(list)
        for r in dev_rows:
            dev_by_subj[r.get("subject", "all")].append(r)
        all_dev = dev_rows

        def shots_for(r):
            pool = dev_by_subj.get(r.get("subject", "all")) or all_dev
            return "".join(format_question(x, with_answer=True)
                           for x in pool[: args.fewshot])

        prefix = [shots_for(r) for r in rows]

    preds = score_questions(model, tokenizer, rows, prefix)
    per_subject = defaultdict(lambda: [0, 0])
    correct = 0
    for r, p_ in zip(rows, preds):
        ok = p_ == r["answer"]
        correct += ok
        s = per_subject[r.get("subject", "all")]
        s[0] += ok
        s[1] += 1
    print(json.dumps({
        "metric": "mmlu_acc",
        "value": round(correct / max(len(rows), 1), 4),
        "n": len(rows),
        "subjects": {k: round(v[0] / v[1], 4)
                     for k, v in sorted(per_subject.items())},
    }))


if __name__ == "__main__":
    main()
