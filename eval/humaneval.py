#!/usr/bin/env python
"""HumanEval harness (feature reference: /root/reference/eval/humaneval.py).

Generates completions for HumanEval-format problems through the continuous-
batching Generator and optionally executes the accompanying tests (pass@1).
The environment has no network access, so problems come from a local JSONL
(--dataset, standard fields: task_id/prompt/test/entry_point) or from a
built-in synthetic problem set (--synthetic N) that exercises the full
pipeline including execution-based scoring.

    python eval/humaneval.py -m <model_dir> --dataset HumanEval.jsonl --exec
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# prompt format -> (template, stop strings); {{problem}} is the fn signature
PROMPT_FORMATS = {
    "raw": ("```python\n{{problem}}    ", ["```", "\ndef ", "\nclass "]),
    "llama3": (
        "<|begin_of_text|><|start_header_id|>user<|end_header_id|>\n\n"
        "Complete the following Python function:\n\n{{problem}}<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
        "```python\n{{problem}}", ["```"]),
    "chatml": (
        "<|im_start|>user\nComplete the following Python function:\n\n"
        "{{problem}}<|im_end|>\n<|im_start|>assistant\n"
        "```python\n{{problem}}", ["```"]),
}


def synthetic_problems(n: int) -> list:
    """Trivial problems with executable tests — validates the harness."""
    probs = []
    for i in range(n):
        probs.append({
            "task_id": f"Synthetic/{i}",
            "prompt": f"def add_{i}(a, b):\n"
                      f'    """Return a + b + {i}."""\n',
            "entry_point": f"add_{i}",
            "test": (f"def check(candidate):\n"
                     f"    assert candidate(1, 2) == {3 + i}\n"
                     f"    assert candidate(0, 0) == {i}\n"),
            "canonical_solution": f"    return a + b + {i}\n",
        })
    return probs


def _exec_worker(code: str, q):
    try:
        g: dict = {}
        exec(code, g)
        q.put(True)
    except BaseException:
        q.put(False)


def run_test(problem: dict, completion: str, timeout: float = 8.0) -> bool:
    """Execute problem test against the completion in a subprocess."""
    code = (problem["prompt"] + completion + "\n\n" + problem["test"]
            + f"\ncheck({problem['entry_point']})\n")
    q = mp.Queue()
    p = mp.Process(target=_exec_worker, args=(code, q))
    p.start()
    p.join(timeout)
    if p.is_alive():
        p.terminate()
        p.join()
        return False
    try:
        return bool(q.get_nowait())
    except Exception:
        return False


def main():
    from exllamav3_tpu import model_init
    from exllamav3_tpu.generator import Generator, Job, GreedySampler

    p = argparse.ArgumentParser()
    model_init.add_args(p)
    p.add_argument("--dataset", help="HumanEval-format JSONL")
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic problems instead of a dataset")
    p.add_argument("--prompt_format", default="raw",
                   choices=sorted(PROMPT_FORMATS))
    p.add_argument("--max_tokens", type=int, default=384)
    p.add_argument("--exec", dest="do_exec", action="store_true",
                   help="execute tests and report pass@1")
    p.add_argument("--samples_out", help="write completions JSONL here")
    args = p.parse_args()

    if args.synthetic:
        problems = synthetic_problems(args.synthetic)
    else:
        assert args.dataset, "--dataset or --synthetic required"
        with open(args.dataset) as f:
            problems = [json.loads(l) for l in f if l.strip()]

    model, config, cache, tokenizer, gen_kwargs = model_init.init(args)
    gen = Generator(model, cache, tokenizer=tokenizer, **gen_kwargs)
    template, stops = PROMPT_FORMATS[args.prompt_format]

    for prob in problems:
        text = template.replace("{{problem}}", prob["prompt"])
        ids = tokenizer.encode(text)
        gen.enqueue(Job(np.asarray(ids), max_new_tokens=args.max_tokens,
                        sampler=GreedySampler(), stop_conditions=list(stops),
                        identifier=prob["task_id"]))

    completions: dict = {}
    while gen.pending or gen.active:
        for ev in gen.iterate():
            if ev["stage"] == "finished":
                completions[ev["identifier"]] = ev["full_text"]

    samples = [{"task_id": p_["task_id"],
                "completion": completions.get(p_["task_id"], "")}
               for p_ in problems]
    if args.samples_out:
        with open(args.samples_out, "w") as f:
            for s in samples:
                f.write(json.dumps(s) + "\n")

    if args.do_exec:
        passed = sum(run_test(p_, completions.get(p_["task_id"], ""))
                     for p_ in problems)
        print(json.dumps({"metric": "humaneval_pass@1",
                          "value": round(passed / max(len(problems), 1), 4),
                          "n": len(problems)}))
    else:
        print(json.dumps({"metric": "humaneval_completions",
                          "value": len(samples), "n": len(problems)}))


if __name__ == "__main__":
    main()
