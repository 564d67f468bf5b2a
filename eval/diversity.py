#!/usr/bin/env python
"""Sampling diversity test (feature reference: /root/reference/eval/
diversity.py — "highly scientific").

Protocol, as upstream: generate N samples per creative prompt, extract the
free variables (names, colors, cities) with a second constrained pass, and
score each variable as (1 - P(X1 = X2))^2 over unordered sample pairs —
0.0 when every sample agrees, 1.0 when all are unique.

Two extraction backends:
  * FormatronFilter JSON extraction when `formatron` is installed (the
    upstream protocol verbatim);
  * a plain greedy second pass parsed as "first line of the answer" when it
    is not (this environment ships no formatron).

--token_mode drops the language protocol entirely and scores diversity of
the raw sampled token sequences (full sequence + first-8-token prefix).
That is the only meaningful measurement on synthetic checkpoints, and it
is what the smoke test exercises: greedy must score 0.0, a temperature
sampler on a near-uniform model close to 1.0.

    python eval/diversity.py -m <model_dir> [-n 10] [--temperature 0.8]
    python eval/diversity.py -m <model_dir> --token_mode
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

SYSTEM_PROMPT = "You are a creative writing assistant."

PROMPTS = [
    {
        "prompt": (
            "Write the opening paragraph to a short story about a cat and "
            "its owner. Mention the owner's name, the cat's name and color, "
            "and the color of the owner's dress."),
        "questions": [
            ("cat_name", "What is the name of the cat in the paragraph above?"),
            ("cat_color", "What is the color of the cat in the paragraph above?"),
            ("owner_name", "What is the name of the cat's owner in the paragraph above?"),
            ("dress_color", "What is the color of the owner's dress in the paragraph above?"),
        ],
    },
    {
        "prompt": (
            "I'm writing a story. Give me the first paragraph, which should "
            "describe the main character: their name, occupation, and the "
            "city the story takes place in."),
        "questions": [
            ("char_name", "What is the name of the main character in the paragraph above?"),
            ("occupation", "What is the occupation of the main character in the paragraph above?"),
            ("city", "Which city does the story above take place in?"),
        ],
    },
]


def diversity_score(samples) -> float:
    """(1 - P(X1 = X2))^2 over unordered pairs (reference diversity.py:66)."""
    n = len(samples)
    if n < 2:
        return 0.0
    counts = Counter(samples)
    same_pairs = sum(c * (c - 1) for c in counts.values())
    total_pairs = n * (n - 1)
    return (1.0 - same_pairs / total_pairs) ** 2


def clean(text: str) -> str:
    text = re.sub(r"<think>.*?</think>", "", text, flags=re.DOTALL)
    return text.strip()


def run_jobs(generator, jobs):
    generator.enqueue(jobs)
    texts = {id(j): "" for j in jobs}
    while generator.num_remaining_jobs():
        for r in generator.iterate():
            if r.get("stage") == "finished":
                texts[id(r["job"])] = r.get("full_text", "")
    return [texts[id(j)] for j in jobs]


def token_mode(model, num_samples: int, temperature: float, max_tokens: int,
               seed: int = 0) -> dict:
    """Token-sequence diversity: works with or without a tokenizer."""
    from exllamav3_tpu.generator import Generator, Job
    from exllamav3_tpu.generator.sampler import GreedySampler, DefaultSampler
    from exllamav3_tpu.model import Cache, CacheSpec

    cache = Cache(model, CacheSpec(layout="paged", num_pages=64))
    generator = Generator(model, cache, max_batch_size=min(8, num_samples))
    rng = np.random.default_rng(seed)
    prompt_pool = [rng.integers(1, model.config.vocab_size, size=8)
                   for _ in range(3)]
    out = {}
    for name, mk_sampler in (
            ("greedy", GreedySampler),
            ("sampled", lambda: DefaultSampler(temperature=temperature))):
        full_scores, prefix_scores = [], []
        for p_i, prompt in enumerate(prompt_pool):
            jobs = [Job(prompt, max_new_tokens=max_tokens,
                        sampler=mk_sampler(), seed=1000 * p_i + i)
                    for i in range(num_samples)]
            generator.enqueue(jobs)
            while generator.num_remaining_jobs():
                generator.iterate()
            seqs = [tuple(j.new_tokens) for j in jobs]
            # score per prompt, then mean — pooling across prompts would
            # credit greedy with the prompts' own diversity
            full_scores.append(diversity_score(seqs))
            prefix_scores.append(diversity_score([t[:8] for t in seqs]))
        out[name] = {
            "full_seq": float(np.mean(full_scores)),
            "prefix8": float(np.mean(prefix_scores)),
        }
    return out


def language_mode(args):
    from exllamav3_tpu.generator import Generator, Job
    from exllamav3_tpu.generator.sampler import GreedySampler, DefaultSampler
    from exllamav3_tpu.generator.filter import FormatronFilter
    from exllamav3_tpu.model import Cache, CacheSpec, Config, Model, InferParams
    from exllamav3_tpu.tokenizer import Tokenizer

    model = Model.from_config(Config.from_directory(
        args.model, infer_params=InferParams(linear_mode=args.mode)))
    model.load()
    tokenizer = Tokenizer(args.model)
    cache = Cache(model, CacheSpec(layout="paged", num_pages=args.pages))
    generator = Generator(model, cache, tokenizer=tokenizer, max_batch_size=8)

    try:
        from formatron.formatter import FormatterBuilder  # noqa: F401

        have_formatron = True
    except ImportError:
        have_formatron = False

    def chat_ids(user_content: str):
        msgs = [{"role": "system", "content": SYSTEM_PROMPT},
                {"role": "user", "content": user_content}]
        try:
            text = tokenizer.render_chat(msgs, add_generation_prompt=True)
        except ValueError:  # no chat template: plain instruct framing
            text = f"{SYSTEM_PROMPT}\n\nUser: {user_content}\n\nAssistant:"
        return tokenizer.encode(text, add_bos=True)

    stop = [tokenizer.eos_token_id] if tokenizer.eos_token_id is not None else []
    all_sets: dict[str, list] = {}
    for p in PROMPTS:
        jobs = [Job(chat_ids(p["prompt"]), max_new_tokens=args.max_tokens,
                    sampler=DefaultSampler(temperature=args.temperature),
                    stop_conditions=list(stop), seed=i)
                for i in range(args.num_samples)]
        samples = [clean(t) for t in run_jobs(generator, jobs)]
        print(f"\nSample:\n{samples[0][:400]}")

        jobs, meta = [], []
        for i, sample in enumerate(samples):
            for var, question in p["questions"]:
                filters = None
                if have_formatron:
                    from formatron.formatter import FormatterBuilder
                    from formatron.schemas.dict_inference import infer_mapping

                    f = FormatterBuilder()
                    f.append_line(f'{f.json(infer_mapping({var: "x"}), capture_name="json")}')
                    filters = [FormatronFilter(tokenizer, formatter_builder=f,
                                               eos_after_completed=True)]
                q = question if have_formatron else (
                    question + " Answer with just the value, nothing else.")
                jobs.append(Job(chat_ids(sample + "\n\n" + q),
                                max_new_tokens=64, sampler=GreedySampler(),
                                stop_conditions=list(stop), filters=filters))
                meta.append(var)
        results = run_jobs(generator, jobs)

        sets: dict[str, list] = {v: [] for v, _ in p["questions"]}
        for var, result in zip(meta, results):
            result = result.strip()
            if have_formatron:
                try:
                    sets[var].append(str(json.loads(result)[var]).strip().lower())
                except (json.JSONDecodeError, KeyError):
                    continue
            elif result:
                sets[var].append(result.splitlines()[0].strip().lower())
        all_sets.update(sets)
        for k, v in sets.items():
            print(f"{k:20s} {Counter(v).most_common(5)}")

    print("\nScores:")
    total = 0.0
    for k, v in all_sets.items():
        s = diversity_score(v)
        total += s
        print(f"{k:20s} {s:8.6f}")
    print("-" * 29)
    print(f"{'mean':20s} {total / max(len(all_sets), 1):8.6f}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", required=True)
    parser.add_argument("--mode", default="auto", help="runtime linear_mode")
    parser.add_argument("-n", "--num_samples", type=int, default=10)
    parser.add_argument("--max_tokens", type=int, default=300)
    parser.add_argument("--temperature", type=float, default=0.8)
    parser.add_argument("--pages", type=int, default=256)
    parser.add_argument("--token_mode", action="store_true",
                        help="score raw token-sequence diversity (synthetic-"
                             "model capable; no tokenizer required)")
    args = parser.parse_args()

    if args.token_mode:
        from exllamav3_tpu.model import Config, Model, InferParams

        model = Model.from_config(Config.from_directory(
            args.model, infer_params=InferParams(linear_mode=args.mode)))
        model.load()
        res = token_mode(model, args.num_samples, args.temperature,
                         min(args.max_tokens, 32))
        for name, d in res.items():
            print(f"{name:8s} full_seq={d['full_seq']:.4f} "
                  f"prefix8={d['prefix8']:.4f}")
        return
    language_mode(args)


if __name__ == "__main__":
    main()
