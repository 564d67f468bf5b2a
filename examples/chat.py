#!/usr/bin/env python
"""Interactive chat example (feature reference: /root/reference/examples/chat.py).

    python examples/chat.py -m <model_dir> [--temp 0.8] [--system "..."]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from exllamav3_tpu import model_init
from exllamav3_tpu.generator import Generator, Job


def main():
    p = argparse.ArgumentParser()
    model_init.add_args(p)  # includes the sampling surface (-temp/-topk/...)
    p.add_argument("--system", default="You are a helpful assistant.")
    p.add_argument("--max_new_tokens", type=int, default=512)
    args = p.parse_args()

    model, config, cache, tokenizer, gen_kwargs = model_init.init(args)
    assert tokenizer is not None, "chat needs a tokenizer.json in the model dir"
    generator = Generator(model, cache, tokenizer, **gen_kwargs)
    sampler = model_init.get_arg_sampler(args)

    messages = [{"role": "system", "content": args.system}]
    stop = [tokenizer.eos_token_id] if tokenizer.eos_token_id is not None else []

    print("-- chat ready (Ctrl-D to exit) --")
    while True:
        try:
            user = input("\nYou: ")
        except EOFError:
            break
        messages.append({"role": "user", "content": user})
        prompt = tokenizer.render_chat(messages)
        ids = tokenizer.encode(prompt, add_bos=True)
        job = Job(ids, max_new_tokens=args.max_new_tokens, sampler=sampler,
                  stop_conditions=stop)
        generator.enqueue(job)
        print("Bot: ", end="", flush=True)
        reply = ""
        while generator.num_remaining_jobs():
            for r in generator.iterate():
                if r["stage"] == "streaming" and "text" in r:
                    print(r["text"], end="", flush=True)
                    reply += r["text"]
        print()
        messages.append({"role": "assistant", "content": reply})


if __name__ == "__main__":
    main()
