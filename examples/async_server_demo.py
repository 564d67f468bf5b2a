#!/usr/bin/env python
"""AsyncGenerator demo: serve concurrent requests from asyncio (the surface
an OpenAI-compatible server like TabbyAPI builds on; reference README.md:5).
"""
from __future__ import annotations

import argparse
import asyncio
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav3_tpu import model_init
from exllamav3_tpu.generator import AsyncGenerator, Generator, Job, DefaultSampler


async def run(args):
    model, config, cache, tokenizer, gen_kwargs = model_init.init(args)
    agen = AsyncGenerator(Generator(model, cache, tokenizer, **gen_kwargs))

    async def one(prompt):
        ids = tokenizer.encode(prompt, add_bos=True)
        job = agen.enqueue(Job(ids, max_new_tokens=64, sampler=DefaultSampler()))
        r = await job.collect()
        return prompt, r["full_text"]

    results = await asyncio.gather(*[
        one("The capital of France is"),
        one("Water boils at"),
        one("def fibonacci(n):"),
    ])
    for prompt, text in results:
        print(f"\n=== {prompt!r}\n{text}")
    await agen.close()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    model_init.add_args(p)
    asyncio.run(run(p.parse_args()))
