#!/usr/bin/env python
"""Prefill / decode throughput benchmark (feature reference:
/root/reference/eval/perf.py), plus a mixed-load serving section through
the continuous-batching generator reporting p50/p95 TTFT (BASELINE
metric 3).

    python eval/perf.py -m <model_dir> [-b 1 4 16] [--prefill 2048]
    python eval/perf.py -m <model_dir> --serving [--jobs 12]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_dir", required=True)
    p.add_argument("-b", "--batches", type=int, nargs="*", default=[1, 4, 16])
    p.add_argument("--prefill", type=int, default=2048)
    p.add_argument("--decode_steps", type=int, default=128)
    p.add_argument("--linear_mode", default="auto")
    p.add_argument("--serving", action="store_true",
                   help="mixed prefill/decode load through the Generator; "
                        "reports p50/p95 TTFT and aggregate throughput")
    p.add_argument("--jobs", type=int, default=12)
    p.add_argument("--max_new", type=int, default=64)
    p.add_argument("--max_batch", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from exllamav3_tpu.model import Config, Model, InferParams, Cache, CacheSpec

    config = Config.from_directory(
        args.model_dir, infer_params=InferParams(linear_mode=args.linear_mode)
    )
    model = Model.from_config(config)
    model.load()
    V = config.vocab_size
    rng = np.random.default_rng(0)

    if args.serving:
        from exllamav3_tpu.constants import PAGE_SIZE
        from exllamav3_tpu.generator import Generator, Job, GreedySampler

        pages = max(8, (args.jobs * (args.prefill // 2 + args.max_new))
                    // PAGE_SIZE + args.jobs + 2)
        cache = Cache(model, CacheSpec(layout="paged", num_pages=pages))
        gen = Generator(model, cache, max_batch_size=args.max_batch)

        def mk_jobs():
            out = []
            for i in range(args.jobs):
                plen = int(rng.integers(args.prefill // 4, args.prefill // 2))
                out.append(Job(rng.integers(3, V, size=plen),
                               max_new_tokens=args.max_new,
                               sampler=GreedySampler(), identifier=i))
            return out

        def run(jobs):
            for j in jobs:
                gen.enqueue(j)
            t0 = time.time()
            ttfts, new = [], 0
            while gen.pending or gen.active:
                for ev in gen.iterate():
                    if ev["stage"] == "finished":
                        ttfts.append(ev["ttft_s"])
                        new += ev["generated_tokens"]
            return ttfts, new, time.time() - t0

        run(mk_jobs()[: max(2, args.jobs // 2)])  # warm the bucket shapes
        ttfts, new, dt = run(mk_jobs())
        print(f"serving ({args.jobs} jobs, batch {args.max_batch}): "
              f"p50 TTFT {np.percentile(ttfts, 50)*1e3:.0f} ms   "
              f"p95 TTFT {np.percentile(ttfts, 95)*1e3:.0f} ms   "
              f"throughput {new/dt:.1f} tok/s")
        return

    for B in args.batches:
        S = args.prefill
        cache = Cache(model, CacheSpec(layout="linear", batch_size=B,
                                       max_len=S + args.decode_steps + 8))
        step = model.jitted_step("dense", donate_cache=True)
        ids = rng.integers(0, V, size=(B, S)).astype(np.int32)
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S)).copy()
        # compile
        logits, cache.state = step(model.params, jnp.asarray(ids), cache.state,
                                   jnp.asarray(pos), jnp.zeros(B, np.int32), None)
        np.asarray(logits[:, -1, :1])
        cache2 = Cache(model, CacheSpec(layout="linear", batch_size=B,
                                        max_len=S + args.decode_steps + 8))
        t0 = time.time()
        logits, cache2.state = step(model.params, jnp.asarray(ids), cache2.state,
                                    jnp.asarray(pos), jnp.zeros(B, np.int32), None)
        np.asarray(logits[:, -1, :1])
        prefill_tok_s = B * S / (time.time() - t0)

        step_fn = model.step_fn("dense")
        n = args.decode_steps

        def scan_decode(params, tok, state, t00):
            def body(carry, i):
                tok, state = carry
                t = t00 + i
                lg, state = step_fn(params, tok, state,
                                    jnp.full((B, 1), 0, jnp.int32) + t,
                                    jnp.full(B, 0, jnp.int32) + t, None)
                nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
                return (nxt, state), nxt[:, 0]

            (tok, state), toks = jax.lax.scan(body, (tok, state), jnp.arange(n))
            return tok, state, toks

        f = jax.jit(scan_decode, donate_argnums=(2,))
        tok = jnp.asarray(ids[:, -1:])
        tok, cache2.state, toks = f(model.params, tok, cache2.state, jnp.int32(S))
        np.asarray(toks)
        t0 = time.time()
        tok, cache2.state, toks = f(model.params, tok, cache2.state, jnp.int32(S + n))
        np.asarray(toks)
        decode_tok_s = B * n / (time.time() - t0)
        print(f"batch {B:3d}: prefill {prefill_tok_s:9.0f} tok/s   "
              f"decode {decode_tok_s:8.1f} tok/s ({decode_tok_s/B:.1f}/seq)")


if __name__ == "__main__":
    main()
