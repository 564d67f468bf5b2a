#!/usr/bin/env python
"""Prefill / decode throughput benchmark (feature reference:
/root/reference/eval/perf.py).

    python eval/perf.py -m <model_dir> [-b 1 4 16] [--prefill 2048]
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
