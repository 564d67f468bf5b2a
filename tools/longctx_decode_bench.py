#!/usr/bin/env python
"""Long-context decode throughput: tok/s vs resident context length, for
bf16 and quantized KV caches (BASELINE config-5 adjacent measurement).

Per decoded token the paged flash kernel streams the whole resident K/V
once, so context length converts into attention HBM traffic; the 2-8 bit
cache divides that term. Reported roofline counts weight bytes + resident
KV bytes per token.

    python tools/longctx_decode_bench.py [--ctx 512,4096,16384] [--k_bits 0,4]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

PAGE = 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", default="512,4096,16384")
    ap.add_argument("--k_bits", default="0,4")
    ap.add_argument("--steps", type=int, default=24)
    args = ap.parse_args()
    ctxs = [int(c) for c in args.ctx.split(",")]
    bit_list = [int(b) for b in args.k_bits.split(",")]

    from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
    from exllamav3_tpu.model import Cache, CacheSpec, Config, Model, InferParams

    cfg = tiny_llama_cfg(
        vocab_size=32768, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_q_heads=32, num_kv_heads=8, head_dim=128,
        extra={"max_position_embeddings": 65536},
    )
    d = os.path.join("/tmp", f"exl3tpu_bench_{cfg['hidden_size']}")
    if not os.path.exists(os.path.join(d, "config.json")):
        write_tiny_llama_exl3(d, cfg, K=4, seed=0)
    model = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(linear_mode="int8")))
    model.load()
    wbytes = 0
    for grp in model.params.values():
        for name, arr in grp.items():
            if name in ("weight", "weight_q", "scale", "qkv_q", "qkv_scale",
                        "gate_up_q", "gate_up_scale"):
                wbytes += arr.size * arr.dtype.itemsize
    hbm = 819e9
    L, Hk, D = cfg["num_hidden_layers"], cfg["num_key_value_heads"], 128

    max_ctx = max(ctxs)
    pages = max_ctx // PAGE + 4

    for bits in bit_list:
        cache = Cache(model, CacheSpec(layout="paged", num_pages=pages,
                                       k_bits=bits, v_bits=bits))
        bt = jnp.asarray(np.arange(pages, dtype=np.int32)[None, :])
        step_fn = model.step_fn("paged", k_bits=bits, v_bits=bits)

        @functools.partial(jax.jit, static_argnames=("steps",))
        def scan2(params, tok, state, t0_, steps):
            def body(carry, i):
                tok, state = carry
                t = t0_ + i
                logits, state = step_fn(params, tok, state,
                                        jnp.full((1, 1), 0, jnp.int32) + t,
                                        jnp.full(1, 0, jnp.int32) + t, bt)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
                return (nxt, state), nxt[:, 0]

            (tok, state), toks = jax.lax.scan(body, (tok, state),
                                              jnp.arange(steps))
            return tok, state, toks

        for ctx in ctxs:
            # fill the cache to `ctx` tokens with chunked prefill
            cache.reset()
            rng = np.random.default_rng(0)
            state = cache.state
            pf = model.step_fn("paged", k_bits=bits, v_bits=bits)
            pf_j = jax.jit(pf)
            for s0 in range(0, ctx, 2048):
                chunk = min(2048, ctx - s0)
                ids = rng.integers(1, cfg["vocab_size"], (1, chunk)).astype(np.int32)
                pos = np.arange(s0, s0 + chunk, dtype=np.int32)[None, :]
                logits, state = pf_j(model.params, jnp.asarray(ids), state,
                                     jnp.asarray(pos),
                                     jnp.full(1, s0, np.int32), bt)
            np.asarray(logits[0, -1, :4])
            cache.state = state

            tok = jnp.asarray([[5]], jnp.int32)
            serial = [0]

            def run(steps):
                best = float("inf")
                for _ in range(3):
                    serial[0] += 1
                    t0 = time.time()
                    _, _, toks = scan2(model.params,
                                       tok + (serial[0] & 7), cache.state,
                                       jnp.int32(ctx), steps=steps)
                    np.asarray(toks[-1])
                    best = min(best, time.time() - t0)
                return best

            run(args.steps); run(4 * args.steps)
            dt = max(run(4 * args.steps) - run(args.steps), 1e-9) / (3 * args.steps)
            kv_bpt = 2 * ctx * Hk * D * L * (2 if bits == 0 else bits / 8.0)
            roof = hbm / (wbytes + kv_bpt)
            print(f"kv_bits={bits or 'bf16':>4} ctx={ctx:6d}: "
                  f"{1.0 / dt:7.2f} tok/s  (roofline {roof:7.2f}, "
                  f"{100.0 / dt / roof:5.1f}%)", flush=True)
        del cache
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
