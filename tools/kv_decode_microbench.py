#!/usr/bin/env python
"""Isolated paged flash-decode kernel timing: bf16 vs quantized KV.

The long-context table (doc/performance.md) shows 4-bit KV decoding SLOWER
than bf16 at 16k resident despite 3.6x fewer cache bytes — this tool times
the attention kernel alone (one layer's K/V, S=1 decode) so dequant-path
changes can be measured without a full-model load. Timings amortize the
tunnel RTT with a lax.scan of `steps` kernel calls per dispatch.

    python tools/kv_decode_microbench.py [--ctx 16384] [--bits 0,4,8]
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
    ap.add_argument("--ctx", default="16384")
    ap.add_argument("--bits", default="0,4,8")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--hq", type=int, default=32)
    ap.add_argument("--hk", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    args = ap.parse_args()

    from exllamav3_tpu.ops.flash_attention import flash_attention
    from exllamav3_tpu.ops.kv_quant import quantize_kv

    dev = jax.devices()[0]
    hbm_gbps = 819.0 if "v5 lite" in str(dev.device_kind) else 819.0
    print(f"device: {dev.device_kind}")

    rng = np.random.default_rng(0)
    B, Hq, Hk, D = 1, args.hq, args.hk, args.d

    for ctx in (int(c) for c in args.ctx.split(",")):
        n_pages = ctx // PAGE
        k = rng.standard_normal((n_pages, PAGE, Hk, D)).astype(np.float32) * 0.3
        v = rng.standard_normal((n_pages, PAGE, Hk, D)).astype(np.float32) * 0.3
        bt = np.arange(n_pages, dtype=np.int32)[None]
        for bits in (int(b) for b in args.bits.split(",")):
            if bits:
                kq, ks = quantize_kv(jnp.asarray(k), bits)
                vq, vs = quantize_kv(jnp.asarray(v), bits)
                state = {"k_q": kq, "k_s": ks, "v_q": vq, "v_s": vs}
                kv_bytes = sum(int(a.size * a.dtype.itemsize)
                               for a in state.values())
            else:
                state = {"k": jnp.asarray(k, jnp.bfloat16),
                         "v": jnp.asarray(v, jnp.bfloat16)}
                kv_bytes = 2 * 2 * ctx * Hk * D

            fa = functools.partial(
                flash_attention, scale=D ** -0.5, k_bits=bits, v_bits=bits)

            def run(qs, state, bt, pos, tl, steps):
                def body(c, q1):
                    o = fa(q1, state, pos, tl, block_tables=bt)
                    return c + jnp.sum(o), None

                c, _ = jax.lax.scan(body, jnp.float32(0),
                                    qs)
                return c

            runj = jax.jit(run, static_argnames=("steps",))
            pos = jnp.full((B, 1), ctx - 1, jnp.int32)
            tl = jnp.full((B,), ctx, jnp.int32)
            qs = jnp.asarray(rng.standard_normal(
                (args.steps, B, 1, Hq, D)), jnp.bfloat16)
            qs4 = jnp.asarray(rng.standard_normal(
                (4 * args.steps, B, 1, Hq, D)), jnp.bfloat16)
            btj = jnp.asarray(bt)

            float(runj(qs, state, btj, pos, tl, args.steps))     # compile
            float(runj(qs4, state, btj, pos, tl, 4 * args.steps))

            def best(q_in, steps, reps=3):
                bt_ = float("inf")
                for _ in range(reps):
                    t0 = time.time()
                    float(runj(q_in, state, btj, pos, tl, steps))
                    bt_ = min(bt_, time.time() - t0)
                return bt_

            dt = max(best(qs4, 4 * args.steps) - best(qs, args.steps), 1e-9)
            per_step = dt / (3 * args.steps)
            floor = kv_bytes / (hbm_gbps * 1e9)
            print(f"ctx={ctx:6d} bits={bits}: {per_step * 1e6:8.1f} us/step "
                  f"(KV {kv_bytes / 1e6:7.1f} MB, HBM floor "
                  f"{floor * 1e6:6.1f} us, {floor / per_step * 100:5.1f}% )")


if __name__ == "__main__":
    main()
