"""Fused trellis-GEMM decode-op ablation (VERDICT r4 item 4).

The fused kernel decodes the trellis in VMEM at ~14 VPU ops/weight and sits
at its ARITHMETIC speed-of-light on v5e (doc/performance.md "Capacity
mode"). This tool separates the cost terms the way tools/dequant_probe.py
cracked the KV-dequant layout: kernel variants that keep the grid/blockspec
identical and drop compute stages one at a time.

Variants (all m=16, k=n=4096, K=4 default):
  full       the production kernel (extraction + codebook decode + dot)
  ingest     stream the words, dot a garbage constant — the pure HBM floor
  extract    funnel-shift extraction only; code -> f32 by int cast
  nomul      extraction + mask/xor, skip the multiply-add scramble
  f16pair    decode via ONE bitcast to two f16 halves + convert + add
             (candidate replacement for the 9-op two-half f32 assembly)

Timing: lax.scan over N kernel calls with per-step inputs (relay caches
identical executions; RTT amortizes over the scan), difference quotient
between N and 4N steps.

Usage: python tools/fused_ablate.py [--k 4096] [--n 4096] [--K 4] [--m 16]
"""
from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exllamav3_tpu.ops.exl3_gemm import (
    prepare_trellis_words, _decode_codes_f32, decode_scale)
from exllamav3_tpu.quant.codebook import CB_3INST


def _variant_kernel(x_ref, w_ref, out_ref, acc_ref, *, K, bkt, bnt, variant):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    L = bnt * 8
    words = w_ref[:].astype(jnp.uint32)  # (bkt, K, L)

    if variant == "ingest":
        # touch every word once, no decode: w = broadcast of a cheap sum
        s = (words[:, 0, :] ^ words[:, K - 1, :]).astype(jnp.int32)
        w = jnp.concatenate([s.astype(jnp.bfloat16)] * 32, axis=0)
        w = w.reshape(16 * bkt, 2 * L)
        acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

        @pl.when(k_idx == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = acc_ref[:]
        return

    pK1 = words[:, K - 1, :]
    r1 = pltpu.roll(pK1, 1, axis=1)
    r2 = pltpu.roll(pK1, L - 7, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bkt, L), 1)
    prev0 = jnp.where(lane % 8 == 0, r2, r1)

    def decode(code):
        if variant == "extract":
            return code.astype(jnp.int32).astype(jnp.float32)
        if variant == "nomul":
            m = (code & jnp.uint32(0x8FFF)) ^ jnp.uint32(0x3B60)
            return m.astype(jnp.int32).astype(jnp.float32)
        if variant == "f16pair":
            x = code * jnp.uint32(89226354) + jnp.uint32(64248484)
            m = (x & jnp.uint32(0x8FFF8FFF)) ^ jnp.uint32(0x3B603B60)
            hh = jax.lax.bitcast_convert_type(m, jnp.float16)  # (..., 2)
            return (hh[..., 0] + hh[..., 1]).astype(jnp.float32)
        return _decode_codes_f32(code, CB_3INST)  # full

    vals = []
    for t in range(32):
        end = (t + 1) * K
        wi = (end - 1) // 32
        sh = 32 * (wi + 1) - end
        b = words[:, wi, :]
        if sh == 0:
            code = b & jnp.uint32(0xFFFF)
        else:
            a = words[:, wi - 1, :] if wi > 0 else prev0
            code = ((a << (32 - sh)) | (b >> sh)) & jnp.uint32(0xFFFF)
        vals.append(decode(code))

    rows0, rows1 = [], []
    for rp in range(16):
        gl, rh, rl = rp >> 2, (rp >> 1) & 1, rp & 1
        rows0.append(vals[gl * 8 + rh * 2 + rl])
        rows1.append(vals[gl * 8 + 4 + rh * 2 + rl])
    w0 = jnp.concatenate(rows0, axis=0)
    w1 = jnp.concatenate(rows1, axis=0)
    w = jnp.concatenate([w0, w1], axis=1).astype(jnp.bfloat16)

    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("K", "variant", "bm", "bn", "bk"))
def run_variant(xh, words, K, variant, bm, bn, bk):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = xh.shape
    tk, kw, ln = words.shape
    n = (ln // 8) * 16
    bkt, bnt = bk // 16, bn // 16
    grid = (m // bm, n // bn, k // bk)
    kern = functools.partial(_variant_kernel, K=K, bkt=bkt, bnt=bnt,
                             variant=variant)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bkt, K, bnt * 8), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xh, words)


def time_variant(xs, words, K, variant, bm, bn, bk, steps=64):
    """lax.scan difference-quotient timing -> seconds per kernel call."""

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def scan_fn(xs_, words_, n_steps):
        def body(c, x):
            y = run_variant(x, words_, K, variant, bm, bn, bk)
            return c + y[0, :8], None

        c, _ = jax.lax.scan(body, jnp.zeros(8, jnp.float32),
                            xs_[:n_steps])
        return c

    def run(n):
        t0 = time.time()
        np.asarray(scan_fn(xs, words, n))
        return time.time() - t0

    run(steps); run(4 * steps)  # compile
    best = float("inf")
    for _ in range(3):
        dt = (run(4 * steps) - run(steps)) / (3 * steps)
        best = min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--K", type=int, default=4)
    ap.add_argument("--bm", type=int, default=16)
    ap.add_argument("--bn", type=int, default=256)
    ap.add_argument("--bk", type=int, default=256)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    m, k, n, K = args.m, args.k, args.n, args.K
    trellis = rng.integers(-32768, 32768,
                           size=(k // 16, n // 16, 16 * K)).astype(np.int16)
    words = jnp.asarray(prepare_trellis_words(trellis))
    # per-scan-step inputs so the relay cannot serve cached executions
    xs = jnp.asarray(rng.standard_normal((4 * args.steps, m, k))
                     .astype(np.float32)).astype(jnp.bfloat16)

    wbytes = words.size * 4
    hbm = 819e9  # v5e
    floor_us = wbytes / hbm * 1e6
    print(f"shape m={m} k={k} n={n} K={K}; trellis {wbytes/1e6:.1f} MB; "
          f"HBM floor {floor_us:.1f} us")

    for variant in ("ingest", "extract", "nomul", "f16pair", "full"):
        try:
            dt = time_variant(xs, words, K, variant, args.bm, args.bn,
                              args.bk, steps=args.steps)
            print(f"{variant:10s} {dt*1e6:8.1f} us  "
                  f"({dt*1e6/floor_us:5.2f}x HBM floor)")
        except Exception as e:
            print(f"{variant:10s} FAILED: {type(e).__name__}: {e}"[:160])


if __name__ == "__main__":
    main()
