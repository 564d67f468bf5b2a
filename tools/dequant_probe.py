"""Microbenchmark: in-kernel KV dequant variants on the real chip.

Isolates the VPU cost of the packed-word unpack that dominates quantized-KV
decode (doc/performance.md long-context table): times a Pallas kernel that
sweeps pages of packed K, dequantizes per head, and does the decode-shape
score matmul — for several unpack strategies:

  v0: current _dequant_rows (repeat -> shift -> mask -> int cast -> f32 cast
      -> add -> mul)
  v1: magic-exponent FMA (repeat -> shift -> mask -> OR 0x4B000000 ->
      bitcast f32 -> fma(x, se, cse)) — folds the midpoint offset, the
      2^23 magic bias and the scale into one pass; cse comes from the same
      scale matmul with a second expand matrix.
  v2: v1 with the score matmul in bf16 (cast k once).
  bf16: dense bf16 fetch (the baseline the quantized path must beat).

Run: python tools/dequant_probe.py [--ctx 16384] [--bits 4]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav3_tpu.ops.flash_attention import (
    _scale_expand_mat, _field_shifts)

PAGE = 256


def _kernel(q_ref, kq_ref, ks_ref, emat_ref, ematc_ref, shvec_ref,
            o_ref, acc_ref, *, variant, bits, Hk, D, n_pages):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = pl.program_id(1)
    g = D // 32
    gw = g * bits
    J = 32 // bits
    N = 1 << bits
    shvec = shvec_ref[:]
    emat = emat_ref[:]
    emat_c = ematc_ref[:]

    @pl.when((p == 0) & (pl.program_id(0) == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for h in range(Hk):
        words = kq_ref[0, :, h, :].astype(jnp.uint32)
        scales = ks_ref[0, :, h, :].astype(jnp.float32)
        se = jnp.dot(scales, emat, preferred_element_type=jnp.float32)
        mask = jnp.uint32(N - 1)
        if variant in ("v0", "v1", "v2"):
            wwide = pltpu.repeat(words, J, axis=1)
        if variant == "v0":
            q = ((wwide >> shvec) & mask).astype(jnp.int32).astype(jnp.float32)
            k = (q + np.float32((1 - N) / 2)) * se
        elif variant in ("v1", "v2"):
            cse = jnp.dot(scales, emat_c, preferred_element_type=jnp.float32)
            fbits = ((wwide >> shvec) & mask) | jnp.uint32(0x4B000000)
            xf = jax.lax.bitcast_convert_type(
                fbits.astype(jnp.int32), jnp.float32)
            k = xf * se + cse
        elif variant == "v3":
            # int16 SWAR: bitcast words to packed int16 (2x lane density),
            # unpack + convert + scale in 16-bit ops; bf16 score matmul.
            # Channel order differs from the int32 layout — timing-only here;
            # the real kernel would regenerate channel_perm for this layout.
            w16 = jax.lax.bitcast_convert_type(
                kq_ref[0, :, h, :], jnp.int16).reshape(words.shape[0], -1)
            J16 = 16 // bits
            wwide16 = pltpu.repeat(w16, J16, axis=1)          # (T, D) int16
            sh16 = ((jax.lax.broadcasted_iota(jnp.int16, (1, D), 1)
                     // jnp.int16(2 * gw)) * jnp.int16(bits))
            qf = ((wwide16 >> sh16) & jnp.int16(N - 1)).astype(jnp.bfloat16)
            se_b = se.astype(jnp.bfloat16)
            k = (qf + jnp.bfloat16((1 - N) / 2)) * se_b
        elif variant == "a_rep":
            # repeat + cast + mul only (numerics wrong: isolates repeat cost)
            wwide = pltpu.repeat(words, J, axis=1)
            k = wwide.astype(jnp.int32).astype(jnp.float32) * se
        elif variant == "a_static":
            # static shift instead of the per-lane variable shift
            wwide = pltpu.repeat(words, J, axis=1)
            q = ((wwide >> jnp.uint32(4)) & mask).astype(jnp.int32).astype(
                jnp.float32)
            k = (q + np.float32((1 - N) / 2)) * se
        elif variant == "a_noscale":
            # full unpack, no scale matmul application
            wwide = pltpu.repeat(words, J, axis=1)
            k = ((wwide >> shvec) & mask).astype(jnp.int32).astype(
                jnp.float32)
        elif variant == "a_nodeq":
            # no dequant at all: matmul against the raw repeated words
            wwide = pltpu.repeat(words, J, axis=1)
            k = wwide.astype(jnp.int32).astype(jnp.float32)
        else:
            raise ValueError(variant)
        qv = q_ref[0, h].astype(jnp.float32)
        if variant in ("v2", "v3"):
            s = jax.lax.dot_general(
                qv.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            s = jax.lax.dot_general(
                qv, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[h] = acc_ref[h] + jnp.sum(s, axis=1, keepdims=True)

    @pl.when(p == n_pages - 1)
    def _():
        o_ref[0] = acc_ref[:]


def _kernel_v4(qb_ref, kq_ref, ks_ref, emat_ref, ematc_ref, shvec_ref,
               o_ref, acc_ref, *, bits, Hk, D, n_pages, fma):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = pl.program_id(1)
    J = 32 // bits
    N = 1 << bits
    DW = Hk * D          # merged lane width after unpack

    @pl.when((p == 0) & (pl.program_id(0) == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = kq_ref[0].astype(jnp.uint32)          # (T, Hk*gw) dense lanes
    scales = ks_ref[0].astype(jnp.float32)        # (T, Hk*g)
    se = jnp.dot(scales, emat_ref[:], preferred_element_type=jnp.float32)
    wwide = pltpu.repeat(words, J, axis=1)        # (T, Hk*D)
    mask = jnp.uint32(N - 1)
    if fma:
        cse = jnp.dot(scales, ematc_ref[:], preferred_element_type=jnp.float32)
        fbits = ((wwide >> shvec_ref[:]) & mask) | jnp.uint32(0x4B000000)
        xf = jax.lax.bitcast_convert_type(fbits.astype(jnp.int32), jnp.float32)
        k = xf * se + cse
    else:
        q = ((wwide >> shvec_ref[:]) & mask).astype(jnp.int32).astype(
            jnp.float32)
        k = (q + np.float32((1 - N) / 2)) * se
    s = jax.lax.dot_general(qb_ref[:], k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + jnp.sum(s, axis=1, keepdims=True)

    @pl.when(p == n_pages - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _kernel_bf16(q_ref, k_ref, o_ref, acc_ref, *, Hk, D, n_pages):
    import jax.experimental.pallas as pl

    p = pl.program_id(1)

    @pl.when((p == 0) & (pl.program_id(0) == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for h in range(Hk):
        k = k_ref[0, :, h, :].astype(jnp.float32)
        qv = q_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(qv, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc_ref[h] = acc_ref[h] + jnp.sum(s, axis=1, keepdims=True)

    @pl.when(p == n_pages - 1)
    def _():
        o_ref[0] = acc_ref[:]


def build(variant, ctx, bits, Hk=8, D=128, G=4, reps=20):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pages = ctx // PAGE
    g = D // 32
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, Hk, G, D), jnp.float32)
    if variant == "bf16":
        k = jax.random.normal(key, (n_pages, PAGE, Hk, D), jnp.bfloat16)
        fn = pl.pallas_call(
            functools.partial(_kernel_bf16, Hk=Hk, D=D, n_pages=n_pages),
            grid=(reps, n_pages),
            in_specs=[
                pl.BlockSpec((1, Hk, G, D), lambda r, p: (0, 0, 0, 0)),
                pl.BlockSpec((1, PAGE, Hk, D), lambda r, p: (p, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Hk, G, 1), lambda r, p: (0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, Hk, G, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Hk, G, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )
        return jax.jit(lambda: fn(q, k))
    if variant in ("v4", "v5"):
        gw = g * bits
        kq = jax.random.randint(key, (n_pages, PAGE, Hk * gw),
                                jnp.iinfo(jnp.int32).min,
                                jnp.iinfo(jnp.int32).max, jnp.int32)
        ks = (jax.random.uniform(key, (n_pages, PAGE, Hk * g)) + 0.5).astype(
            jnp.bfloat16)
        qb = jax.random.normal(key, (Hk * G, Hk * D), jnp.float32)
        N = 1 << bits
        emat1 = _scale_expand_mat(D, bits)
        # merged block-diagonal expand: (Hk*g, Hk*D)
        emat_m = np.zeros((Hk * g, Hk * D), np.float32)
        shv1 = _field_shifts(D, bits).astype(np.uint32)
        shvec_m = np.zeros((1, Hk * D), np.uint32)
        for h in range(Hk):
            emat_m[h * g:(h + 1) * g, h * D:(h + 1) * D] = emat1
            shvec_m[0, h * D:(h + 1) * D] = shv1[0]
        # NOTE: timing-only — the merged repeat interleaves heads differently;
        # the real kernel regenerates channel_perm for the merged layout.
        ematc_m = emat_m * np.float32((1 - N) / 2 - 8388608.0)
        fn = pl.pallas_call(
            functools.partial(_kernel_v4, bits=bits, Hk=Hk, D=D,
                              n_pages=n_pages, fma=(variant == "v5")),
            grid=(reps, n_pages),
            in_specs=[
                pl.BlockSpec((Hk * G, Hk * D), lambda r, p: (0, 0)),
                pl.BlockSpec((1, PAGE, Hk * gw), lambda r, p: (p, 0, 0)),
                pl.BlockSpec((1, PAGE, Hk * g), lambda r, p: (p, 0, 0)),
                pl.BlockSpec(emat_m.shape, lambda r, p: (0, 0)),
                pl.BlockSpec(ematc_m.shape, lambda r, p: (0, 0)),
                pl.BlockSpec(shvec_m.shape, lambda r, p: (0, 0)),
            ],
            out_specs=pl.BlockSpec((Hk * G, 1), lambda r, p: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((Hk * G, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Hk * G, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )
        a = (jnp.asarray(qb), jnp.asarray(kq), jnp.asarray(ks),
             jnp.asarray(emat_m), jnp.asarray(ematc_m), jnp.asarray(shvec_m))
        return jax.jit(lambda: fn(*a))
    kq = jax.random.randint(key, (n_pages, PAGE, Hk, g * bits),
                            jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max,
                            jnp.int32)
    ks = (jax.random.uniform(key, (n_pages, PAGE, Hk, g)) + 0.5).astype(
        jnp.bfloat16)
    N = 1 << bits
    emat = _scale_expand_mat(D, bits)
    emat_c = emat * np.float32((1 - N) / 2 - 8388608.0)
    shvec = _field_shifts(D, bits).astype(np.uint32)
    fn = pl.pallas_call(
        functools.partial(_kernel, variant=variant, bits=bits, Hk=Hk, D=D,
                          n_pages=n_pages),
        grid=(reps, n_pages),
        in_specs=[
            pl.BlockSpec((1, Hk, G, D), lambda r, p: (0, 0, 0, 0)),
            pl.BlockSpec((1, PAGE, Hk, g * bits), lambda r, p: (p, 0, 0, 0)),
            pl.BlockSpec((1, PAGE, Hk, g), lambda r, p: (p, 0, 0, 0)),
            pl.BlockSpec(emat.shape, lambda r, p: (0, 0)),
            pl.BlockSpec(emat_c.shape, lambda r, p: (0, 0)),
            pl.BlockSpec(shvec.shape, lambda r, p: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hk, G, 1), lambda r, p: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, Hk, G, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Hk, G, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )
    ematj, ematcj, shvecj = (jnp.asarray(emat), jnp.asarray(emat_c),
                             jnp.asarray(shvec))
    return jax.jit(lambda: fn(q, kq, ks, ematj, ematcj, shvecj))


def timeit(fn, iters=5, reps=20):
    fn().block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        r.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e6 / reps  # us per sweep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=16384)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--hk", type=int, default=8)
    args = ap.parse_args()

    # numeric parity check first (v1 vs v0)
    for variant in ("bf16", "v0", "v4", "v5"):
        try:
            fn = build(variant, args.ctx, args.bits, Hk=args.hk)
            us = timeit(fn)
            print(f"{variant:>9}: {us:8.1f} us  ctx={args.ctx} "
                  f"bits={args.bits} Hk={args.hk}", flush=True)
        except Exception as e:
            print(f"{variant:>9}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
