"""Variant shootout for the int4 unpack kernel on the real TPU.

V1: current (int32 unpack, per-weight bf16 scale multiply)
V1b: V1 + the -8 bias folded into a free MXU dot against se
V2: group-dots — unscaled bf16 int dots per 64-row group, scales applied
    post-dot on the (m, bn) partials (removes the per-weight multiply)
V3: V1 but all bitwise ops in int8 (does Mosaic run packed int8 lanes?)
V4: int8 MXU dot with activation quantization, per-group post-dot scales
"""
import functools
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

GS = 64


def timed(fn, xs, iters=24):
    fn(xs[0]).block_until_ready()
    np.asarray(jax.device_get(fn(xs[1])[0, :8]))
    t0 = time.perf_counter()
    outs = [fn(xs[2 + (i % (len(xs) - 2))]) for i in range(iters)]
    np.asarray(jax.device_get(outs[-1][0, :8]))
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    o = fn(xs[2])
    np.asarray(jax.device_get(o[0, :8]))
    t3 = time.perf_counter()
    return ((t1 - t0) - (t3 - t2)) / (iters - 1)


def make_call(kernel, m, kh, n, bkh, bn, ng, extra_specs=(), extra_inputs=(),
              scratch=None):
    nkb = kh // bkh
    grid = (1, n // bn, nkb)
    in_specs = [
        pl.BlockSpec((m, bkh), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, bkh), lambda i, j, kk, _n=nkb: (i, kk + _n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bkh, bn), lambda i, j, kk: (kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ng, bn), lambda i, j, kk: (kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ng, bn), lambda i, j, kk, _n=nkb: (kk + _n, j),
                     memory_space=pltpu.VMEM),
    ] + list(extra_specs)
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((m, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=scratch or [pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )


def kern_v1(xl, xh, b, sl, sh, emat, o, acc):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    bi = b[:].astype(jnp.int32)
    se_lo = jnp.dot(emat[:], sl[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    se_hi = jnp.dot(emat[:], sh[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    wl = ((bi & 15) - 8).astype(jnp.bfloat16) * se_lo
    wh = (bi >> 4).astype(jnp.bfloat16) * se_hi
    acc[:] += jnp.dot(xl[:], wl, preferred_element_type=jnp.float32)
    acc[:] += jnp.dot(xh[:], wh, preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o[:] = acc[:]


def kern_v1b(xl, xh, b, sl, sh, emat, o, acc):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    bi = b[:].astype(jnp.int32)
    se_lo = jnp.dot(emat[:], sl[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    se_hi = jnp.dot(emat[:], sh[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    wl = (bi & 15).astype(jnp.bfloat16) * se_lo      # biased
    wh = (bi >> 4).astype(jnp.bfloat16) * se_hi
    acc[:] += jnp.dot(xl[:], wl, preferred_element_type=jnp.float32)
    acc[:] += jnp.dot(xh[:], wh, preferred_element_type=jnp.float32)
    # -8 bias correction as a free MXU dot: acc -= (8*x_lo) @ se_lo
    acc[:] -= jnp.dot(xl[:] * jnp.bfloat16(8.0), se_lo,
                      preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o[:] = acc[:]


def make_v2(ngroups):
    def kern(xl, xh, b, sl, sh, o, acc):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        bi = b[:].astype(jnp.int32)
        ql = ((bi & 15) - 8).astype(jnp.bfloat16)
        qh = (bi >> 4).astype(jnp.bfloat16)
        slf = sl[:].astype(jnp.float32)
        shf = sh[:].astype(jnp.float32)
        for g in range(ngroups):
            r = slice(g * GS, (g + 1) * GS)
            pl_ = jnp.dot(xl[:, r], ql[r], preferred_element_type=jnp.float32)
            ph_ = jnp.dot(xh[:, r], qh[r], preferred_element_type=jnp.float32)
            acc[:] += pl_ * slf[g:g + 1, :] + ph_ * shf[g:g + 1, :]

        @pl.when(kk == pl.num_programs(2) - 1)
        def _():
            o[:] = acc[:]
    return kern


def kern_v3(xl, xh, b, sl, sh, emat, o, acc):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    b8 = b[:]                                   # int8 lanes
    se_lo = jnp.dot(emat[:], sl[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    se_hi = jnp.dot(emat[:], sh[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    wl = ((b8 & jnp.int8(15)) - jnp.int8(8)).astype(jnp.bfloat16) * se_lo
    wh = (b8 >> 4).astype(jnp.bfloat16) * se_hi
    acc[:] += jnp.dot(xl[:], wl, preferred_element_type=jnp.float32)
    acc[:] += jnp.dot(xh[:], wh, preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o[:] = acc[:]


def make_v4(ngroups):
    # x pre-quantized to int8 outside (per-row scale folded after)
    def kern(xl, xh, b, sl, sh, o, acc):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        bi = b[:].astype(jnp.int32)
        ql = ((bi & 15) - 8).astype(jnp.int8)
        qh = (bi >> 4).astype(jnp.int8)
        slf = sl[:].astype(jnp.float32)
        shf = sh[:].astype(jnp.float32)
        for g in range(ngroups):
            r = slice(g * GS, (g + 1) * GS)
            pl_ = jax.lax.dot_general(
                xl[:, r], ql[r], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            ph_ = jax.lax.dot_general(
                xh[:, r], qh[r], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc[:] += (pl_.astype(jnp.float32) * slf[g:g + 1, :]
                       + ph_.astype(jnp.float32) * shf[g:g + 1, :])

        @pl.when(kk == pl.num_programs(2) - 1)
        def _():
            o[:] = acc[:]
    return kern


def main():
    print("device:", jax.devices()[0], flush=True)
    from exllamav3_tpu.ops.q_matmul import int4_pack_jnp, int4_matmul_ref

    rng = np.random.default_rng(0)
    m, k, n = 16, 4096, 14336
    kh = k // 2
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    packed, scales = int4_pack_jnp(jnp.asarray(w))
    packed.block_until_ready()
    bytes_total = packed.nbytes + scales.nbytes
    xs = [jnp.asarray(rng.standard_normal((m, k)).astype(np.float32),
                      dtype=jnp.bfloat16) for _ in range(6)]
    ref = np.asarray(int4_matmul_ref(xs[2], packed, scales))

    def emat(bkh):
        ng = bkh // GS
        E = np.zeros((bkh, ng), np.float32)
        for p in range(bkh):
            E[p, p // GS] = 1.0
        return jnp.asarray(E)

    for name, bkh, bn in (("v1", 512, 1024), ("v1b", 512, 1024),
                          ("v2", 512, 1024), ("v3", 512, 1024),
                          ("v4", 512, 1024), ("v1", 512, 2048),
                          ("v2", 512, 2048), ("v3", 512, 2048),
                          ("v2", 1024, 2048), ("v3", 1024, 1024),
                          ("v3", 512, 4096), ("v2", 512, 4096)):
        ng = bkh // GS
        try:
            if name in ("v1", "v1b", "v3"):
                kern = {"v1": kern_v1, "v1b": kern_v1b, "v3": kern_v3}[name]
                espec = [pl.BlockSpec((bkh, ng), lambda i, j, kk: (0, 0),
                                      memory_space=pltpu.VMEM)]
                call = make_call(kern, m, kh, n, bkh, bn, ng, espec)
                em = emat(bkh)
                f = jax.jit(lambda x, c=call, e=em: c(x, x, packed, scales,
                                                      scales, e))
            elif name == "v2":
                call = make_call(make_v2(ng), m, kh, n, bkh, bn, ng)
                f = jax.jit(lambda x, c=call: c(x, x, packed, scales, scales))
            else:  # v4
                call = make_call(make_v4(ng), m, kh, n, bkh, bn, ng)

                def f(x, c=call):
                    ax = jnp.max(jnp.abs(x.astype(jnp.float32)),
                                 axis=1, keepdims=True) + 1e-9
                    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 127 / ax),
                                  -127, 127).astype(jnp.int8)
                    return c(xq, xq, packed, scales, scales) * (ax / 127)
                f = jax.jit(f)
            got = np.asarray(f(xs[2]))
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            dt = timed(f, xs)
            gbs = bytes_total / dt / 1e9
            print(f"{name:4s} bkh={bkh:5d} bn={bn:5d}: {dt*1e6:8.1f} us  "
                  f"{gbs:7.1f} GB/s  err={err:.1e}", flush=True)
        except Exception as e:
            print(f"{name} bkh={bkh} bn={bn}: FAIL {type(e).__name__}: "
                  f"{e}"[:220], flush=True)


if __name__ == "__main__":
    main()
