#!/usr/bin/env python
"""One-off int4-kernel design sweep on the real TPU: kernel-body variants x
block geometries, timed with the scan difference-quotient (tunnel-RTT safe).
Informs which unpack strategy and block shape the production kernel uses.

    python tools/int4_sweep.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exllamav3_tpu.ops.q_matmul import int4_pack_jnp, _int4_expand_mat

REPS = 250


def make_kernel(variant: str):
    def kern(x_lo_ref, x_hi_ref, b_ref, s_lo_ref, s_hi_ref, emat_ref,
             out_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        s_lo = s_lo_ref[:].astype(jnp.float32)
        s_hi = s_hi_ref[:].astype(jnp.float32)
        emat = emat_ref[:].astype(jnp.bfloat16)
        se_lo = jnp.dot(emat, s_lo_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        se_hi = jnp.dot(emat, s_hi_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        if variant == "i32":
            # widen bytes to i32, extract there (the original design)
            b32 = b_ref[:].astype(jnp.int32) & 255
            w_lo = ((b32 & 15) - 8).astype(jnp.bfloat16) * se_lo
            w_hi = ((b32 >> 4) - 8).astype(jnp.bfloat16) * se_hi
        elif variant == "bitcast":
            # current production body
            w32 = pltpu.bitcast(b_ref[:], jnp.int32)
            lo_u = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)
            hi_u = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
            w_lo = (lo_u.astype(jnp.bfloat16) - jnp.bfloat16(8.0)) * se_lo
            w_hi = (hi_u.astype(jnp.bfloat16) - jnp.bfloat16(8.0)) * se_hi
        elif variant == "bitcast_mxufix":
            # unbiased dots + MXU correction (timing reference; less precise)
            w32 = pltpu.bitcast(b_ref[:], jnp.int32)
            lo_u = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)
            hi_u = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
            w_lo = lo_u.astype(jnp.bfloat16) * se_lo
            w_hi = hi_u.astype(jnp.bfloat16) * se_hi
        elif variant == "xor_center":
            # (v ^ 8) maps [0,15] -> [-8,7]+16*? : NOT correct math; timing
            # probe only for the cost of a pure-i8 path
            w32 = pltpu.bitcast(b_ref[:], jnp.int32)
            lo_u = pltpu.bitcast((w32 & 0x0F0F0F0F) ^ 0x08080808, jnp.int8)
            hi_u = pltpu.bitcast(((w32 >> 4) & 0x0F0F0F0F) ^ 0x08080808, jnp.int8)
            w_lo = lo_u.astype(jnp.bfloat16) * se_lo
            w_hi = hi_u.astype(jnp.bfloat16) * se_hi
        else:
            raise ValueError(variant)
        acc_ref[:] += jnp.dot(x_lo_ref[:], w_lo,
                              preferred_element_type=jnp.float32)
        acc_ref[:] += jnp.dot(x_hi_ref[:], w_hi,
                              preferred_element_type=jnp.float32)
        if variant == "bitcast_mxufix":
            c_lo = jnp.dot(x_lo_ref[:], emat.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            c_hi = jnp.dot(x_hi_ref[:], emat.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            acc_ref[:] += -8.0 * (
                jnp.dot(c_lo, s_lo, preferred_element_type=jnp.float32)
                + jnp.dot(c_hi, s_hi, preferred_element_type=jnp.float32))

        @pl.when(kk == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kern


@functools.partial(jax.jit, static_argnames=("variant", "block_m", "block_n",
                                              "block_kh", "group"))
def int4_mm(x, packed, scales, variant="bitcast", block_m=256, block_n=512,
            block_kh=512, group=32):
    m, k = x.shape
    kh, n = packed.shape
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_kh = min(block_kh, kh)
    ng = block_kh // group
    nkb = kh // block_kh
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n), nkb)
    emat = jnp.asarray(_int4_expand_mat(block_kh, group))
    return pl.pallas_call(
        make_kernel(variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_kh), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_kh),
                         lambda i, j, kk, _n=nkb: (i, kk + _n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_kh, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, block_n),
                         lambda i, j, kk, _n=nkb: (kk + _n, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_kh, ng), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x.astype(jnp.bfloat16), x.astype(jnp.bfloat16), packed, scales, scales,
      emat)


@functools.partial(jax.jit, static_argnames=("variant", "block_m", "block_n",
                                              "block_kh", "reps"))
def loop(x, packed, scales, variant, block_m, block_n, block_kh, reps):
    def body(carry, _):
        y = int4_mm(carry, packed, scales, variant=variant, block_m=block_m,
                    block_n=block_n, block_kh=block_kh)
        dep = jnp.max(jnp.abs(y)) * 1e-12
        return carry + dep.astype(carry.dtype), ()

    out, _ = jax.lax.scan(body, x, None, length=reps)
    return out


_CALL = [0]


def time_one(x, packed, scales, variant, bm, bn, bkh):
    def run(reps):
        best = float("inf")
        for _ in range(3):
            # unique input per call: the axon relay caches identical
            # executions, which silently turns repeats into RTT-only no-ops
            _CALL[0] += 1
            xi = x + jnp.bfloat16(_CALL[0] * 1e-6)
            t0 = time.time()
            np.asarray(loop(xi, packed, scales, variant, bm, bn, bkh, reps)[0, :8])
            best = min(best, time.time() - t0)
        return best

    run(REPS); run(4 * REPS)
    return max(run(4 * REPS) - run(REPS), 1e-9) / (3 * REPS)


def main():
    rng = np.random.default_rng(0)
    k = n = 4096
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    packed, scales = int4_pack_jnp(jnp.asarray(w))
    packed.block_until_ready()
    wbytes = packed.size + 2 * scales.size
    roof = wbytes / 819e9

    # correctness gate for the real candidates
    x16 = jnp.asarray(rng.standard_normal((16, k)), jnp.bfloat16)
    from exllamav3_tpu.ops.q_matmul import int4_matmul_ref

    ref = np.asarray(int4_matmul_ref(x16, packed, scales))
    for v in ("i32", "bitcast"):
        got = np.asarray(int4_mm(x16, packed, scales, variant=v))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"{v}: rel err {err:.5f}")

    for m in (16,):
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        for variant in ("i32", "bitcast"):
            for (bm, bn, bkh) in ((256, 512, 512), (256, 1024, 512),
                                  (256, 2048, 512), (256, 1024, 1024)):
                try:
                    dt = time_one(x, packed, scales, variant, bm, bn, bkh)
                except Exception as e:
                    print(f"m={m} {variant:15s} bn={bn:5d} bkh={bkh:5d}  FAIL "
                          f"{str(e).splitlines()[0][:60]}", flush=True)
                    continue
                print(f"m={m} {variant:15s} bn={bn:5d} bkh={bkh:5d} "
                      f"{dt*1e6:7.1f} us ({100*roof/dt:5.1f}% roof)", flush=True)


if __name__ == "__main__":
    main()
