#!/usr/bin/env python
"""Prototype: W4A8 decode via block-diagonal activation expansion.

Per k-block, the 16 per-group int8 dots collapse into ONE (ng*m, bkh) @
(bkh, bn) int8 MXU dot by expanding the activations block-diagonally
(row (g, mi) holds x[mi] masked to group g's columns). Group partials come
back separated by ROW, so the scale/bias fixup is (ng*m, bn) elementwise —
~2 lane-ops per OUTPUT element instead of per weight. Redundant MXU work is
ng*m/m = ng x, irrelevant at decode m.

    python tools/a8_diag_proto.py [m] [reps]
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

from exllamav3_tpu.ops.q_matmul import int4_pack_jnp, int4_matmul_ref


def _diag_kernel(xl_ref, xh_ref, b_ref, sl_ref, sh_ref, out_ref, acc_ref,
                 *, group: int, m: int, raw_dot: bool):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ng = sl_ref.shape[0]
    gm = ng * m
    xl = xl_ref[0]                                    # (gm, bkh) int8
    xh = xh_ref[0]
    xsum_lo = jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True)
    xsum_hi = jnp.sum(xh.astype(jnp.int32), axis=1, keepdims=True)
    if raw_dot:
        # stored byte = (hi+8)*16 + (lo+8) - 128 (top bit flipped). One dot
        # on the RAW bytes (zero unpack ops) + one extracted hi-plane dot;
        # the lo-plane dot falls out algebraically on the (gm, bn) outputs.
        b8 = b_ref[:]
        w32 = pltpu.bitcast(b8, jnp.int32)
        wh = pltpu.bitcast(((w32 ^ (-0x7F7F7F80)) >> 4) & 0x0F0F0F0F, jnp.int8)
        d_raw = jnp.dot(xl, b8, preferred_element_type=jnp.int32)
        d_hi_u = jnp.dot(xh, wh, preferred_element_type=jnp.int32)
        # d_raw used xl; the raw dot must use the SAME x rows as lo. hi uses
        # xh. d_lo_u = d_raw_lo - 16*d_hi_lo... raw encodes BOTH nibbles of
        # the byte: raw dot with xl gives 16*(xl@hi_u) + xl@lo_u - 128*xsum_lo
        d_hiu_xl = jnp.dot(xl, wh, preferred_element_type=jnp.int32)
        d_lo_u = d_raw - 16 * d_hiu_xl + 128 * xsum_lo
        d_lo = d_lo_u
        d_hi = d_hi_u
    else:
        w32 = pltpu.bitcast(b_ref[:], jnp.int32)
        wl = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)    # biased [0,15]
        wh = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
        d_lo = jnp.dot(xl, wl, preferred_element_type=jnp.int32)   # (gm, bn)
        d_hi = jnp.dot(xh, wh, preferred_element_type=jnp.int32)
    sl = sl_ref[:, 0, :].astype(jnp.float32)          # (ng, bn)
    sh = sh_ref[:, 0, :].astype(jnp.float32)
    fl = (d_lo - 8 * xsum_lo).astype(jnp.float32).reshape(ng, m, -1)
    fh = (d_hi - 8 * xsum_hi).astype(jnp.float32).reshape(ng, m, -1)
    acc_ref[:] += (jnp.sum(fl * sl[:, None, :], axis=0)
                   + jnp.sum(fh * sh[:, None, :], axis=0))

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("group", "block_n", "block_kh",
                                              "raw_dot"))
def int4_a8_diag(x_q, packed, scales, group: int = 32, block_n: int = 512,
                 block_kh: int = 512, raw_dot: bool = False):
    """x_q (m, k) int8 (m small, unpadded); packed (k/2, n) int8;
    scales (k/group, n) bf16 -> (m, n) f32 (missing x row scales)."""
    m, k = x_q.shape
    kh, n = packed.shape
    assert k == 2 * kh
    block_n = min(block_n, n)
    block_kh = min(block_kh, kh)
    ng = block_kh // group
    nkb = kh // block_kh
    gm = ng * m

    # block-diagonal expansion, per plane: (nkb, ng*m, bkh) where
    # row (g, mi) of block kk = x[mi, plane_off + kk*bkh + g*group : +group]
    def expand(xp):  # (m, kh) int8 -> (nkb, gm, bkh)
        xr = xp.reshape(m, nkb, ng, group)
        xr = jnp.transpose(xr, (1, 2, 0, 3))          # (nkb, ng, m, group)
        eye = jnp.eye(ng, dtype=jnp.int8)
        # place each (m, group) strip at its group's column offset
        out = jnp.einsum("kgmc,gh->kgmhc", xr, eye)   # (nkb, ng, m, ng, grp)
        return out.reshape(nkb, gm, block_kh)

    x_lo = expand(x_q[:, :kh])
    x_hi = expand(x_q[:, kh:])
    if raw_dot:
        packed = packed ^ np.int8(-128)  # flip top bit (stand-in for the pack change)
    grid = (1, n // block_n, nkb)
    kern = functools.partial(_diag_kernel, group=group, m=m, raw_dot=raw_dot)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, gm, block_kh), lambda i, j, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gm, block_kh), lambda i, j, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_kh, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1, block_n), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1, block_n),
                         lambda i, j, kk, _n=nkb: (kk + _n, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i, j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x_lo, x_hi, packed, scales[:, None, :], scales[:, None, :])


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    rng = np.random.default_rng(0)
    k = n = 4096
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    packed, scales = int4_pack_jnp(jnp.asarray(w))
    packed.block_until_ready()
    roof = (packed.size + 2 * scales.size) / 819e9

    # correctness vs ref on int8-quantized x (exact integer comparison path)
    xq = rng.integers(-127, 128, (m, k)).astype(np.int8)
    ref = np.asarray(int4_matmul_ref(
        jnp.asarray(xq.astype(np.float32)), packed, scales))
    for rd in (False, True):
        got = np.asarray(int4_a8_diag(jnp.asarray(xq), packed, scales,
                                      raw_dot=rd))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"m={m} diag raw={rd} rel err: {err:.5f}")

    @functools.partial(jax.jit, static_argnames=("reps", "rd"))
    def loop(xq, reps, rd=False):
        def body(c, _):
            y = int4_a8_diag(c, packed, scales, raw_dot=rd)
            return c ^ (jnp.max(y) * 0).astype(jnp.int8), y[0, 0]

        return jax.lax.scan(body, xq, None, length=reps)[1]

    serial = [0]

    def run(r, rd):
        best = float("inf")
        for _ in range(3):
            serial[0] += 1
            xi = jnp.asarray(xq ^ np.int8(serial[0] & 63))
            t0 = time.time()
            np.asarray(loop(xi, r, rd)[-8:])
            best = min(best, time.time() - t0)
        return best

    for rd in (False, True):
        run(reps, rd); run(4 * reps, rd)
        dt = max(run(4 * reps, rd) - run(reps, rd), 1e-9) / (3 * reps)
        print(f"m={m} diag raw={rd} {dt*1e6:7.1f} us ({100*roof/dt:5.1f}% "
              f"roof, roof {roof*1e6:.1f} us)")


def sweep():
    import itertools
    m = 1
    rng = np.random.default_rng(0)
    k = n = 4096
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    packed, scales = int4_pack_jnp(jnp.asarray(w))
    packed.block_until_ready()
    roof = (packed.size + 2 * scales.size) / 819e9
    xq = rng.integers(-127, 128, (m, k)).astype(np.int8)

    @functools.partial(jax.jit, static_argnames=("reps", "bn", "bkh"))
    def loop(xq, reps, bn, bkh):
        def body(c, _):
            y = int4_a8_diag(c, packed, scales, block_n=bn, block_kh=bkh)
            return c ^ (jnp.max(y) * 0).astype(jnp.int8), y[0, 0]
        return jax.lax.scan(body, xq, None, length=reps)[1]

    serial = [0]
    def time_one(bn, bkh, reps=500):
        def run(r):
            best = float("inf")
            for _ in range(3):
                serial[0] += 1
                xi = jnp.asarray(xq ^ np.int8(serial[0] & 63))
                t0 = time.time()
                np.asarray(loop(xi, r, bn, bkh)[-8:])
                best = min(best, time.time() - t0)
            return best
        run(reps); run(4 * reps)
        return max(run(4 * reps) - run(reps), 1e-9) / (3 * reps)

    for bn, bkh in ((512, 2048), (1024, 2048), (2048, 2048), (256, 2048)):
        try:
            dt = time_one(bn, bkh)
            print(f"bn={bn:5d} bkh={bkh:5d}: {dt*1e6:6.1f} us "
                  f"({100*roof/dt:5.1f}% roof)", flush=True)
        except Exception as e:
            print(f"bn={bn:5d} bkh={bkh:5d}: FAIL {str(e).splitlines()[0][:60]}",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep()
    else:
        main()
