import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
from exllamav3_tpu.ops.q_matmul import int4_pack_jnp

def make(stage):
    def kern(xl_ref, b_ref, sl_ref, out_ref, acc_ref):
        kk = pl.program_id(2)
        if stage == "dotpar":
            xl = xl_ref[0]
            d = jnp.dot(xl, b_ref[:], preferred_element_type=jnp.int32)
            out_ref[:] = jnp.sum(d.astype(jnp.float32), axis=0,
                                 keepdims=True)[None]
            return
        @pl.when(kk == 0)
        def _(): acc_ref[:] = jnp.zeros_like(acc_ref)
        xl = xl_ref[0]                                 # (16, bkh) int8
        b8 = b_ref[:]
        if stage == "dotbf":
            d = jnp.dot(xl.astype(jnp.bfloat16), b8.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            acc_ref[:] += jnp.sum(d, axis=0, keepdims=True)
        elif stage == "convonly":
            wb = b8.astype(jnp.bfloat16)
            acc_ref[:] += jnp.sum(wb[:1].astype(jnp.float32), axis=0, keepdims=True)
        elif stage == "dot":
            d = jnp.dot(xl, b8, preferred_element_type=jnp.int32)
            acc_ref[:] += jnp.sum(d.astype(jnp.float32), axis=0, keepdims=True)
        elif stage == "dot2":
            w32 = pltpu.bitcast(b8, jnp.int32)
            wh = pltpu.bitcast(((w32 ^ (-0x7F7F7F80)) >> 4) & 0x0F0F0F0F, jnp.int8)
            d = jnp.dot(xl, b8, preferred_element_type=jnp.int32)
            d2 = jnp.dot(xl, wh, preferred_element_type=jnp.int32)
            acc_ref[:] += jnp.sum((d + d2).astype(jnp.float32), axis=0, keepdims=True)
        elif stage == "extract":
            w32 = pltpu.bitcast(b8, jnp.int32)
            wh = pltpu.bitcast(((w32 ^ (-0x7F7F7F80)) >> 4) & 0x0F0F0F0F, jnp.int8)
            acc_ref[:] += jnp.sum(wh.astype(jnp.float32)[:1], axis=0, keepdims=True)
        elif stage == "fix":
            d = jnp.dot(xl, b8, preferred_element_type=jnp.int32)
            sl = sl_ref[:, 0, :].astype(jnp.float32)
            f = d.astype(jnp.float32).reshape(16, 1, -1)
            acc_ref[:] += jnp.sum(f * sl[:, None, :], axis=0)
        @pl.when(kk == pl.num_programs(2) - 1)
        def _(): out_ref[:] = acc_ref[:]
    return kern

@functools.partial(jax.jit, static_argnames=("stage", "bn", "bkh"))
def call(xl, packed, scales3, stage, bn=512, bkh=512):
    kh, n = packed.shape
    nkb = kh // bkh
    ng = bkh // 32
    if stage == "dotpar":
        out = pl.pallas_call(make(stage),
            grid=(1, n // bn, nkb),
            in_specs=[
                pl.BlockSpec((1, 16, bkh), lambda i, j, kk: (kk, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bkh, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((ng, 1, bn), lambda i, j, kk: (kk, 0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, bn), lambda i, j, kk: (kk, 0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nkb, 1, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")))(xl, packed, scales3)
        return jnp.sum(out, axis=0)
    return pl.pallas_call(make(stage),
        grid=(1, n // bn, nkb),
        in_specs=[
            pl.BlockSpec((1, 16, bkh), lambda i, j, kk: (kk, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkh, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1, bn), lambda i, j, kk: (kk, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")))(xl, packed, scales3)

rng = np.random.default_rng(0)
k = n = 4096
kh = k // 2
w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
packed, scales = int4_pack_jnp(jnp.asarray(w))
packed.block_until_ready()
scales3 = jnp.asarray(scales)[:kh // 32, None, :]
roof = (packed.size) / 819e9
xl = jnp.asarray(rng.integers(-127, 128, (kh // 512, 16, 512)), jnp.int8)

@functools.partial(jax.jit, static_argnames=("stage", "reps"))
def loop(xl, stage, reps):
    def body(c, _):
        y = call(c, packed, scales3, stage)
        return c ^ (jnp.max(y) * 0).astype(jnp.int8), y[0, 0]
    return jax.lax.scan(body, xl, None, length=reps)[1]

serial = [0]
def time_one(stage, reps=500):
    def run(r):
        best = float("inf")
        for _ in range(3):
            serial[0] += 1
            xi = xl ^ jnp.int8(serial[0] & 63)
            t0 = time.time()
            np.asarray(loop(xi, stage, r)[-8:])
            best = min(best, time.time() - t0)
        return best
    run(reps); run(4 * reps)
    return max(run(4 * reps) - run(reps), 1e-9) / (3 * reps)

for stage in ("dotpar", "dot"):
    dt = time_one(stage)
    print(f"{stage:8s}: {dt*1e6:6.1f} us ({100*roof/dt:5.1f}% of b-bytes roof)", flush=True)
