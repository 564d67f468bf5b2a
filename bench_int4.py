"""Microbench: packed-int4 matmul kernel variants on the real TPU.

Times the int4 Pallas kernel at 8B-ish layer geometry against the pure-HBM
roofline for 0.5 byte/weight, plus a native jnp.int4-storage probe (does
Mosaic lower int4 loads + converts?). Axon-tunnel timing rules: vary inputs
between calls (the relay caches identical executions), sync via np.asarray
of a slice, time with call-count differences.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, xs, iters=24):
    fn(xs[0]).block_until_ready()
    np.asarray(jax.device_get(fn(xs[1])[0, :8]))  # real sync
    t0 = time.perf_counter()
    outs = [fn(xs[2 + (i % (len(xs) - 2))]) for i in range(iters)]
    np.asarray(jax.device_get(outs[-1][0, :8]))
    t1 = time.perf_counter()
    # subtract a 1-iter run to cancel dispatch overhead
    t2 = time.perf_counter()
    o = fn(xs[2])
    np.asarray(jax.device_get(o[0, :8]))
    t3 = time.perf_counter()
    return ((t1 - t0) - (t3 - t2)) / (iters - 1)


def main():
    print("start", flush=True)
    from exllamav3_tpu.ops.q_matmul import (
        int4_pack_jnp, int4_matmul_pallas, int4_matmul_ref)

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    m, k, n = 16, 4096, 14336
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    packed, scales = int4_pack_jnp(jnp.asarray(w))
    packed.block_until_ready()
    bytes_total = packed.nbytes + scales.nbytes
    xs = [jnp.asarray(rng.standard_normal((m, k)).astype(np.float32),
                      dtype=jnp.bfloat16) for _ in range(6)]

    # correctness vs ref first
    got = np.asarray(int4_matmul_pallas(xs[0], packed, scales))
    ref = np.asarray(int4_matmul_ref(xs[0], packed, scales))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"kernel vs ref rel err: {err:.2e}")

    for bkh, bn in ((512, 512), (512, 1024), (1024, 512), (256, 512),
                    (2048, 512), (1024, 1024), (2048, 1024), (2048, 2048)):
        try:
            f = jax.jit(lambda x, b=bn, bk=bkh: int4_matmul_pallas(
                x, packed, scales, block_n=b, block_kh=bk))
            dt = timed(f, xs)
            gbs = bytes_total / dt / 1e9
            print(f"bkh={bkh:5d} bn={bn:5d}: {dt*1e6:8.1f} us  "
                  f"{gbs:7.1f} GB/s")
        except Exception as e:
            print(f"bkh={bkh} bn={bn}: FAIL {type(e).__name__}: {e}"[:200])
        sys.stdout.flush()

    # HBM read roofline anchor: same bytes as a plain int8 copy-reduce
    big = jnp.asarray(
        rng.integers(-100, 100, size=(bytes_total // 2048, 2048)),
        dtype=jnp.int8)

    @jax.jit
    def reduce_pass(x, s):
        return jnp.sum((big + s).astype(jnp.int32) * x[0, 0].astype(jnp.int32),
                       axis=0, keepdims=True).astype(jnp.float32)

    f = lambda x: reduce_pass(x, jnp.int8(0))
    f2s = [lambda x, i=i: reduce_pass(x, jnp.int8(i)) for i in range(6)]
    # vary the added scalar so the relay cannot cache
    dt = timed(lambda x: f2s[int(np.random.randint(6))](x), xs)
    print(f"int8 stream-reduce anchor ({big.nbytes/1e6:.0f} MB): "
          f"{dt*1e6:.1f} us  {big.nbytes/dt/1e9:.1f} GB/s")

    # native int4 storage probe
    try:
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        w4 = jnp.asarray(np.clip(rng.integers(-8, 8, size=(512, 512)), -8, 7),
                         dtype=jnp.int4)

        def _probe_kernel(w_ref, o_ref):
            o_ref[:] = w_ref[:].astype(jnp.bfloat16) * 2.0

        probe = pl.pallas_call(
            _probe_kernel,
            in_specs=[pl.BlockSpec((512, 512), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((512, 512), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((512, 512), jnp.bfloat16),
        )
        out = np.asarray(probe(w4))
        ok = np.allclose(out, np.asarray(w4, dtype=np.float32) * 2.0)
        print(f"native int4 VMEM load+convert: WORKS exact={ok}")
    except Exception as e:
        print(f"native int4 VMEM load: FAIL {type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
