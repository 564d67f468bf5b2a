"""int4 kernel variant shootout, scan-difference timing (axon-proof).

Each measurement jits a lax.scan of N dependent kernel applications (the
output perturbs the next input, so no execution can be cached or elided)
and reports (T(N2) - T(N1)) / (N2 - N1).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_int4_v2 import kern_v1, kern_v1b, make_v2, make_v4, make_call, GS


def scan_time(call_fn, x0, n1=32, n2=512, reps=4):
    """call_fn: x (m, k) bf16 -> y (m, n) f32; returns seconds/call."""
    m, k = x0.shape

    def make(n):
        @jax.jit
        def run(x):
            def body(c, _):
                y = call_fn(c)
                c2 = (c + y[:, :k].astype(jnp.bfloat16) * jnp.bfloat16(1e-6))
                return c2, y[0, 0]
            c, ys = jax.lax.scan(body, x, None, length=n)
            return c, ys
        return run

    r1, r2 = make(n1), make(n2)
    best = []
    for ni, r in ((n1, r1), (n2, r2)):
        ts = []
        for rep in range(reps + 1):
            xv = x0 + jnp.bfloat16(rep * 1e-3)
            t0 = time.perf_counter()
            c, ys = r(xv)
            np.asarray(jax.device_get(ys))
            ts.append(time.perf_counter() - t0)
        best.append(min(ts[1:]))  # drop compile run
    return (best[1] - best[0]) / (n2 - n1)


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
    x0 = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32),
                     dtype=jnp.bfloat16)
    ref = np.asarray(int4_matmul_ref(x0, packed, scales))

    def emat(bkh):
        ng = bkh // GS
        E = np.zeros((bkh, ng), np.float32)
        for p in range(bkh):
            E[p, p // GS] = 1.0
        return jnp.asarray(E)

    for name, bkh, bn in (("v1", 512, 1024), ("v1b", 512, 1024),
                          ("v2", 512, 1024), ("v4", 512, 1024),
                          ("v1b", 512, 2048), ("v2", 512, 2048)):
        ng = bkh // GS
        try:
            if name in ("v1", "v1b"):
                kern = {"v1": kern_v1, "v1b": kern_v1b}[name]
                espec = [pl.BlockSpec((bkh, ng), lambda i, j, kk: (0, 0),
                                      memory_space=pltpu.VMEM)]
                call = make_call(kern, m, kh, n, bkh, bn, ng, espec)
                em = emat(bkh)
                f = lambda x, c=call, e=em: c(x, x, packed, scales, scales, e)
            elif name == "v2":
                call = make_call(make_v2(ng), m, kh, n, bkh, bn, ng)
                f = lambda x, c=call: c(x, x, packed, scales, scales)
            else:  # v4
                call = make_call(make_v4(ng), m, kh, n, bkh, bn, ng)

                def f(x, c=call):
                    ax = jnp.max(jnp.abs(x.astype(jnp.float32)),
                                 axis=1, keepdims=True) + 1e-9
                    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 127 / ax),
                                  -127, 127).astype(jnp.int8)
                    return c(xq, xq, packed, scales, scales) * (ax / 127)
            got = np.asarray(jax.jit(f)(x0))
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            dt = scan_time(f, x0)
            gbs = bytes_total / dt / 1e9
            print(f"{name:4s} bkh={bkh:5d} bn={bn:5d}: {dt*1e6:8.1f} us  "
                  f"{gbs:7.1f} GB/s  err={err:.1e}", flush=True)
        except Exception as e:
            print(f"{name} bkh={bkh} bn={bn}: FAIL {type(e).__name__}: "
                  f"{e}"[:200], flush=True)

    # anchors at the same geometry: bf16 dense matmul (4x the bytes) and
    # int8 dequant matmul (2x the bytes) through XLA
    wb = jnp.asarray(w, dtype=jnp.bfloat16)
    f_bf16 = lambda x: jnp.dot(x, wb, preferred_element_type=jnp.float32)
    dt = scan_time(f_bf16, x0)
    print(f"bf16 dense anchor: {dt*1e6:8.1f} us  {wb.nbytes/dt/1e9:7.1f} GB/s",
          flush=True)
    w8 = jnp.clip(jnp.round(jnp.asarray(w) / 0.001), -127, 127).astype(jnp.int8)
    sc8 = jnp.full((n,), 0.001, jnp.float32)
    from exllamav3_tpu.ops.q_matmul import int8_matmul_ref
    f_i8 = lambda x: int8_matmul_ref(x, w8, sc8)
    dt = scan_time(f_i8, x0)
    print(f"int8 XLA anchor:   {dt*1e6:8.1f} us  {w8.nbytes/dt/1e9:7.1f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
