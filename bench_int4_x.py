"""Probe: XLA-native int4 dequant matmul throughput on v5e.

X1: jnp.int4 weight array created INSIDE jit from packed int8 via
    bitcast_convert_type (int4 args crash the axon relay), converted to
    bf16, one fused dot, per-column scale.
X2: same but materializing the int4 array outside jit (may fail on axon).
X3: per-group scales via batched per-group dots (quality reference).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench_int4_v3 import scan_time


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    m, k, n = 16, 4096, 14336
    q = rng.integers(-8, 8, size=(k, n)).astype(np.int8)
    # pack pairs along k: byte r holds (k-row 2r) low nibble, (2r+1) high
    packed = ((q[0::2] & 15) | (q[1::2] << 4)).astype(np.int8)  # (k/2, n)
    packed_j = jnp.asarray(packed)
    c = jnp.asarray((rng.random(n).astype(np.float32) + 0.5) * 0.01)
    x0 = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32),
                     dtype=jnp.bfloat16)
    bytes_total = packed.nbytes

    wref = jnp.asarray(q.astype(np.float32)) * c[None, :]
    ref = np.asarray(jnp.dot(x0.astype(jnp.float32), wref))

    def unpack_bitcast(p):
        # (k/2, n) int8 -> (k/2, n, 2) int4 -> (k, n)
        w4 = jax.lax.bitcast_convert_type(p, jnp.int4)     # (k/2, n, 2)
        return w4.transpose(0, 2, 1).reshape(k, n)

    def x1(x):
        w = unpack_bitcast(packed_j).astype(jnp.bfloat16)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return y * c[None, :]

    got = np.asarray(jax.jit(x1)(x0))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"x1 bitcast-int4 dot: err={err:.1e}", flush=True)
    dt = scan_time(x1, x0)
    print(f"x1 bitcast-int4 dot: {dt*1e6:8.1f} us  "
          f"{bytes_total/dt/1e9:7.1f} GB/s", flush=True)

    # X1b: keep int8 container, unpack via shifts to int8 then bf16 (XLA)
    def x1b(x):
        pi = packed_j.astype(jnp.int32)
        lo = ((pi << 28) >> 28).astype(jnp.int8)
        hi = (pi >> 4).astype(jnp.int8)
        w = jnp.stack([lo, hi], axis=1).reshape(k, n).astype(jnp.bfloat16)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return y * c[None, :]

    got = np.asarray(jax.jit(x1b)(x0))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    dt = scan_time(x1b, x0)
    print(f"x1b shift-unpack dot: {dt*1e6:8.1f} us  "
          f"{bytes_total/dt/1e9:7.1f} GB/s  err={err:.1e}", flush=True)

    # X2: int4 array materialized outside jit
    try:
        w4o = unpack_bitcast(packed_j)
        w4o.block_until_ready()

        def x2(x):
            y = jnp.dot(x, w4o.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return y * c[None, :]

        got = np.asarray(jax.jit(x2)(x0))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        dt = scan_time(x2, x0)
        print(f"x2 resident-int4 dot: {dt*1e6:8.1f} us  "
              f"{bytes_total/dt/1e9:7.1f} GB/s  err={err:.1e}", flush=True)
    except Exception as e:
        print(f"x2 FAIL: {type(e).__name__}: {e}"[:200], flush=True)


if __name__ == "__main__":
    main()
