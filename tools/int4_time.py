#!/usr/bin/env python
"""Quick honest timing of the production int4 kernels at decode shape.

    python tools/int4_time.py [m] [reps]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exllamav3_tpu.ops.q_matmul import (int4_matmul_a8, int4_matmul_pallas,
                                        int4_matmul, int4_pack_jnp,
                                        int4_matmul_ref)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    rng = np.random.default_rng(0)
    k = n = 4096
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    packed, scales = int4_pack_jnp(jnp.asarray(w))
    packed.block_until_ready()
    roof = (packed.size + 2 * scales.size) / 819e9

    x16 = jnp.asarray(rng.standard_normal((16, k)), jnp.bfloat16)
    ref = np.asarray(int4_matmul_ref(x16, packed, scales))
    for name, f in (("bf16", lambda xx: int4_matmul_pallas(xx, packed, scales)),
                    ("a8", lambda xx: int4_matmul_a8(xx, packed, scales))):
        got = np.asarray(f(x16))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"{name}: rel err {err:.5f}")

    @functools.partial(jax.jit, static_argnames=("which", "reps"))
    def loop(x, which, reps):
        def body(c, _):
            if which == "bf16":
                y = int4_matmul(c, packed, scales, use_pallas=True)
            else:
                y = int4_matmul_a8(c, packed, scales)
            return c + (jnp.max(jnp.abs(y)) * 1e-12).astype(c.dtype), ()

        return jax.lax.scan(body, x, None, length=reps)[0]

    serial = [0]

    def time_one(which):
        def run(r):
            best = float("inf")
            for _ in range(3):
                serial[0] += 1
                xi = jnp.asarray(
                    rng.standard_normal((m, k)) + serial[0] * 1e-6, jnp.bfloat16)
                t0 = time.time()
                np.asarray(loop(xi, which, r)[0, :8])
                best = min(best, time.time() - t0)
            return best

        run(reps); run(4 * reps)
        return max(run(4 * reps) - run(reps), 1e-9) / (3 * reps)

    for which in ("bf16", "a8"):
        dt = time_one(which)
        print(f"m={m} {which:5s} {dt*1e6:7.1f} us ({100*roof/dt:5.1f}% roof, "
              f"roof {roof*1e6:.1f} us)", flush=True)


if __name__ == "__main__":
    main()
