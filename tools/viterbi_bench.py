#!/usr/bin/env python
"""Time the device Viterbi encoder (the conversion-speed driver).

    python tools/viterbi_bench.py [T] [K]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from exllamav3_tpu.quant.quantize import viterbi_quantize_tiles_jnp


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)

    def run(seed):
        tiles = jnp.asarray(rng.standard_normal((T, 256)).astype(np.float32))
        t0 = time.time()
        v, c = viterbi_quantize_tiles_jnp(tiles, K)
        np.asarray(v[:1, :8])
        return time.time() - t0

    run(0)  # compile
    best = min(run(i) for i in range(1, 4))
    print(f"T={T} K={K}: {best:.3f} s/dispatch, {best / T * 1e3:.2f} ms/tile")


if __name__ == "__main__":
    main()
