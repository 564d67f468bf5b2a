#!/usr/bin/env python
"""Reproduce the h4096 LDLQ device-scan crash in isolation.

    python tools/ldlq_probe.py [--k 4096] [--n 14336] [--K 4]
Env: EXL3TPU_VITERBI_LEGACY=1, EXL3TPU_LDLQ_TILES=N to probe variants.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=14336)
    ap.add_argument("--K", type=int, default=4)
    ap.add_argument("--no_L", action="store_true")
    args = ap.parse_args()

    from exllamav3_tpu.quant.quantize import ldlq_device_np, block_ldl_np

    rng = np.random.default_rng(0)
    w = (rng.standard_normal((args.k, args.n)) * 0.02).astype(np.float32)
    L = None
    if not args.no_L:
        t0 = time.time()
        X = rng.standard_normal((args.k, 32)).astype(np.float32)
        H = (np.eye(args.k) + 0.01 * (X @ X.T) / 32).astype(np.float64)
        L = block_ldl_np(H).astype(np.float32)
        print(f"L built in {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    q, codes = ldlq_device_np(w, L, args.K,
                              progress=lambda i, n: print(f" chunk {i}/{n}",
                                                          flush=True))
    dt = time.time() - t0
    print(f"OK k={args.k} n={args.n} K={args.K}: {dt:.1f}s, "
          f"{args.k * args.n / dt / 1e6:.3f} Mw/s, "
          f"legacy={os.environ.get('EXL3TPU_VITERBI_LEGACY', '0')} "
          f"tiles={os.environ.get('EXL3TPU_LDLQ_TILES', 'default')}")


if __name__ == "__main__":
    main()
