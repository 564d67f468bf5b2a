#!/usr/bin/env python
"""Runtime-representation picker: load one EXL3 checkpoint in several
linear modes, print the bytes/weight footprint of each, time a short
greedy generation, and report per-mode KLD against the golden
(reconstruct) logits.

The reference serves every bit-width from one fused CUDA kernel at
memory-bound speed; on TPU the trellis decode is VPU-bound, so the runtime
instead exposes a byte-width/quality Pareto (doc/performance.md):

    fused   0.5 B/w   capacity mode (bit-exact, VPU-bound)
    int4    0.56 B/w  format-byte serving (use convert.py --serving_bits 4)
    int5    0.69 B/w  balanced
    int6    0.81 B/w  near-lossless
    int8    1.0 B/w   fidelity serving (default)
    bf16    2.0 B/w   small models

    python examples/serving_modes.py -m <exl3_dir> [--modes int8,int6,int4]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_dir", required=True)
    p.add_argument("--modes", default="reconstruct,int8,int6,int5,int4")
    p.add_argument("--tokens", type=int, default=32)
    p.add_argument("--rows", type=int, default=2)
    p.add_argument("--length", type=int, default=256)
    args = p.parse_args()

    import jax.numpy as jnp

    from exllamav3_tpu.model import Config, Model, InferParams

    def lsm(z):
        z = z - z.max(-1, keepdims=True)
        return z - np.log(np.exp(z).sum(-1, keepdims=True))

    golden = None
    rng = np.random.default_rng(0)
    rows = None
    print(f"{'mode':>12} {'weights':>10} {'B/weight':>9} {'load_s':>7} "
          f"{'fwd_ms':>8} {'KLD vs golden':>14}")
    for mode in args.modes.split(","):
        mode = mode.strip()
        t0 = time.time()
        model = Model.from_config(Config.from_directory(
            args.model_dir, infer_params=InferParams(linear_mode=mode)))
        model.load()
        load_s = time.time() - t0
        wb = sum(a.size * a.dtype.itemsize
                 for g in model.params.values() for a in g.values())
        nw = sum(lin.in_features * lin.out_features
                 for lin in model.root.walk()
                 if hasattr(lin, "in_features"))
        if rows is None:
            rows = rng.integers(
                0, model.config.vocab_size,
                size=(args.rows, args.length)).astype(np.int32)
        t0 = time.time()
        logits = np.asarray(model.forward_simple(jnp.asarray(rows)),
                            dtype=np.float64)
        fwd_ms = (time.time() - t0) * 1e3
        if golden is None:
            golden = logits
            kld = 0.0
        else:
            lg, lq = lsm(golden), lsm(logits)
            kld = float(np.mean(np.sum(np.exp(lg) * (lg - lq), -1)))
        print(f"{mode:>12} {wb/1e6:>9.1f}M {wb/max(nw,1):>9.3f} "
              f"{load_s:>7.1f} {fwd_ms:>8.1f} {kld:>14.6f}")
        del model


if __name__ == "__main__":
    main()
