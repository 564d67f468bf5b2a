#!/usr/bin/env python
"""Fractional-bpw quality sweep: convert a model at a range of bitrates and
measure KLD vs the dense reference at each point (the BASELINE metric-2
harness; reference doc/exl3.md's KLD-vs-bpw curves come from the same
loop over eval/qbench.py).

    python eval/bpw_sweep.py -m <dense_model_dir> -o <work_dir> \
        --bpw 2.0 2.5 3.0 3.5 4.0 5.0 [--rows 16 --length 256]

Prints one JSON line: {"metric": "kld_vs_bpw", "points": [[bpw, kld], ...]}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def kld_stats(p_logits: np.ndarray, q_logits: np.ndarray) -> dict:
    """Per-token KLD distribution stats (eval/qbench.py-style mean/median/
    p90 + confidence buckets: KLD split by the reference's top-1
    probability, reference eval/qbench.py:11-35)."""
    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    lp, lq = lsm(p_logits.astype(np.float64)), lsm(q_logits.astype(np.float64))
    per_tok = np.sum(np.exp(lp) * (lp - lq), axis=-1).reshape(-1)
    conf = np.exp(lp.max(-1)).reshape(-1)  # reference top-1 probability
    buckets = {}
    for name, lo, hi in (("low", 0.0, 0.5), ("mid", 0.5, 0.9),
                         ("high", 0.9, 1.01)):
        sel = (conf >= lo) & (conf < hi)
        buckets[name] = float(np.mean(per_tok[sel])) if sel.any() else None
    return {
        "mean": float(np.mean(per_tok)),
        "median": float(np.median(per_tok)),
        "p90": float(np.percentile(per_tok, 90)),
        "conf_buckets": buckets,
    }


def kld(p_logits: np.ndarray, q_logits: np.ndarray) -> float:
    return kld_stats(p_logits, q_logits)["mean"]


def sweep(src: str, work: str, bpws, rows=8, length=128, fast=True,
          seed=0, verbose=False):
    from exllamav3_tpu.conversion.convert_model import convert_model
    from exllamav3_tpu.model import Config, Model, InferParams

    dense = Model.from_config(Config.from_directory(src))
    dense.load()
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, dense.config.vocab_size,
                       size=(2, min(64, length))).astype(np.int32)
    ref = np.asarray(dense.forward_simple(ids))

    points = []
    stats = []
    for bpw in bpws:
        dst = os.path.join(work, f"bpw_{bpw:.2f}")
        convert_model(src, dst, bpw=bpw, head_bits=max(4, int(bpw)),
                      rows=rows, length=length, fast=fast, seed=seed,
                      verbose=verbose)
        q = Model.from_config(Config.from_directory(
            dst, infer_params=InferParams(linear_mode="reconstruct")))
        q.load()
        st = kld_stats(ref, np.asarray(q.forward_simple(ids)))
        points.append([float(bpw), st["mean"]])
        stats.append(dict(st, bpw=float(bpw)))
        if verbose:
            print(f" == bpw {bpw}: KLD mean {st['mean']:.5f} "
                  f"median {st['median']:.5f} p90 {st['p90']:.5f}")
        del q
    return points, stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_dir", required=True, help="dense source")
    p.add_argument("-o", "--work_dir", required=True)
    p.add_argument("--bpw", type=float, nargs="+",
                   default=[2.0, 2.5, 3.0, 3.5, 4.0, 5.0, 6.0])
    p.add_argument("--rows", type=int, default=16)
    p.add_argument("--length", type=int, default=256)
    p.add_argument("--full", action="store_true",
                   help="full quantizer (scale search on)")
    args = p.parse_args()
    pts, stats = sweep(args.model_dir, args.work_dir, args.bpw,
                       rows=args.rows, length=args.length,
                       fast=not args.full, verbose=True)
    print(json.dumps({"metric": "kld_vs_bpw", "points": pts, "stats": stats}))


if __name__ == "__main__":
    main()
