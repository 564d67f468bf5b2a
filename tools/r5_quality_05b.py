#!/usr/bin/env python
"""Round-5 quality run at >=0.5B geometry on TPU (VERDICT r4 item 2).

One TPU job that produces BOTH headline quality artifacts at real geometry
(BASELINE metric 2; reference doc/exl3.md:14-75 curves, eval/qbench.py
methodology):

  1. KLD-vs-bpw sweep: convert the 0.5b synthetic dense checkpoint
     (h1536/inter4096/L16, ~0.46B weights) at each bitrate and measure
     qbench-style KLD stats (mean/median/p90 + confidence buckets) of the
     reconstruct path vs the dense source.
  2. Runtime-mode ladder at 4.0 bpw: the same checkpoint served at each
     linear_mode (fused/reconstruct/int8/int6/int5/int4), KLD vs dense.

Emits one JSON line per completed point (resumable reporting: a driver
kill still leaves every measured point on disk) plus a final summary
line, all appended to --out (default /tmp/r5_quality_05b.jsonl).

    python tools/r5_quality_05b.py [--bpw 2.0 3.0 4.0 5.0 6.0] \
        [--work /tmp/r5q] [--rows 16] [--length 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def emit(path: str, obj: dict):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(path, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bpw", type=float, nargs="+",
                    default=[2.0, 3.0, 4.0, 5.0, 6.0])
    ap.add_argument("--modes", nargs="+",
                    default=["reconstruct", "fused", "int8", "int6",
                             "int5", "int4"])
    ap.add_argument("--mode_bpw", type=float, default=4.0)
    ap.add_argument("--work", default="/tmp/r5q")
    ap.add_argument("--rows", type=int, default=16)
    ap.add_argument("--length", type=int, default=256)
    ap.add_argument("--eval_rows", type=int, default=4)
    ap.add_argument("--eval_len", type=int, default=256)
    ap.add_argument("--out", default="/tmp/r5_quality_05b.jsonl")
    ap.add_argument("--size", default="0.5b",
                    help="geometry key from eval/convert_bench.SIZES "
                         "(tiny = CPU smoke)")
    args = ap.parse_args()

    from eval.bpw_sweep import kld_stats
    from eval.convert_bench import SIZES
    from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
    from exllamav3_tpu.conversion.convert_model import convert_model
    from exllamav3_tpu.model import Config, Model, InferParams
    import jax

    os.makedirs(args.work, exist_ok=True)
    src = os.path.join(args.work, "src")

    h, inter, L, nq, nkv, vocab = SIZES[args.size]
    cfg = dict(architectures=["LlamaForCausalLM"], bos_token_id=1,
               eos_token_id=2, vocab_size=vocab, hidden_size=h,
               intermediate_size=inter, max_position_embeddings=8192,
               num_attention_heads=nq, num_key_value_heads=nkv,
               num_hidden_layers=L, rms_norm_eps=1e-5, rope_theta=10000.0,
               torch_dtype="bfloat16", hidden_act="silu")
    if not os.path.exists(os.path.join(src, "config.json")):
        t0 = time.time()
        write_synth_dense_for_arch(src, cfg, seed=0)
        emit(args.out, {"event": "synth_written", "s": round(time.time() - t0, 1)})

    # dense reference logits, once
    dense = Model.from_config(Config.from_directory(src))
    dense.load()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, vocab,
                       size=(args.eval_rows, args.eval_len)).astype(np.int32)
    t0 = time.time()
    ref = np.asarray(dense.forward_simple(ids), dtype=np.float32)
    emit(args.out, {"event": "dense_ref", "s": round(time.time() - t0, 1),
                    "backend": jax.default_backend()})
    del dense

    n_weights = (L * (h * h + 2 * h * (nkv * (h // nq)) + h * h
                      + 3 * h * inter) + vocab * h)

    def measure(ckpt_dir, mode):
        q = Model.from_config(Config.from_directory(
            ckpt_dir, infer_params=InferParams(linear_mode=mode)))
        q.load()
        st = kld_stats(ref, np.asarray(q.forward_simple(ids),
                                       dtype=np.float32))
        del q
        return st

    points = []
    for bpw in args.bpw:
        dst = os.path.join(args.work, f"bpw_{bpw:.2f}")
        t0 = time.time()
        convert_model(src, dst, bpw=bpw, head_bits=max(4, int(bpw)),
                      rows=args.rows, length=args.length, fast=True,
                      seed=0, verbose=True)
        conv_s = time.time() - t0
        t0 = time.time()
        st = measure(dst, "reconstruct")
        emit(args.out, {
            "event": "bpw_point", "bpw": bpw, "kld": st,
            "convert_s": round(conv_s, 1),
            "mweights_per_s": round(n_weights / conv_s / 1e6, 3),
            "eval_s": round(time.time() - t0, 1)})
        points.append([bpw, st["mean"]])

    ladder = {}
    mode_dir = os.path.join(args.work, f"bpw_{args.mode_bpw:.2f}")
    if os.path.exists(mode_dir):
        for mode in args.modes:
            try:
                t0 = time.time()
                st = measure(mode_dir, mode)
                emit(args.out, {"event": "mode_point", "mode": mode,
                                "bpw": args.mode_bpw, "kld": st,
                                "eval_s": round(time.time() - t0, 1)})
                ladder[mode] = st["mean"]
            except Exception as e:  # keep the run alive per-mode
                emit(args.out, {"event": "mode_error", "mode": mode,
                                "error": repr(e)})

    emit(args.out, {
        "metric": "kld_vs_bpw_05b", "points": points, "mode_ladder": ladder,
        "geometry": {"hidden": h, "inter": inter, "layers": L,
                     "vocab": vocab, "quantized_weights": n_weights},
        "backend": jax.default_backend(),
    })


if __name__ == "__main__":
    main()
