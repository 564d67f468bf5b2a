#!/usr/bin/env python
"""Conversion wall-clock benchmark (BASELINE anchor: the reference quantizes
"an 8B model in minutes to hours" on one GPU — /root/reference/README.md:172).

Writes a synthetic dense checkpoint at a named geometry, times
convert_model end-to-end (capture -> regularize -> LDLQ + device-sharded
Viterbi -> pack -> compile), and prints one JSON line with the wall-clock
and the per-weight rate so runs at different sizes compare directly.

    python eval/convert_bench.py --size 0.1b [--bpw 4.0] [--layers N]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # the axon sitecustomize pins jax_platforms at import; honor an explicit
    # JAX_PLATFORMS=cpu request (CPU validation runs)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

SIZES = {
    # name: (hidden, inter, layers, heads, kv_heads, vocab)
    "tiny": (256, 512, 2, 4, 2, 2048),
    "0.1b": (768, 2048, 12, 12, 4, 8192),
    "0.5b": (1536, 4096, 16, 12, 4, 16384),
    "1b": (2048, 5504, 16, 16, 4, 32768),
    "8b": (4096, 14336, 32, 32, 8, 32768),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="0.1b", choices=sorted(SIZES))
    ap.add_argument("--bpw", type=float, default=4.0)
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (scale wall-clock linearly)")
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--length", type=int, default=256)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    h, inter, L, nq, nkv, vocab = SIZES[args.size]
    if args.layers:
        L = args.layers
    cfg = dict(architectures=["LlamaForCausalLM"], bos_token_id=1,
               eos_token_id=2, vocab_size=vocab, hidden_size=h,
               intermediate_size=inter, max_position_embeddings=8192,
               num_attention_heads=nq, num_key_value_heads=nkv,
               num_hidden_layers=L, rms_norm_eps=1e-5, rope_theta=10000.0,
               torch_dtype="bfloat16", hidden_act="silu")

    from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
    from exllamav3_tpu.conversion.convert_model import convert_model

    work = tempfile.mkdtemp(prefix="exl3_convbench_")
    src = os.path.join(work, "src")
    dst = os.path.join(work, "out")
    t0 = time.time()
    write_synth_dense_for_arch(src, cfg, seed=0)
    t_synth = time.time() - t0

    t0 = time.time()
    convert_model(src, dst, bpw=args.bpw, head_bits=max(4, int(args.bpw)),
                  rows=args.rows, length=args.length, fast=True, seed=0,
                  verbose=True)
    t_conv = time.time() - t0

    # quantized-linear weights only (what the Viterbi actually encodes)
    wq = L * (h * h + 2 * h * (nkv * (h // nq)) + h * h + 3 * h * inter) \
        + vocab * h
    import jax

    print(json.dumps({
        "metric": "convert_wall_s",
        "value": round(t_conv, 1),
        "unit": "s",
        "detail": {
            "size": args.size, "bpw": args.bpw, "layers": L,
            "weights_quantized": wq,
            "mweights_per_s": round(wq / t_conv / 1e6, 3),
            "synth_write_s": round(t_synth, 1),
            "backend": jax.default_backend(),
            "devices": jax.device_count(),
        },
    }))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
