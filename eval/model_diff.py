#!/usr/bin/env python
"""Per-token KL divergence between two models (feature reference:
/root/reference/eval/model_diff.py:173-295 and eval/qbench.py KLD harness).

Compares a quantized model against its full-precision source (or any two
models sharing a tokenizer), reporting mean/median/p90 per-token KLD and
top-1 agreement. The BASELINE quality metric ("KLD vs FP16 at bpw").

    python eval/model_diff.py -ma <model_a> -mb <model_b> [-r 16] [-l 1024]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax

    # the axon sitecustomize pins jax_platforms at import; honor an explicit
    # JAX_PLATFORMS=cpu request (CPU validation runs)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def token_kld(logits_p: np.ndarray, logits_q: np.ndarray) -> np.ndarray:
    """Per-token KL(P||Q); logits (..., V) -> (...)."""
    lp = logits_p.astype(np.float64)
    lq = logits_q.astype(np.float64)
    lp = lp - lp.max(-1, keepdims=True)
    lq = lq - lq.max(-1, keepdims=True)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    lq = lq - np.log(np.exp(lq).sum(-1, keepdims=True))
    return np.sum(np.exp(lp) * (lp - lq), axis=-1)


def forward_quant_cache(model, ids: np.ndarray, k_bits: int, v_bits: int,
                        compand_a: float = 0.65, chunk: int = 128):
    """Full-row logits through a QUANTIZED linear cache: chunked prefill so
    every position's keys/values round-trip the packed representation (the
    reference's cache-quant sweep, model_diff.py:372)."""
    import jax.numpy as jnp
    from exllamav3_tpu.model import Cache, CacheSpec

    B, S = ids.shape
    cache = Cache(model, CacheSpec(
        layout="linear", batch_size=B, max_len=S + (-S) % 256,
        k_bits=k_bits, v_bits=v_bits, compand_a=compand_a))
    step = model.jitted_step("dense", donate_cache=False, k_bits=k_bits,
                             v_bits=v_bits, compand_a=compand_a)
    outs = []
    for s0 in range(0, S, chunk):
        cids = ids[:, s0 : s0 + chunk].astype(np.int32)
        pos = np.broadcast_to(
            np.arange(s0, s0 + cids.shape[1], dtype=np.int32), cids.shape)
        logits, cache.state = step(
            model.params, jnp.asarray(cids), cache.state,
            jnp.asarray(np.ascontiguousarray(pos)),
            jnp.full(B, s0, np.int32), None)
        outs.append(np.asarray(logits, dtype=np.float32))
    return np.concatenate(outs, axis=1)


def compare_cache_bits(model_a, model_b, token_rows: np.ndarray,
                       bits_list, compand_a: float = 0.65) -> dict:
    """KLD of model_b served with a 2-8-bit quantized cache against
    model_a's full-precision-cache logits, per bit width."""
    out = {}
    for bits in bits_list:
        klds, agree = [], []
        for i in range(token_rows.shape[0]):
            ids = token_rows[i : i + 1].astype(np.int32)
            la = np.asarray(model_a.forward_simple(ids))
            lb = forward_quant_cache(model_b, ids, bits, bits, compand_a)
            klds.append(token_kld(la, lb).reshape(-1))
            agree.append((la.argmax(-1) == lb.argmax(-1)).reshape(-1))
        k = np.concatenate(klds)
        out[bits] = {
            "kld_mean": float(np.mean(k)),
            "kld_p90": float(np.percentile(k, 90)),
            "top1_agreement": float(np.mean(np.concatenate(agree))),
        }
    return out


def compare_models(model_a, model_b, token_rows: np.ndarray) -> dict:
    klds = []
    agree = []
    for i in range(token_rows.shape[0]):
        ids = token_rows[i : i + 1].astype(np.int32)
        la = np.asarray(model_a.forward_simple(ids))
        lb = np.asarray(model_b.forward_simple(ids))
        klds.append(token_kld(la, lb).reshape(-1))
        agree.append((la.argmax(-1) == lb.argmax(-1)).reshape(-1))
    k = np.concatenate(klds)
    a = np.concatenate(agree)
    return {
        "kld_mean": float(np.mean(k)),
        "kld_median": float(np.median(k)),
        "kld_p90": float(np.percentile(k, 90)),
        "kld_p99": float(np.percentile(k, 99)),
        "top1_agreement": float(np.mean(a)),
        "tokens": int(k.size),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-ma", "--model_a", required=True, help="reference model dir")
    p.add_argument("-mb", "--model_b", required=True, help="comparison model dir")
    p.add_argument("-r", "--rows", type=int, default=16)
    p.add_argument("-l", "--length", type=int, default=1024)
    p.add_argument("-t", "--text", help="evaluation text file")
    p.add_argument("--mode_a", default="auto",
                   help="runtime linear_mode for model A (reconstruct/bf16/"
                        "int8/int4/int3/int5/int6/fused)")
    p.add_argument("--mode_b", default="auto",
                   help="runtime linear_mode for model B — e.g. measure the "
                        "int4 requant KLD cost against --mode_b reconstruct "
                        "on the same checkpoint")
    p.add_argument("--cache_bits", type=int, nargs="*",
                   help="also sweep model B with a quantized KV cache at "
                        "these bit widths (reference cache-quant sweep)")
    p.add_argument("--cache_compand", type=float, default=0.65)
    args = p.parse_args()

    from exllamav3_tpu.model import Config, Model, InferParams
    from exllamav3_tpu.tokenizer import Tokenizer
    from exllamav3_tpu.conversion.calibration import get_calibration

    def load(d, mode):
        m = Model.from_config(Config.from_directory(
            d, infer_params=InferParams(linear_mode=mode)))
        m.load()
        return m

    ma = load(args.model_a, args.mode_a)
    mb = load(args.model_b, args.mode_b)
    tokenizer = None
    try:
        tokenizer = Tokenizer(args.model_a)
    except Exception:
        pass
    rows = get_calibration(tokenizer, rows=args.rows, length=args.length,
                           text_files=[args.text] if args.text else None,
                           vocab_size=ma.config.vocab_size)
    stats = compare_models(ma, mb, rows)
    for k, v in stats.items():
        print(f"{k}: {v:.6f}" if isinstance(v, float) else f"{k}: {v}")
    if args.cache_bits:
        sweep = compare_cache_bits(ma, mb, rows, args.cache_bits,
                                   args.cache_compand)
        for bits, st in sweep.items():
            line = " ".join(f"{k}={v:.6f}" for k, v in st.items())
            print(f"cache_bits={bits}: {line}")


if __name__ == "__main__":
    main()
