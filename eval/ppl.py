#!/usr/bin/env python
"""Perplexity evaluation (feature reference: /root/reference/eval/ppl.py).

Computes token perplexity over a text file (or synthetic calibration rows
when no data is available), chunked at a fixed context length.

    python eval/ppl.py -m <model_dir> [-t <text_file>] [-l 2048] [-r 32]
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def evaluate_ppl(model, token_rows: np.ndarray, batch: int = 1) -> float:
    """token_rows: (R, L) int. Returns perplexity over positions 1..L-1."""
    import jax.numpy as jnp

    total_nll = 0.0
    total_tok = 0
    for i in range(0, token_rows.shape[0], batch):
        ids = token_rows[i : i + batch].astype(np.int32)
        logits = np.asarray(model.forward_simple(ids), dtype=np.float64)
        lg = logits[:, :-1]
        tgt = ids[:, 1:]
        lg = lg - lg.max(-1, keepdims=True)
        lse = np.log(np.exp(lg).sum(-1))
        tok_lp = np.take_along_axis(lg, tgt[..., None], axis=-1)[..., 0] - lse
        total_nll -= tok_lp.sum()
        total_tok += tok_lp.size
    return math.exp(total_nll / max(total_tok, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_dir", required=True)
    p.add_argument("-t", "--text", help="evaluation text file")
    p.add_argument("-l", "--length", type=int, default=2048)
    p.add_argument("-r", "--rows", type=int, default=32)
    p.add_argument("--linear_mode", default="auto")
    args = p.parse_args()

    from exllamav3_tpu.model import Config, Model, InferParams
    from exllamav3_tpu.tokenizer import Tokenizer
    from exllamav3_tpu.conversion.calibration import get_calibration

    config = Config.from_directory(
        args.model_dir, infer_params=InferParams(linear_mode=args.linear_mode)
    )
    model = Model.from_config(config)
    model.load()
    tokenizer = None
    try:
        tokenizer = Tokenizer(args.model_dir)
    except Exception:
        pass
    rows = get_calibration(
        tokenizer, rows=args.rows, length=args.length,
        text_files=[args.text] if args.text else None,
        vocab_size=config.vocab_size,
    )
    ppl = evaluate_ppl(model, rows)
    print(f"perplexity: {ppl:.4f}  ({args.rows} rows x {args.length} tokens)")


if __name__ == "__main__":
    main()
