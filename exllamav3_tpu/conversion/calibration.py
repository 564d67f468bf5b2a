"""Calibration data for quantization.

Feature reference: /root/reference/exllamav3/conversion/calibration_data.py
(bundled corpus mix). This environment has no egress, so the default
calibration synthesizes a mixed distribution from the model's own tokenizer
(natural-ish token frequencies + random spans); real deployments should pass
`--cal_text` files or token arrays.
"""
from __future__ import annotations

import os

import numpy as np


def get_calibration(
    tokenizer=None,
    rows: int = 100,
    length: int = 2048,
    text_files: list | None = None,
    vocab_size: int | None = None,
    seed: int = 0,
) -> np.ndarray:
    """Returns (rows, length) int64 token ids."""
    rng = np.random.default_rng(seed)
    chunks: list[np.ndarray] = []

    if text_files:
        for path in text_files:
            with open(path, "r", errors="ignore") as f:
                text = f.read()
            ids = tokenizer.encode(text).reshape(-1)
            for i in range(0, len(ids) - length, length):
                chunks.append(ids[i : i + length])

    need = rows - len(chunks)
    if need > 0:
        v = vocab_size or (tokenizer.vocab_size if tokenizer else 32000)
        for i in range(need):
            if i % 5 == 0:
                # uniform random rows (reference includes random rows too)
                chunks.append(rng.integers(0, v, size=length))
            else:
                # zipfian-ish draws approximate natural token frequency
                r = rng.zipf(1.3, size=length * 2)
                r = r[r < v][:length]
                while r.size < length:
                    r = np.concatenate([r, rng.integers(0, v, size=length - r.size)])
                chunks.append(r[:length])
    out = np.stack(chunks[:rows]).astype(np.int64)
    return out
