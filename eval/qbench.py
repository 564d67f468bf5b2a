#!/usr/bin/env python
"""qbench: quantization-comparison harness driven by a YAML project file.

Feature reference: /root/reference/eval/qbench.py (reference-group logits
cached to disk once; every candidate streams the same test rows and reports
KLD vs the cache as mean/median/p90 plus buckets by reference confidence;
the reference rerun with bf16-rounding noise gives the self-noise floor).

Project YAML:

    test_rows: 16           # rows of test data
    row_length: 512         # tokens per row
    data: <text file>       # optional; synthetic rows when absent
    cache_dir: ./qcache
    models:
      - { name: ref,  model_dir: /path/a, reference: true }
      - { name: cand, model_dir: /path/b, linear_mode: int8 }

Usage: python eval/qbench.py project.yml [--noise_floor]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONF_BUCKETS = [(0.0, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 0.9), (0.9, 1.0)]


def get_test_rows(project: dict, tokenizer=None) -> np.ndarray:
    rows = int(project.get("test_rows", 8))
    length = int(project.get("row_length", 512))
    data = project.get("data")
    if data and tokenizer is not None:
        with open(data) as f:
            text = f.read()
        ids = tokenizer.encode(text).reshape(-1)
        n = min(rows, max(1, len(ids) // length))
        return np.stack([ids[i * length:(i + 1) * length] for i in range(n)])
    vocab = int(project.get("vocab_size", 32000))
    rng = np.random.default_rng(int(project.get("seed", 0)))
    return rng.integers(0, vocab, size=(rows, length)).astype(np.int64)


def sha_key(*parts) -> str:
    return hashlib.sha256(json.dumps(parts, sort_keys=True, default=str)
                          .encode()).hexdigest()[:24]


def forward_rows(model, rows: np.ndarray, noise_eps: float = 0.0):
    """Yield (row_logits (L, V) f32) per row."""
    for r in range(rows.shape[0]):
        ids = rows[r : r + 1].astype(np.int32)
        logits = np.asarray(model.forward_simple(ids), dtype=np.float32)[0]
        if noise_eps:
            rng = np.random.default_rng(r)
            logits = logits * (1.0 + rng.standard_normal(logits.shape)
                               .astype(np.float32) * noise_eps)
        yield logits


def kld_stats(ref_logits: list, cand_logits: list) -> dict:
    """Per-token KLD(ref || cand) with confidence buckets."""
    klds = []
    confs = []
    for lr, lc in zip(ref_logits, cand_logits):
        lr64 = lr.astype(np.float64)
        lc64 = lc.astype(np.float64)
        lr64 -= lr64.max(-1, keepdims=True)
        lc64 -= lc64.max(-1, keepdims=True)
        pr = np.exp(lr64)
        pr /= pr.sum(-1, keepdims=True)
        log_pr = np.log(pr + 1e-30)
        log_pc = lc64 - np.log(np.exp(lc64).sum(-1, keepdims=True))
        klds.append(np.sum(pr * (log_pr - log_pc), axis=-1))
        confs.append(pr.max(-1))
    kld = np.concatenate(klds)
    conf = np.concatenate(confs)
    out = {
        "mean": float(kld.mean()),
        "median": float(np.median(kld)),
        "p90": float(np.percentile(kld, 90)),
        "tokens": int(kld.size),
        "buckets": {},
    }
    for lo, hi in CONF_BUCKETS:
        sel = (conf >= lo) & (conf < hi)
        if sel.any():
            out["buckets"][f"{lo:.2f}-{hi:.2f}"] = {
                "mean": float(kld[sel].mean()),
                "median": float(np.median(kld[sel])),
                "tokens": int(sel.sum()),
            }
    return out


def load_model(entry: dict):
    from exllamav3_tpu.model import Config, Model, InferParams

    ip = InferParams(linear_mode=entry.get("linear_mode", "auto"))
    model = Model.from_config(Config.from_directory(entry["model_dir"],
                                                    infer_params=ip))
    model.load()
    return model


def run_project(project: dict, noise_floor: bool = False,
                base_dir: str = ".") -> dict:
    cache_dir = os.path.join(base_dir, project.get("cache_dir", "qcache"))
    os.makedirs(cache_dir, exist_ok=True)
    rows = get_test_rows(project)
    rows_key = sha_key(project.get("test_rows"), project.get("row_length"),
                       project.get("seed", 0), project.get("data"))

    models = project["models"]
    ref_entry = next(m for m in models if m.get("reference"))
    ref_cache = os.path.join(cache_dir, f"ref_{rows_key}_"
                             f"{sha_key(ref_entry)}.npz")
    if os.path.exists(ref_cache):
        ref_logits = list(np.load(ref_cache).values())
    else:
        model = load_model(ref_entry)
        ref_logits = list(forward_rows(model, rows))
        np.savez(ref_cache, *ref_logits)
        model.unload()

    results = {}
    if noise_floor:
        model = load_model(ref_entry)
        noisy = list(forward_rows(model, rows, noise_eps=2 ** -8))
        results["__noise_floor__"] = kld_stats(ref_logits, noisy)
        model.unload()

    for entry in models:
        if entry.get("reference"):
            continue
        rkey = os.path.join(cache_dir,
                            f"res_{rows_key}_{sha_key(ref_entry, entry)}.json")
        if os.path.exists(rkey):
            with open(rkey) as f:
                results[entry["name"]] = json.load(f)
            continue
        model = load_model(entry)
        cand = list(forward_rows(model, rows))
        stats = kld_stats(ref_logits, cand)
        results[entry["name"]] = stats
        with open(rkey, "w") as f:
            json.dump(stats, f, indent=2)
        model.unload()
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("project", help="YAML project file")
    p.add_argument("--noise_floor", action="store_true",
                   help="also measure the reference self-noise floor")
    args = p.parse_args()
    import yaml

    with open(args.project) as f:
        project = yaml.safe_load(f)
    results = run_project(project, noise_floor=args.noise_floor,
                          base_dir=os.path.dirname(os.path.abspath(args.project)))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
