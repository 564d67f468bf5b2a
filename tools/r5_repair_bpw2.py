#!/usr/bin/env python
"""Repair the r5 0.5b bpw-2.0 checkpoint (corrupt layer-9 suh/svh from a
pre-atomic-write interrupted save) by resuming conversion with the
corrupt-shard validation in place, then re-measure its KLD point."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/root/r5q"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/doc/r5_quality_05b.jsonl"
    src = os.path.join(work, "src")
    dst = os.path.join(work, "bpw_2.00")

    from eval.bpw_sweep import kld_stats
    from exllamav3_tpu.conversion.convert_model import convert_model
    from exllamav3_tpu.model import Config, Model, InferParams

    t0 = time.time()
    convert_model(src, dst, bpw=2.0, head_bits=4, rows=16, length=256,
                  fast=True, seed=0, verbose=True, resume=True)
    repair_s = time.time() - t0

    dense = Model.from_config(Config.from_directory(src))
    dense.load()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, dense.config.vocab_size,
                       size=(4, 256)).astype(np.int32)
    ref = np.asarray(dense.forward_simple(ids), dtype=np.float32)
    del dense
    q = Model.from_config(Config.from_directory(
        dst, infer_params=InferParams(linear_mode="reconstruct")))
    q.load()
    st = kld_stats(ref, np.asarray(q.forward_simple(ids), dtype=np.float32))
    line = json.dumps({"event": "bpw_point", "bpw": 2.0, "kld": st,
                       "repair_s": round(repair_s, 1), "repaired": True})
    print(line, flush=True)
    with open(out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
