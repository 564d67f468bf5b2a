"""Fractional-bpw KLD sweep: more bits must mean (weakly) less divergence
from the dense reference — the BASELINE metric-2 shape (VERDICT round-1 #6:
monotone KLD-vs-bpw through the sweep harness)."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "eval"))

from exllamav3_tpu.conversion.synth import write_tiny_llama_dense, tiny_llama_cfg


@pytest.mark.slow
def test_kld_monotone_in_bpw(tmp_path):
    import bpw_sweep

    cfg = tiny_llama_cfg(vocab_size=256, hidden_size=128,
                         intermediate_size=128, num_layers=1,
                         num_q_heads=2, num_kv_heads=2)
    src = str(tmp_path / "dense")
    write_tiny_llama_dense(src, cfg, seed=13)
    pts, stats = bpw_sweep.sweep(src, str(tmp_path), [2.0, 3.25, 5.0],
                                 rows=4, length=48, fast=True, seed=4)
    klds = [k for _, k in pts]
    assert all({"mean", "median", "p90", "conf_buckets"} <= set(s)
               for s in stats)
    assert all(k >= 0 for k in klds)
    # strictly better at each step with real margins (2 -> 3.25 -> 5 bits)
    assert klds[1] < klds[0]
    assert klds[2] < klds[1]
    assert klds[2] < 0.1  # 5 bpw is near-lossless on logits
