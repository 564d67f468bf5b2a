"""Eval harness smoke: qbench KLD pipeline over synthetic models (identical
models -> ~0 KLD; int8 requant -> small positive KLD; caching works)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "eval"))

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg


def test_qbench_kld_pipeline(tmp_path):
    import qbench

    d = str(tmp_path / "m")
    write_tiny_llama_exl3(
        d, tiny_llama_cfg(vocab_size=512, hidden_size=128, intermediate_size=256,
                          num_layers=2, num_q_heads=4, num_kv_heads=4),
        K=4, seed=21)
    project = {
        "test_rows": 2,
        "row_length": 64,
        "vocab_size": 512,
        "cache_dir": "qc",
        "models": [
            {"name": "ref", "model_dir": d, "linear_mode": "reconstruct",
             "reference": True},
            {"name": "same", "model_dir": d, "linear_mode": "reconstruct"},
            {"name": "int8", "model_dir": d, "linear_mode": "int8"},
        ],
    }
    res = qbench.run_project(project, noise_floor=True, base_dir=str(tmp_path))
    assert res["same"]["mean"] < 1e-6  # identical model: zero KLD
    assert res["int8"]["mean"] > res["same"]["mean"]
    assert res["int8"]["mean"] < 1.0  # requant noise is small, not chaos
    assert "__noise_floor__" in res
    assert "buckets" in res["int8"]

    # second run must hit the on-disk caches (no model loads needed)
    res2 = qbench.run_project(project, base_dir=str(tmp_path))
    assert res2["int8"]["mean"] == res["int8"]["mean"]


def test_model_diff_attrib(tmp_path):
    """Single-module-swap attribution: ctrl exactly 0, contributions
    approximately additive, quantization-free modules contribute ~0."""
    import model_diff_attrib as mda
    from exllamav3_tpu.model import Config, Model, InferParams

    d = str(tmp_path / "m")
    write_tiny_llama_exl3(
        d, tiny_llama_cfg(vocab_size=512, hidden_size=128, intermediate_size=256,
                          num_layers=2, num_q_heads=4, num_kv_heads=4),
        K=4, seed=7)

    def load(mode):
        m = Model.from_config(Config.from_directory(
            d, infer_params=InferParams(linear_mode=mode)))
        m.load()
        return m

    ma, mb = load("int4"), load("reconstruct")
    rng = np.random.default_rng(0)
    ids_rows = [rng.integers(1, 512, (1, 48)).astype(np.int32) for _ in range(2)]
    kld_full, table = mda.attribute(ma, mb, ids_rows, iso=True)
    assert kld_full > 0
    for r in table:
        assert r["ctrl"] == 0.0, f"restart machinery broken at {r['module']}"
        assert r["kld_iso"] is not None
    total = sum(r["kld"] for r in table)
    assert 0.5 < total / kld_full < 2.0  # additivity within the ref's band
    by_key = {r["module"]: r["kld"] for r in table}
    assert by_key["model.embed_tokens"] < 1e-9  # no quantized params
    assert by_key["model.norm"] < 1e-9
    assert max(by_key.values()) > 0  # the blocks/head carry the error
