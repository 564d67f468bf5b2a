"""Footprint-driven linear_mode="auto" selection (VERDICT r3 item 8).

The ladder is tiered by HBM footprint, not speed-within-tier: int8 whenever
it fits (it dominates every packed int-B mode on measured decode speed),
else int6 -> int4 -> fused. Reference anchor: the CUDA build picks its
GEMM/GEMV kernel family by shape, not memory — the TPU ladder instead picks
the weight REPRESENTATION by capacity (doc/performance.md)."""
import os

import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
from exllamav3_tpu.model import Config, Model, InferParams
from exllamav3_tpu.model.model import (
    estimate_linear_mode_bytes,
    select_linear_mode,
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("auto_mode"))
    cfg = tiny_llama_cfg(vocab_size=256, hidden_size=256,
                         intermediate_size=512, num_layers=2,
                         num_q_heads=4, num_kv_heads=2)
    write_tiny_llama_exl3(d, cfg, K=4, seed=0)
    return d


def test_ladder_walks_down_by_budget(ckpt):
    config = Config.from_directory(ckpt)
    b8 = estimate_linear_mode_bytes(config, "int8")
    b6 = estimate_linear_mode_bytes(config, "int6")
    b4 = estimate_linear_mode_bytes(config, "int4")
    bf = estimate_linear_mode_bytes(config, "fused")
    assert b8 > b6 > b4 > bf  # 4-bpw trellis: 0.5 B/w beats int4's 0.5625

    # generous budget -> int8; progressively tighter budgets walk the ladder
    assert select_linear_mode(config, hbm_bytes=10 * b8) == "int8"
    assert select_linear_mode(config, hbm_bytes=int(b6 / 0.8) + 1) == "int6"
    assert select_linear_mode(config, hbm_bytes=int(b4 / 0.8) + 1) == "int4"
    assert select_linear_mode(config, hbm_bytes=int(bf / 0.8) + 1) == "fused"


def test_model_load_resolves_auto(ckpt, monkeypatch):
    config = Config.from_directory(ckpt)
    bytes_int4 = estimate_linear_mode_bytes(config, "int4")
    monkeypatch.setenv("EXL3TPU_HBM_BYTES", str(int(bytes_int4 / 0.8) + 1))
    model = Model.from_config(
        Config.from_directory(ckpt, infer_params=InferParams(linear_mode="auto")))
    model.load()
    assert model.config.infer_params.linear_mode == "int4"
    # the loaded params actually carry grouped-int4 tensors
    assert any("weight_q4" in g for g in model.params.values())


def test_auto_unknown_capacity_is_int8(ckpt, monkeypatch):
    monkeypatch.delenv("EXL3TPU_HBM_BYTES", raising=False)
    config = Config.from_directory(ckpt)
    assert select_linear_mode(config, hbm_bytes=None) in ("int8",)

    model = Model.from_config(
        Config.from_directory(ckpt, infer_params=InferParams(linear_mode="auto")))
    model.load()
    assert model.config.infer_params.linear_mode == "int8"
    logits = model.forward_simple(np.array([[1, 2, 3, 4]], dtype=np.int32))
    assert np.isfinite(np.asarray(logits)).all()
