"""End-to-end conversion: dense checkpoint -> EXL3 -> load -> quality check.

The real assertion: the converted model's logits stay close to the dense
model's (KL divergence well under the noise of a broken pipeline). Uses a
tiny model; the Viterbi runs on the batched jnp backend.
"""
import os

import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_tiny_llama_dense, tiny_llama_cfg
from exllamav3_tpu.conversion.convert_model import convert_model
from exllamav3_tpu.model import Config, Model, InferParams


CFG = tiny_llama_cfg(
    vocab_size=256, hidden_size=128, intermediate_size=128,
    num_layers=1, num_q_heads=2, num_kv_heads=2,
)


def _kld(p_logits, q_logits):
    def logsoftmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    lp, lq = logsoftmax(p_logits), logsoftmax(q_logits)
    return float(np.mean(np.sum(np.exp(lp) * (lp - lq), axis=-1)))


@pytest.mark.slow
def test_convert_roundtrip(tmp_path):
    src = str(tmp_path / "dense")
    dst = str(tmp_path / "exl3")
    write_tiny_llama_dense(src, CFG, seed=42)

    job = convert_model(src, dst, bpw=4.0, head_bits=6, rows=8, length=64,
                        fast=True, verbose=False, seed=1)
    assert len(job["proxy_err"]) == 8  # 7 block linears + lm_head
    assert all(0 <= v < 0.5 for v in job["proxy_err"].values()), job["proxy_err"]
    assert os.path.exists(os.path.join(dst, "model.safetensors"))

    dense = Model.from_config(Config.from_directory(src))
    dense.load()
    quant = Model.from_config(
        Config.from_directory(dst, infer_params=InferParams(linear_mode="reconstruct"))
    )
    quant.load()
    assert quant.config.quantization_config["quant_method"] == "exl3"

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=(2, 32)).astype(np.int32)
    lp = np.asarray(dense.forward_simple(ids))
    lq = np.asarray(quant.forward_simple(ids))
    kld = _kld(lp, lq)
    assert np.isfinite(lq).all()
    assert kld < 0.15, kld

    # resume: a second run must skip all completed modules quickly
    import time

    t0 = time.time()
    job2 = convert_model(src, dst, bpw=4.0, head_bits=6, rows=8, length=64,
                         fast=True, verbose=False, seed=1)
    assert time.time() - t0 < 30
    assert sorted(job2["completed"]) == sorted(job["completed"])


@pytest.mark.slow
def test_convert_timed_checkpoint_resume(tmp_path, monkeypatch):
    """Mid-module resume: checkpoint after every linear, simulate an
    interruption by clearing `completed` while keeping the partial record —
    the resumed run skips finished linears and converges to a working
    checkpoint."""
    import json

    src = str(tmp_path / "dense")
    dst = str(tmp_path / "exl3")
    write_tiny_llama_dense(src, CFG, seed=7)
    monkeypatch.setenv("EXL3_TPU_CKPT_INTERVAL", "0")  # checkpoint every linear

    job = convert_model(src, dst, bpw=3.0, head_bits=4, rows=4, length=32,
                        fast=True, verbose=False, seed=2)
    n_done = len(job["proxy_err"])

    # simulate a crash mid-module 1: keep only a partial record
    sp = os.path.join(dst, "job_state.json")
    with open(sp) as f:
        st = json.load(f)
    block_mi = st["completed"][1]
    partial_keys = [k for k in st["proxy_err"]
                    if "layers.0.self_attn" in k][:2]
    st["completed"] = st["completed"][:1]
    st["partial"] = {str(block_mi): partial_keys}
    with open(sp, "w") as f:
        json.dump(st, f)

    job2 = convert_model(src, dst, bpw=3.0, head_bits=4, rows=4, length=32,
                         fast=True, verbose=False, seed=2, resume=True)
    assert len(job2["proxy_err"]) == n_done
    quant = Model.from_config(Config.from_directory(
        dst, infer_params=InferParams(linear_mode="reconstruct")))
    quant.load()
    ids = np.arange(16, dtype=np.int32)[None] % 250
    assert np.isfinite(np.asarray(quant.forward_simple(ids))).all()


@pytest.mark.slow
def test_convert_bad_rows_abort(tmp_path):
    """A checkpoint whose activations explode must abort past 10% bad rows
    instead of silently quantizing garbage (reference check_bad_rows)."""
    src = str(tmp_path / "dense")
    dst = str(tmp_path / "exl3")
    # enormous weights overflow f32 through two matmuls -> non-finite states
    write_tiny_llama_dense(src, CFG, seed=3, weight_scale=1e25)
    with pytest.raises(RuntimeError, match="non-finite"):
        convert_model(src, dst, bpw=3.0, head_bits=4, rows=4, length=32,
                      fast=True, verbose=False, seed=3, resume=False)


def test_mid_module_resume_keeps_sq_tensors(tmp_path, monkeypatch):
    """A mid-module resume's shard rewrite must carry previously saved
    serving-int-B (.sq) tensors — they are emitted once per linear and the
    resumed linears skip re-quantization."""
    import json
    from exllamav3_tpu.loader.safetensors import SafetensorsCollection

    src = str(tmp_path / "dense")
    dst = str(tmp_path / "exl3")
    write_tiny_llama_dense(src, CFG, seed=11)
    monkeypatch.setenv("EXL3_TPU_CKPT_INTERVAL", "0")

    convert_model(src, dst, bpw=4.0, head_bits=4, rows=4, length=32,
                  fast=True, verbose=False, seed=2, serving_bits=4)
    sp = os.path.join(dst, "job_state.json")
    with open(sp) as f:
        st = json.load(f)
    block_mi = st["completed"][1]
    partial_keys = [k for k in st["proxy_err"]
                    if "layers.0.self_attn" in k][:2]
    st["completed"] = st["completed"][:1]
    st["partial"] = {str(block_mi): partial_keys}
    with open(sp, "w") as f:
        json.dump(st, f)

    convert_model(src, dst, bpw=4.0, head_bits=4, rows=4, length=32,
                  fast=True, verbose=False, seed=2, resume=True,
                  serving_bits=4)
    stc = SafetensorsCollection(dst)
    try:
        for k in partial_keys:
            assert stc.has_tensor(k + ".sq"), k
            assert stc.has_tensor(k + ".sq_scale"), k
    finally:
        stc.close()


def test_resume_rejects_corrupt_shard(tmp_path):
    """A module shard corrupted on disk (e.g. a save interrupted before the
    atomic-write fix) must be detected on resume — the affected linears are
    demoted out of `completed`/`partial` and requantized rather than
    silently shipped (round-5 incident: layer with NaN suh/svh survived a
    mid-module kill and poisoned every downstream logit)."""
    import json
    from exllamav3_tpu.loader.safetensors import (
        SafetensorsCollection, save_file)

    src = str(tmp_path / "dense")
    dst = str(tmp_path / "exl3")
    write_tiny_llama_dense(src, CFG, seed=5)
    convert_model(src, dst, bpw=3.0, head_bits=4, rows=4, length=32,
                  fast=True, verbose=False, seed=2)

    # corrupt one completed block shard IN PLACE: NaN out a linear's suh
    # bytes (what an interrupted pre-atomic save left behind)
    import struct
    sp = os.path.join(dst, "job_state.json")
    with open(sp) as f:
        st = json.load(f)
    block_mi = st["completed"][1]
    shard_path = os.path.join(dst, "qtensors",
                              f"module_{block_mi:04d}.safetensors")
    with open(shard_path, "r+b") as f:
        hlen = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(hlen))
        victim = next(k for k in header if k.endswith(".suh"))
        lo, hi = header[victim]["data_offsets"]
        f.seek(8 + hlen + lo)
        f.write(np.full((hi - lo) // 4, np.nan, np.float32).tobytes())
    victim = victim[: -len(".suh")]

    job2 = convert_model(src, dst, bpw=3.0, head_bits=4, rows=4, length=32,
                         fast=True, verbose=False, seed=2, resume=True)
    quant = Model.from_config(Config.from_directory(
        dst, infer_params=InferParams(linear_mode="reconstruct")))
    quant.load()
    ids = np.arange(16, dtype=np.int32)[None] % 250
    assert np.isfinite(np.asarray(quant.forward_simple(ids))).all()
