"""MXFP4 decode and gpt-oss expert loading from _blocks/_scales tensors."""
import json
import os

import numpy as np
import pytest

from exllamav3_tpu.loader.safetensors import mxfp4_to_f32, _FP4_E2M1


def test_mxfp4_roundtrip():
    rng = np.random.default_rng(0)
    G = 4
    # exactly-representable values: lut entry * shared 2^e per group
    nibbles = rng.integers(0, 16, size=(2, G, 32)).astype(np.uint8)
    scales = rng.integers(120, 134, size=(2, G)).astype(np.uint8)
    blocks = (nibbles[..., 0::2] | (nibbles[..., 1::2] << 4)).astype(np.uint8)
    dec = mxfp4_to_f32(blocks, scales)
    ref = _FP4_E2M1[nibbles] * np.exp2(
        scales.astype(np.float32) - 127.0)[..., None]
    np.testing.assert_array_equal(dec, ref.reshape(2, G * 32))


def test_gptoss_mxfp4_expert_load(tmp_path):
    """A gpt-oss checkpoint whose experts are MXFP4 must produce the same
    logits as the identical dense-bf16 checkpoint."""
    from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
    from exllamav3_tpu.model import Config, Model
    from exllamav3_tpu.loader.safetensors import SafetensorsCollection, save_file

    cfg = dict(architectures=["GptOssForCausalLM"], bos_token_id=1,
               eos_token_id=2, vocab_size=256, hidden_size=64,
               intermediate_size=64, max_position_embeddings=2048,
               num_attention_heads=4, num_key_value_heads=2,
               num_hidden_layers=1, rms_norm_eps=1e-5, rope_theta=10000.0,
               torch_dtype="bfloat16", head_dim=16, hidden_act="silu",
               sliding_window=32, layer_types=["full_attention"],
               num_local_experts=2, num_experts_per_tok=1, swiglu_limit=7.0)
    d_dense = str(tmp_path / "dense")
    write_synth_dense_for_arch(d_dense, cfg, seed=51)

    # rebuild the checkpoint with experts quantized to exactly-representable
    # mxfp4 values so dense and mxfp4 models agree bitwise
    stc = SafetensorsCollection(d_dense)
    rng = np.random.default_rng(1)
    tensors = {}
    bf16_keys = set()
    from exllamav3_tpu.loader.safetensors import bf16_to_f32, f32_to_bf16_u16

    def snap_mxfp4(w):
        """Snap (..., IN) f32 rows to mxfp4 grid; return blocks, scales, dense."""
        G = w.shape[-1] // 32
        wg = w.reshape(w.shape[:-1] + (G, 32))
        e = rng.integers(124, 130, size=wg.shape[:-1]).astype(np.uint8)
        nib = rng.integers(0, 16, size=wg.shape).astype(np.uint8)
        dense = _FP4_E2M1[nib] * np.exp2(e.astype(np.float32) - 127.0)[..., None]
        blocks = (nib[..., 0::2] | (nib[..., 1::2] << 4)).astype(np.uint8)
        return blocks, e, dense.reshape(w.shape)

    d_mx = str(tmp_path / "mx")
    os.makedirs(d_mx, exist_ok=True)
    with open(f"{d_mx}/config.json", "w") as f:
        json.dump(cfg, f)
    E, h, i = 2, 64, 64
    for key in stc.keys():
        raw = stc.get_tensor(key, allow_bf16=True)
        if key.endswith("experts.gate_up_proj"):
            w = bf16_to_f32(raw)  # (E, h, 2i)
            blocks, scales, dense = snap_mxfp4(
                np.swapaxes(w, -1, -2) * 0.05)  # (E, 2i, h) rows over IN
            tensors[key + "_blocks"] = blocks
            tensors[key + "_scales"] = scales
            gu_dense = np.swapaxes(dense, -1, -2)  # back to (E, h, 2i)
            dense_gu = gu_dense
        elif key.endswith("experts.down_proj"):
            w = bf16_to_f32(raw)  # (E, i, h)
            blocks, scales, dense = snap_mxfp4(np.swapaxes(w, -1, -2) * 0.05)
            tensors[key + "_blocks"] = blocks
            tensors[key + "_scales"] = scales
            dense_dn = np.swapaxes(dense, -1, -2)
        else:
            tensors[key] = raw
            if stc.get_dtype_str(key) == "BF16":
                bf16_keys.add(key)
    save_file(tensors, f"{d_mx}/model.safetensors", bf16_keys=bf16_keys)

    # dense twin: overwrite the dense dir's expert tensors with the snapped
    # values so both models hold identical weights
    tensors2 = dict(tensors)
    for key in list(tensors2):
        if key.endswith("_blocks") or key.endswith("_scales"):
            del tensors2[key]
    tensors2["model.layers.0.mlp.experts.gate_up_proj"] = f32_to_bf16_u16(dense_gu)
    tensors2["model.layers.0.mlp.experts.down_proj"] = f32_to_bf16_u16(dense_dn)
    bf16_keys2 = set(bf16_keys) | {
        "model.layers.0.mlp.experts.gate_up_proj",
        "model.layers.0.mlp.experts.down_proj"}
    d_tw = str(tmp_path / "tw")
    os.makedirs(d_tw, exist_ok=True)
    with open(f"{d_tw}/config.json", "w") as f:
        json.dump(cfg, f)
    save_file(tensors2, f"{d_tw}/model.safetensors", bf16_keys=bf16_keys2)

    m1 = Model.from_config(Config.from_directory(d_mx))
    m1.load()
    m2 = Model.from_config(Config.from_directory(d_tw))
    m2.load()
    ids = np.array([[5, 9, 13, 2]], np.int32)
    o1 = np.asarray(m1.forward_simple(ids))
    o2 = np.asarray(m2.forward_simple(ids))
    np.testing.assert_allclose(o1, o2, rtol=2e-2, atol=2e-2)
