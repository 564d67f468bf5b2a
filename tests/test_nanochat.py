"""NanoChat specifics: native vs HF key schemes must give identical logits,
and the VE / resid-lambda / backout features must be detected and active."""
import json
import os

import numpy as np

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.loader.safetensors import SafetensorsCollection, save_file
from exllamav3_tpu.model import Config, Model

CFG = dict(architectures=["NanoChatForCausalLM"], bos_token_id=1,
           eos_token_id=2, vocab_size=256, hidden_size=64,
           intermediate_size=128, max_position_embeddings=2048,
           num_attention_heads=4, num_key_value_heads=2, num_hidden_layers=4,
           rms_norm_eps=1e-5, rope_theta=10000.0, torch_dtype="bfloat16",
           head_dim=16, hidden_act="relu2", final_logit_softcapping=15.0)


def _hf_to_native(k: str) -> str:
    k = k.replace("model.embed_tokens.", "transformer.wte.")
    k = k.replace("model.layers.", "transformer.h.")
    k = k.replace(".self_attn.q_proj.", ".attn.c_q.")
    k = k.replace(".self_attn.k_proj.", ".attn.c_k.")
    k = k.replace(".self_attn.v_proj.", ".attn.c_v.")
    k = k.replace(".self_attn.o_proj.", ".attn.c_proj.")
    k = k.replace(".self_attn.ve_gate.", ".attn.ve_gate.")
    k = k.replace(".mlp.fc1.", ".mlp.c_fc.")
    k = k.replace(".mlp.fc2.", ".mlp.c_proj.")
    return k


def test_nanochat_native_keys_parity(tmp_path):
    d_hf = str(tmp_path / "hf")
    write_synth_dense_for_arch(d_hf, CFG, seed=11)

    cfg_hf = Config.from_directory(d_hf)
    assert not cfg_hf.native_keys
    assert cfg_hf.has_ve and cfg_hf.has_resid and cfg_hf.has_backout

    # rewrite with the nanochat-native key scheme (transformer.h.*)
    stc = SafetensorsCollection(d_hf)
    tensors, bf16_keys = {}, set()
    for key in stc.keys():
        nk = _hf_to_native(key)
        tensors[nk] = stc.get_tensor(key, allow_bf16=True)
        if stc.get_dtype_str(key) == "BF16":
            bf16_keys.add(nk)
    d_nat = str(tmp_path / "native")
    os.makedirs(d_nat)
    with open(f"{d_nat}/config.json", "w") as f:
        json.dump(CFG, f)
    save_file(tensors, f"{d_nat}/model.safetensors", bf16_keys=bf16_keys)

    m_hf = Model.from_config(cfg_hf)
    m_hf.load()
    cfg_nat = Config.from_directory(d_nat)
    assert cfg_nat.native_keys
    m_nat = Model.from_config(cfg_nat)
    m_nat.load()

    ids = np.array([[3, 17, 200, 41, 5, 99]], np.int32)
    o_hf = np.asarray(m_hf.forward_simple(ids))
    o_nat = np.asarray(m_nat.forward_simple(ids))
    np.testing.assert_array_equal(o_hf, o_nat)
    assert np.isfinite(o_hf).all()
    # softcap bounds the logits
    assert np.abs(o_hf).max() <= 15.0 + 1e-3


def test_nanochat_features_change_logits(tmp_path):
    """Zeroing the VE tables / backout lambda must move the logits — proves
    those paths are wired in, not silently dropped."""
    d = str(tmp_path / "m")
    write_synth_dense_for_arch(d, CFG, seed=12)
    base = Model.from_config(Config.from_directory(d))
    base.load()
    ids = np.array([[3, 17, 200, 41, 5, 99]], np.int32)
    o_base = np.asarray(base.forward_simple(ids))

    stc = SafetensorsCollection(d)
    tensors, bf16_keys = {}, set()
    for key in stc.keys():
        t = stc.get_tensor(key, allow_bf16=True)
        if key.startswith("value_embeds.") or key == "backout_lambda":
            t = np.zeros_like(t)
        tensors[key] = t
        if stc.get_dtype_str(key) == "BF16":
            bf16_keys.add(key)
    d2 = str(tmp_path / "z")
    os.makedirs(d2)
    with open(f"{d2}/config.json", "w") as f:
        json.dump(CFG, f)
    save_file(tensors, f"{d2}/model.safetensors", bf16_keys=bf16_keys)
    # the extras file would shadow the zeroed tensors — d2 only has one file
    z = Model.from_config(Config.from_directory(d2))
    z.load()
    o_z = np.asarray(z.forward_simple(ids))
    assert not np.array_equal(o_base, o_z)
