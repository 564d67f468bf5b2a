"""DSA (sparse attention) correctness: with index_topk >= context length the
selection covers everything and DSA must match dense MLA exactly (same
attention weights, indexer irrelevant); with a small top-k the selection
actually restricts attention; cached decode stays consistent."""
import json
import shutil

import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec


def _cfg(topk):
    return dict(
        architectures=["DeepseekV32ForCausalLM"], bos_token_id=1,
        eos_token_id=2, vocab_size=512, hidden_size=128,
        intermediate_size=256, max_position_embeddings=4096,
        num_attention_heads=4, num_hidden_layers=2, rms_norm_eps=1e-5,
        rope_theta=10000.0, torch_dtype="bfloat16", hidden_act="silu",
        q_lora_rank=48, kv_lora_rank=64, qk_nope_head_dim=32,
        qk_rope_head_dim=32, v_head_dim=32, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, moe_intermediate_size=64,
        first_k_dense_replace=1, n_group=1, topk_group=1,
        scoring_func="sigmoid", index_n_heads=4, index_head_dim=32,
        index_topk=topk,
    )


def test_dsa_full_topk_matches_dense_mla(tmp_path):
    d = str(tmp_path / "v32")
    write_synth_dense_for_arch(d, _cfg(topk=4096), seed=31)
    m_dsa = Model.from_config(Config.from_directory(d))
    m_dsa.load()

    # same tensors, read through the dense-MLA (V2) architecture
    d2 = str(tmp_path / "v3")
    shutil.copytree(d, d2)
    with open(f"{d2}/config.json") as f:
        cfg = json.load(f)
    cfg["architectures"] = ["DeepseekV2ForCausalLM"]
    cfg["scoring_func"] = "sigmoid"
    with open(f"{d2}/config.json", "w") as f:
        json.dump(cfg, f)
    m_mla = Model.from_config(Config.from_directory(d2))
    m_mla.load()

    ids = np.array([[5, 9, 13, 2, 7, 44]], np.int32)
    out_dsa = np.asarray(m_dsa.forward_simple(ids))
    out_mla = np.asarray(m_mla.forward_simple(ids))
    np.testing.assert_allclose(out_dsa, out_mla, rtol=1e-4, atol=1e-4)


def test_dsa_small_topk_restricts_and_caches(tmp_path):
    d = str(tmp_path / "v32s")
    write_synth_dense_for_arch(d, _cfg(topk=2), seed=32)
    model = Model.from_config(Config.from_directory(d))
    model.load()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 500, size=(1, 10)).astype(np.int32)
    sparse = np.asarray(model.forward_simple(ids))
    assert np.isfinite(sparse).all()

    # dense comparison (huge topk) must differ for long-enough context
    d2 = str(tmp_path / "v32d")
    shutil.copytree(d, d2)
    with open(f"{d2}/config.json") as f:
        cfg = json.load(f)
    cfg["index_topk"] = 4096
    with open(f"{d2}/config.json", "w") as f:
        json.dump(cfg, f)
    dense_m = Model.from_config(Config.from_directory(d2))
    dense_m.load()
    dense = np.asarray(dense_m.forward_simple(ids))
    assert not np.allclose(sparse[0, -1], dense[0, -1], atol=1e-3)

    # cached chunked decode consistent with the full sparse forward
    import jax.numpy as jnp

    cache = Cache(model, CacheSpec(layout="linear", batch_size=1, max_len=16))
    step = model.jitted_step("dense", donate_cache=False)
    pos = np.broadcast_to(np.arange(6, dtype=np.int32), (1, 6))
    l1, cache.state = step(model.params, jnp.asarray(ids[:, :6]), cache.state,
                           jnp.asarray(pos), jnp.zeros(1, np.int32), None)
    outs = [np.asarray(l1)]
    for t in range(6, 10):
        lt, cache.state = step(model.params, jnp.asarray(ids[:, t:t+1]),
                               cache.state, jnp.asarray([[t]]),
                               jnp.full(1, t, np.int32), None)
        outs.append(np.asarray(lt))
    inc = np.concatenate(outs, axis=1)
    assert (inc.argmax(-1) == sparse.argmax(-1)).mean() > 0.85
