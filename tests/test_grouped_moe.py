"""Grouped (ragged_dot) MoE path must match the dense-all path exactly —
same routing semantics, k/E of the FLOPs (SURVEY §7 hard part #6)."""
import numpy as np
import jax.numpy as jnp
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model
from exllamav3_tpu.modules.block_sparse_mlp import BlockSparseMLP
from exllamav3_tpu.modules.module import ForwardCtx


@pytest.mark.parametrize("arch,extra", [
    ("MixtralForCausalLM", dict(num_local_experts=8, num_experts_per_tok=2)),
    ("GptOssForCausalLM", dict(num_local_experts=8, num_experts_per_tok=2,
                               sliding_window=64, swiglu_limit=7.0,
                               layer_types=["sliding_attention",
                                            "full_attention"])),
])
def test_grouped_matches_dense(tmp_path, arch, extra):
    cfg = dict(architectures=[arch], bos_token_id=1, eos_token_id=2,
               vocab_size=256, hidden_size=128, intermediate_size=64,
               max_position_embeddings=2048, num_attention_heads=4,
               num_key_value_heads=2, num_hidden_layers=1, rms_norm_eps=1e-5,
               rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
               hidden_act="silu", moe_intermediate_size=64, **extra)
    d = str(tmp_path / arch)
    write_synth_dense_for_arch(d, cfg, seed=5)
    model = Model.from_config(Config.from_directory(d))
    model.load()
    moe = next(m for m in model.root.walk() if isinstance(m, BlockSparseMLP))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 128)), dtype=jnp.bfloat16)
    ctx = ForwardCtx(positions=jnp.zeros((1, 64), jnp.int32))

    # T=64, E=8, k=2 -> grouped path active
    grouped = np.asarray(moe.forward(x, model.params, ctx))

    # force the dense-all path by inflating top_k threshold condition
    orig = moe.num_experts
    moe.num_experts = moe.top_k  # disables the grouped branch condition
    dense = np.asarray(moe.forward(x, model.params, ctx))
    moe.num_experts = orig

    np.testing.assert_allclose(grouped, dense, rtol=2e-2, atol=2e-2)
    cos = np.sum(grouped * dense) / (np.linalg.norm(grouped)
                                     * np.linalg.norm(dense) + 1e-9)
    assert cos > 0.9999


@pytest.mark.parametrize("arch,extra", [
    ("MixtralForCausalLM", dict(num_local_experts=8, num_experts_per_tok=2)),
    ("GptOssForCausalLM", dict(num_local_experts=8, num_experts_per_tok=2,
                               intermediate_size=128, sliding_window=64,
                               swiglu_limit=7.0,
                               layer_types=["sliding_attention",
                                            "full_attention"])),
])
def test_selected_decode_matches_dense(tmp_path, arch, extra, monkeypatch):
    """Decode shapes through the selected-expert Pallas kernel (interpret
    mode) must match the dense-all einsum: same routing, k/E of the weight
    reads (reference exl3_moe.cu)."""
    cfg = dict(architectures=[arch], bos_token_id=1, eos_token_id=2,
               vocab_size=256, hidden_size=128, intermediate_size=64,
               max_position_embeddings=2048, num_attention_heads=4,
               num_key_value_heads=2, num_hidden_layers=1, rms_norm_eps=1e-5,
               rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
               hidden_act="silu", moe_intermediate_size=128)
    cfg.update(extra)
    d = str(tmp_path / arch)
    write_synth_dense_for_arch(d, cfg, seed=7)
    model = Model.from_config(Config.from_directory(d))
    model.load()
    moe = next(m for m in model.root.walk() if isinstance(m, BlockSparseMLP))

    rng = np.random.default_rng(3)
    for T in (1, 4):
        x = jnp.asarray(rng.standard_normal((1, T, 128)), dtype=jnp.bfloat16)
        ctx = ForwardCtx(positions=jnp.zeros((1, T), jnp.int32))

        monkeypatch.setenv("EXL3_TPU_MOE", "interpret")
        assert moe._use_selected_kernel(T)
        sel = np.asarray(moe.forward(x, model.params, ctx))
        monkeypatch.setenv("EXL3_TPU_MOE", "dense")
        dense = np.asarray(moe.forward(x, model.params, ctx))
        np.testing.assert_allclose(sel, dense, rtol=2e-2, atol=2e-2)
        cos = np.sum(sel * dense) / (np.linalg.norm(sel)
                                     * np.linalg.norm(dense) + 1e-9)
        assert cos > 0.9999, (arch, T, cos)
