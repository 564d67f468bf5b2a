"""Expert-parallel selected-expert decode (VERDICT r3 item 3).

Under EP sharding the routed decode runs as a shard_map island: each device
computes only its LOCALLY-RESIDENT routed experts with the selected-expert
kernel and a psum combines — the GSPMD analogue of the reference's
channel_unit="experts" EP where each GPU runs only its routed experts' GEMMs
(block_sparse_mlp.py:1556-1590 + exl3_moe.cu). Exactness is asserted against
the masked dense-all path on an 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model
from exllamav3_tpu.modules.block_sparse_mlp import BlockSparseMLP
from exllamav3_tpu.modules.module import ForwardCtx
from exllamav3_tpu.parallel.sharding import make_mesh, shard_params


@pytest.fixture(scope="module")
def moe_model(tmp_path_factory):
    cfg = dict(architectures=["Qwen3MoeForCausalLM"], bos_token_id=1,
               eos_token_id=2, vocab_size=256, hidden_size=128,
               intermediate_size=128, max_position_embeddings=2048,
               num_attention_heads=4, num_key_value_heads=2,
               num_hidden_layers=1, rms_norm_eps=1e-5, rope_theta=10000.0,
               torch_dtype="bfloat16", head_dim=32, hidden_act="silu",
               num_experts=16, num_experts_per_tok=4, norm_topk_prob=True,
               moe_intermediate_size=128)
    d = str(tmp_path_factory.mktemp("ep_moe"))
    write_synth_dense_for_arch(d, cfg, seed=11)
    model = Model.from_config(Config.from_directory(d))
    model.load()
    return model


def test_ep_island_matches_dense(moe_model, monkeypatch):
    monkeypatch.setenv("EXL3_TPU_MOE", "interpret")
    assert jax.device_count() >= 8
    mesh = make_mesh(jax.devices()[:8], dp=1, tp=8)
    moe = next(m for m in moe_model.root.walk()
               if isinstance(m, BlockSparseMLP))
    params = shard_params(moe_model.params, mesh)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 1, 128)), dtype=jnp.bfloat16)

    ctx_ep = ForwardCtx(positions=jnp.zeros((2, 1), jnp.int32))
    ctx_ep.extras["ep"] = (mesh, "tp")
    assert moe._use_ep_kernel(2, mesh, "tp")
    with mesh:
        out_ep = np.asarray(moe.forward(x, params, ctx_ep))

    # masked dense-all reference (the pre-round-4 EP path)
    monkeypatch.setenv("EXL3_TPU_MOE", "dense")
    ctx_d = ForwardCtx(positions=jnp.zeros((2, 1), jnp.int32))
    with mesh:
        out_dense = np.asarray(moe.forward(x, params, ctx_d))

    np.testing.assert_allclose(out_ep, out_dense, rtol=2e-2, atol=2e-2)
    cos = np.sum(out_ep * out_dense) / (
        np.linalg.norm(out_ep) * np.linalg.norm(out_dense) + 1e-9)
    assert cos > 0.9999


def test_ep_full_step_matches_single_device(moe_model, monkeypatch):
    """A whole decode step with ep_mesh must match the unsharded model."""
    monkeypatch.setenv("EXL3_TPU_MOE", "interpret")
    mesh = make_mesh(jax.devices()[:8], dp=1, tp=8)
    params = shard_params(moe_model.params, mesh)
    ids = np.array([[7, 3, 9, 2]], np.int32)
    pos = np.arange(4, np.int32).reshape(1, 4) if False else \
        np.broadcast_to(np.arange(4, dtype=np.int32), (1, 4)).copy()

    with mesh:
        step = jax.jit(moe_model.step_fn(attn_mode="dense", ep_mesh=mesh,
                                         ep_axis="tp"))
        lg_ep, _ = step(params, jnp.asarray(ids), None, jnp.asarray(pos),
                        jnp.zeros(1, jnp.int32), None)
        lg_ep = np.asarray(lg_ep)

    monkeypatch.setenv("EXL3_TPU_MOE", "dense")
    lg_ref = np.asarray(moe_model.forward_simple(ids))
    np.testing.assert_allclose(lg_ep, lg_ref, rtol=3e-2, atol=3e-2)


def test_ep_gate_conditions(moe_model, monkeypatch):
    monkeypatch.setenv("EXL3_TPU_MOE", "interpret")
    mesh = make_mesh(jax.devices()[:8], dp=1, tp=8)
    moe = next(m for m in moe_model.root.walk()
               if isinstance(m, BlockSparseMLP))
    assert not moe._use_ep_kernel(64, mesh, "tp")  # prefill shapes: grouped
    mesh2 = make_mesh(jax.devices()[:2], dp=1, tp=2)
    assert moe._use_ep_kernel(2, mesh2, "tp")
    monkeypatch.setenv("EXL3_TPU_MOE", "dense")  # forced-dense overrides EP
    assert not moe._use_ep_kernel(2, mesh, "tp")
