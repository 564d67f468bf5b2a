"""Ring attention (sequence-parallel) vs dense reference on an 8-device
virtual CPU mesh, plus EP/TP sharded forward smoke for MoE and MLA models."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exllamav3_tpu.ops.attention import attend_dense
from exllamav3_tpu.parallel.ring_attention import make_ring_attention
from exllamav3_tpu.parallel.sharding import make_mesh, shard_params, shard_cache_state


@pytest.mark.parametrize("hq,hk", [(8, 8), (8, 2)])
def test_ring_attention_matches_dense(hq, hk):
    devices = jax.devices()[:4]
    mesh = Mesh(np.asarray(devices).reshape(4), axis_names=("sp",))
    rng = np.random.default_rng(0)
    B, T, D = 2, 32, 16  # T divides across 4 devices
    q = rng.standard_normal((B, T, hq, D)).astype(np.float32)
    k = rng.standard_normal((B, T, hk, D)).astype(np.float32)
    v = rng.standard_normal((B, T, hk, D)).astype(np.float32)
    pos = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T)).copy()

    ref = np.asarray(attend_dense(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                  jnp.asarray(pos), jnp.asarray(pos), scale=0.25))

    ring = make_ring_attention(mesh, axis_name="sp")
    out = np.asarray(ring(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(pos), jnp.asarray(pos), 0.25))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_ring_attention_shuffled_kv_blocks():
    """Block rotation order must not matter: positions carry the mask."""
    devices = jax.devices()[:4]
    mesh = Mesh(np.asarray(devices).reshape(4), axis_names=("sp",))
    rng = np.random.default_rng(1)
    B, T, H, D = 1, 16, 2, 8
    q = rng.standard_normal((B, T, H, D)).astype(np.float32)
    k = rng.standard_normal((B, T, H, D)).astype(np.float32)
    v = rng.standard_normal((B, T, H, D)).astype(np.float32)
    pos = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T)).copy()
    # permute the KV sequence (and its positions identically) — attention is
    # permutation-equivariant over keys given positions
    perm = rng.permutation(T)
    ring = make_ring_attention(mesh, axis_name="sp")
    out = np.asarray(ring(jnp.asarray(q), jnp.asarray(k[:, perm]),
                          jnp.asarray(v[:, perm]), jnp.asarray(pos),
                          jnp.asarray(pos[:, perm]), 1.0))
    ref = np.asarray(attend_dense(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                  jnp.asarray(pos), jnp.asarray(pos), scale=1.0))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_moe_ep_sharded_forward(tmp_path):
    """MoE model with expert-dim (EP) sharded stacked tensors on a tp mesh."""
    from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
    from exllamav3_tpu.model import Config, Model

    cfg = dict(architectures=["MixtralForCausalLM"], bos_token_id=1,
               eos_token_id=2, vocab_size=256, hidden_size=128,
               intermediate_size=128, max_position_embeddings=2048,
               num_attention_heads=4, num_key_value_heads=4,
               num_hidden_layers=2, rms_norm_eps=1e-5, rope_theta=10000.0,
               torch_dtype="bfloat16", head_dim=32, hidden_act="silu",
               num_local_experts=8, num_experts_per_tok=2)
    d = str(tmp_path / "mx")
    write_synth_dense_for_arch(d, cfg, seed=4)
    model = Model.from_config(Config.from_directory(d))
    model.load()

    ids = np.ones((1, 6), np.int32)
    ref = np.asarray(model.forward_simple(ids))

    mesh = make_mesh(jax.devices()[:4], dp=1, tp=4)
    params = shard_params(model.params, mesh)
    # verify EP placement took: expert dim sharded over tp
    w = params["model.layers.0.block_sparse_moe"]["w_w1"]
    assert w.sharding.spec == P("tp", None, None)

    with mesh:
        step = jax.jit(model.step_fn(attn_mode="dense"))
        out, _ = step(params, jnp.asarray(ids), None,
                      jnp.broadcast_to(jnp.arange(6, dtype=jnp.int32), (1, 6)),
                      jnp.zeros(1, jnp.int32), None)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-2, atol=3e-2)


def test_mla_tp_sharded_forward(tmp_path):
    from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
    from exllamav3_tpu.model import Config, Model

    cfg = dict(architectures=["DeepseekV3ForCausalLM"], bos_token_id=1,
               eos_token_id=2, vocab_size=256, hidden_size=128,
               intermediate_size=256, max_position_embeddings=2048,
               num_attention_heads=4, num_hidden_layers=1, rms_norm_eps=1e-5,
               rope_theta=10000.0, torch_dtype="bfloat16", hidden_act="silu",
               kv_lora_rank=64, qk_nope_head_dim=32, qk_rope_head_dim=32,
               v_head_dim=32, n_routed_experts=8, num_experts_per_tok=2,
               n_shared_experts=1, moe_intermediate_size=64,
               first_k_dense_replace=0, n_group=1, topk_group=1,
               scoring_func="sigmoid")
    d = str(tmp_path / "ds")
    write_synth_dense_for_arch(d, cfg, seed=5)
    model = Model.from_config(Config.from_directory(d))
    model.load()
    ids = np.ones((1, 5), np.int32)
    ref = np.asarray(model.forward_simple(ids))

    mesh = make_mesh(jax.devices()[:4], dp=1, tp=4)
    params = shard_params(model.params, mesh)
    w_uk = params["model.layers.0.self_attn"]["w_uk"]
    assert w_uk.sharding.spec == P(None, "tp", None)
    with mesh:
        step = jax.jit(model.step_fn(attn_mode="dense"))
        out, _ = step(params, jnp.asarray(ids), None,
                      jnp.broadcast_to(jnp.arange(5, dtype=jnp.int32), (1, 5)),
                      jnp.zeros(1, jnp.int32), None)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-2, atol=3e-2)
