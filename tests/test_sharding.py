"""GSPMD sharding: multichip forward on the 8-device CPU mesh matches the
single-device result."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.fast

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
from exllamav3_tpu.model import Config, Model, InferParams, Cache, CacheSpec
from exllamav3_tpu.parallel.sharding import make_mesh, shard_params, shard_cache_state


def test_tp_matches_single_device(tmp_path):
    cfg = tiny_llama_cfg(
        vocab_size=1024, hidden_size=256, intermediate_size=512,
        num_layers=2, num_q_heads=8, num_kv_heads=4, head_dim=32,
    )
    d = str(tmp_path / "m")
    write_tiny_llama_exl3(d, cfg, seed=3)
    config = Config.from_directory(d, infer_params=InferParams(linear_mode="bf16"))
    model = Model.from_config(config)
    model.load()

    rng = np.random.default_rng(0)
    B, S = 2, 8
    ids = rng.integers(0, 1000, size=(B, S)).astype(np.int32)
    ref = np.asarray(model.forward_simple(ids))

    mesh = make_mesh(jax.devices()[:8], dp=2, tp=4)
    params = shard_params(model.params, mesh)
    cache = Cache(model, CacheSpec(layout="linear", batch_size=B, max_len=16))
    cache_state = shard_cache_state(cache.state, mesh)
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S)).copy()
    step = jax.jit(model.step_fn("dense"))
    logits, _ = step(
        params,
        jax.device_put(ids, NamedSharding(mesh, P("dp", None))),
        cache_state,
        jax.device_put(pos, NamedSharding(mesh, P("dp", None))),
        jax.device_put(np.zeros(B, np.int32), NamedSharding(mesh, P("dp"))),
        None,
    )
    got = np.asarray(logits)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.02 * np.abs(ref).max())
