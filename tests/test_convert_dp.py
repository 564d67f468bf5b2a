"""Conversion data parallelism: Hessian capture sharded over a dp mesh axis
matches single-device capture AND the eager per-linear accumulation path
(reference convert_model.py:976-984 shards calibration rows across model
replicas; here the rows shard over one GSPMD mesh axis and the H = x^T x
contraction all-reduces)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exllamav3_tpu.conversion.synth import write_tiny_llama_dense, tiny_llama_cfg
from exllamav3_tpu.conversion.convert_model import build_capture_fn
from exllamav3_tpu.model import Config, Model, InferParams
from exllamav3_tpu.modules.module import ForwardCtx
from exllamav3_tpu.modules.linear import Linear

CFG = tiny_llama_cfg(
    vocab_size=256, hidden_size=128, intermediate_size=128,
    num_layers=1, num_q_heads=2, num_kv_heads=2,
)


@pytest.fixture(scope="module")
def block(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dpcap"))
    write_tiny_llama_dense(d, CFG, seed=3)
    config = Config.from_directory(
        d, infer_params=InferParams(fuse_projections=False))
    model = Model.from_config(config)
    mod = next(m for m in model.modules
               if any(isinstance(x, Linear) for x in m.walk()))
    params: dict = {}
    mod.load(params)
    return mod, params


def test_dp_capture_matches_single_device(block):
    mod, params = block
    B, S, h = 8, 32, CFG["hidden_size"]
    rng = np.random.default_rng(0)
    st = rng.standard_normal((B, S, h)).astype(np.float32)
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S)).copy()
    valid = np.ones(B, np.float32)

    cap = jax.jit(build_capture_fn(mod))
    ref = jax.device_get(cap(params, jnp.asarray(st), jnp.asarray(pos),
                             jnp.asarray(valid)))
    assert ref, "no qmaps captured"

    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("dp",))
    sh = NamedSharding(mesh, P("dp"))
    got = jax.device_get(cap(
        params, jax.device_put(jnp.asarray(st), sh),
        jax.device_put(jnp.asarray(pos), sh),
        jax.device_put(jnp.asarray(valid), sh)))

    assert set(got) == set(ref)
    for qmap in ref:
        h_ref, c_ref = ref[qmap]
        h_got, c_got = got[qmap]
        assert int(c_got) == int(c_ref)
        np.testing.assert_allclose(h_got, h_ref, rtol=2e-5, atol=1e-3)


def test_device_capture_matches_eager(block):
    """The jitted device contraction equals the eager HessianData path."""
    mod, params = block
    B, S, h = 4, 16, CFG["hidden_size"]
    rng = np.random.default_rng(1)
    st = rng.standard_normal((B, S, h)).astype(np.float32)
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S)).copy()

    cap = jax.jit(build_capture_fn(mod))
    dev = jax.device_get(cap(params, jnp.asarray(st), jnp.asarray(pos),
                             jnp.ones(B, jnp.float32)))

    eager: dict = {}
    ctx = ForwardCtx(positions=jnp.asarray(pos), capture=eager)
    mod.forward(jnp.asarray(st), params, ctx)

    assert set(dev) == set(eager)
    for qmap, hd in eager.items():
        h_dev, c_dev = dev[qmap]
        assert int(c_dev) == hd.count
        np.testing.assert_allclose(h_dev, hd.H, rtol=2e-5, atol=1e-3)


def test_padded_rows_contribute_nothing(block):
    mod, params = block
    B, S, h = 4, 16, CFG["hidden_size"]
    rng = np.random.default_rng(2)
    st = rng.standard_normal((B, S, h)).astype(np.float32)
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S)).copy()
    cap = jax.jit(build_capture_fn(mod))

    full = jax.device_get(cap(params, jnp.asarray(st), jnp.asarray(pos),
                              jnp.ones(B, jnp.float32)))
    # rows 2..3 are padding duplicates of rows 0..1 with valid=0
    st2 = np.concatenate([st[:2], st[:2]])
    mask = np.array([1, 1, 0, 0], np.float32)
    half = jax.device_get(cap(params, jnp.asarray(st2), jnp.asarray(pos),
                              jnp.asarray(mask)))
    ref2 = jax.device_get(cap(params, jnp.asarray(st[:2]),
                              jnp.asarray(pos[:2]),
                              jnp.ones(2, jnp.float32)))
    for qmap in full:
        np.testing.assert_allclose(half[qmap][0], ref2[qmap][0],
                                   rtol=2e-5, atol=1e-3)
        assert int(half[qmap][1]) == int(ref2[qmap][1])
