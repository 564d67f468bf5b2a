"""Quantized KV cache: round-trip accuracy across bit widths, and decode
parity with the fp16 cache (reference tests/test_kv_quant.py behavior)."""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.fast

from exllamav3_tpu.ops.kv_quant import quantize_kv, dequantize_kv
from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3
from exllamav3_tpu.model import Config, Model, InferParams, Cache, CacheSpec


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 8])
def test_roundtrip_error(bits):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 7, 2, 64)).astype(np.float32)
    q, s = quantize_kv(jnp.asarray(x), bits)
    y = np.asarray(dequantize_kv(q, s, bits, dtype=jnp.float32))
    err = np.abs(y - x)
    # the H32 rotation spreads per-value error across the group, so only the
    # RMS bound holds in the original space (midpoint grid: step = 2a/N)
    rel = float(np.sqrt(np.mean(err**2) / np.mean(x**2)))
    assert rel < {2: 0.45, 3: 0.2, 4: 0.1, 5: 0.05, 6: 0.025, 8: 0.007}[bits]


@pytest.mark.parametrize("bits", [3, 4, 6])
def test_compand_roundtrip(bits):
    """Cubic compander (reference lmq.cuh): encode/decode must invert on the
    grid, and heavy-tailed data must quantize no worse than the linear grid."""
    from exllamav3_tpu.ops.kv_quant import compand_encode, compand_decode

    N = 1 << bits
    idx = jnp.arange(N, dtype=jnp.float32)
    vals = compand_decode(idx, bits, 0.65)
    back = np.asarray(compand_encode(vals, bits, 0.65))
    assert (back == np.arange(N)).all()

    rng = np.random.default_rng(1)
    x = rng.standard_t(df=3, size=(8, 4, 2, 64)).astype(np.float32)  # tails
    q0, s0 = quantize_kv(jnp.asarray(x), bits)
    q1, s1 = quantize_kv(jnp.asarray(x), bits, compand_a=0.65)
    y0 = np.asarray(dequantize_kv(q0, s0, bits, jnp.float32))
    y1 = np.asarray(dequantize_kv(q1, s1, bits, jnp.float32, compand_a=0.65))
    rms0 = np.sqrt(np.mean((y0 - x) ** 2))
    rms1 = np.sqrt(np.mean((y1 - x) ** 2))
    assert rms1 < 1.1 * rms0


def test_quant_cache_decode_parity(tmp_path):
    d = str(tmp_path / "m")
    write_tiny_llama_exl3(d, seed=9)
    config = Config.from_directory(d, infer_params=InferParams(linear_mode="bf16"))
    model = Model.from_config(config)
    model.load()

    rng = np.random.default_rng(2)
    B, S = 1, 10
    ids = rng.integers(0, 500, size=(B, S)).astype(np.int32)
    full = np.asarray(model.forward_simple(ids))

    spec = CacheSpec(layout="linear", batch_size=B, max_len=16, k_bits=6, v_bits=6)
    cache = Cache(model, spec)
    step = model.jitted_step("dense", donate_cache=False, k_bits=6, v_bits=6)
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S))
    logits, cache.state = step(model.params, jnp.asarray(ids), cache.state,
                               jnp.asarray(pos), jnp.zeros(B, jnp.int32), None)
    got = np.asarray(logits)
    # 6-bit cache should barely perturb logits
    assert (got.argmax(-1) == full.argmax(-1)).mean() > 0.9
    np.testing.assert_allclose(got, full, rtol=0.2, atol=0.1 * np.abs(full).max())
