"""Single-launch fused gate_up->act->down kernel vs the three-dot path."""
import numpy as np
import jax.numpy as jnp
import pytest

from exllamav3_tpu.ops.fused_mlp import fused_mlp_int8


@pytest.mark.parametrize("m,act", [(1, "silu"), (5, "gelu_pytorch_tanh")])
def test_fused_mlp_matches_ref(m, act):
    rng = np.random.default_rng(0)
    h, inter = 256, 512
    x = rng.standard_normal((m, h)).astype(np.float32) * 0.5
    gu_q = rng.integers(-127, 128, size=(h, 2 * inter)).astype(np.int8)
    gu_s = (rng.random(2 * inter).astype(np.float32) + 0.5) * 0.01
    d_q = rng.integers(-127, 128, size=(inter, h)).astype(np.int8)
    d_s = (rng.random(h).astype(np.float32) + 0.5) * 0.01
    d_b = rng.standard_normal(h).astype(np.float32) * 0.1

    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    gu = np.asarray(xb @ (jnp.asarray(gu_q).astype(jnp.bfloat16)),
                    dtype=np.float32) * gu_s
    g, u = gu[:, :inter], gu[:, inter:]
    if act == "silu":
        a = g / (1 + np.exp(-g)) * u
    else:
        a = 0.5 * g * (1 + np.tanh(0.7978845608 * (g + 0.044715 * g**3))) * u
    ref = (np.asarray(jnp.asarray(a, dtype=jnp.bfloat16)
                      @ jnp.asarray(d_q).astype(jnp.bfloat16),
                      dtype=np.float32) * d_s + d_b)

    got = np.asarray(fused_mlp_int8(
        xb, jnp.asarray(gu_q), jnp.asarray(gu_s), jnp.asarray(d_q),
        jnp.asarray(d_s), d_bias=jnp.asarray(d_b), activation=act,
        interpret=True))
    assert got.shape == ref.shape
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / denom < 2e-2


def test_fused_mlp_model_path(tmp_path, monkeypatch):
    """End-to-end through GatedMLP.forward: interpret-mode kernel output
    matches the three-dot int8 path on a loaded synthetic model."""
    import os

    from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3
    from exllamav3_tpu.model import Config, Model, InferParams

    d = str(tmp_path / "m")
    write_tiny_llama_exl3(d)
    ids = np.array([[1, 5, 9, 13]], dtype=np.int32)

    def load():
        cfg = Config.from_directory(
            d, infer_params=InferParams(linear_mode="int8"))
        m = Model.from_config(cfg)
        m.load()
        return m

    monkeypatch.setenv("EXL3_TPU_MLP", "xla")
    ref = np.asarray(load().forward_simple(ids))
    monkeypatch.setenv("EXL3_TPU_MLP", "interpret")
    got = np.asarray(load().forward_simple(ids))
    assert np.abs(got - ref).max() < 0.05 * np.abs(ref).max()
