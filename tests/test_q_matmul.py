"""Pallas int8 dequant matmul vs reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from exllamav3_tpu.ops.q_matmul import int8_matmul_ref, int8_matmul_pallas


def test_int8_pallas_matches_ref():
    rng = np.random.default_rng(0)
    m, k, n = 32, 256, 512
    x = rng.standard_normal((m, k)).astype(np.float32)
    w_q = rng.integers(-127, 128, size=(k, n)).astype(np.int8)
    scale = (rng.random(n).astype(np.float32) + 0.5) * 0.01

    ref = np.asarray(int8_matmul_ref(jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            int8_matmul_pallas(jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale),
                               block_m=16, block_n=128, block_k=128)
        )
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-3)


def test_int4_pack_roundtrip():
    """pack -> unpack reproduces the grouped-quantized weight exactly."""
    from exllamav3_tpu.ops.q_matmul import (
        int4_pack_jnp, int4_unpack_jnp, INT4_GROUP)

    rng = np.random.default_rng(1)
    k, n = 256, 128
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    packed, scales = int4_pack_jnp(jnp.asarray(w))
    assert packed.dtype == jnp.int8 and packed.shape == (k // 2, n)
    assert scales.shape == (k // INT4_GROUP, n)
    w2 = np.asarray(int4_unpack_jnp(packed, scales))
    # Lloyd-refined scales shrink below absmax/7, clipping tail values by
    # more than half a step in exchange for lower group MSE: interior
    # values stay within half a step, and the overall noise must sit at
    # (or below) the plain absmax-scale quantizer's
    step = np.repeat(np.asarray(scales, np.float32), INT4_GROUP, axis=0)
    interior = np.abs(w) <= 7.0 * step
    assert np.all(np.abs(w2 - w)[interior] <= step[interior] * 0.55 + 1e-6)
    g = k // INT4_GROUP
    amax = np.abs(w.reshape(g, INT4_GROUP, n)).max(axis=1)
    s0 = np.repeat(amax / 7.0, INT4_GROUP, axis=0)
    w0 = np.clip(np.round(w / s0), -8, 7) * s0
    assert ((w2 - w) ** 2).mean() <= ((w0 - w) ** 2).mean() * 1.02


def test_int4_a8_matches_ref():
    """W4A8 kernel (int8 activations, int8 MXU dots, per-group output
    scaling) vs the f32 unpack reference: only the ~0.8% activation
    row-quant noise separates them."""
    from exllamav3_tpu.ops.q_matmul import (
        int4_pack_jnp, int4_matmul_ref, int4_matmul_a8)

    rng = np.random.default_rng(3)
    m, k, n = 16, 512, 256
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    packed, scales = int4_pack_jnp(jnp.asarray(w))

    ref = np.asarray(int4_matmul_ref(jnp.asarray(x), packed, scales))
    got = np.asarray(int4_matmul_a8(jnp.asarray(x), packed, scales,
                                    interpret=True))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 3e-2, rel


def test_int4_pallas_matches_ref():
    from exllamav3_tpu.ops.q_matmul import (
        int4_pack_jnp, int4_matmul_ref, int4_matmul_pallas)

    rng = np.random.default_rng(2)
    m, k, n = 16, 512, 256
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    packed, scales = int4_pack_jnp(jnp.asarray(w))

    ref = np.asarray(int4_matmul_ref(jnp.asarray(x), packed, scales))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(int4_matmul_pallas(
            jnp.asarray(x, dtype=jnp.bfloat16), packed, scales,
            block_m=16, block_n=128, block_kh=128))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_int4_a8_shapes():
    """W4A8 kernel across decode (single m block, row-sliced fixups) and
    prefill (multi m block) shapes."""
    import jax.numpy as jnp
    from exllamav3_tpu.ops.q_matmul import (int4_matmul_a8, int4_matmul_ref,
                                            int4_pack_jnp)

    rng = np.random.default_rng(3)
    k, n = 512, 512
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    packed, sc = int4_pack_jnp(jnp.asarray(w))
    for m in (1, 16, 300):
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        ref = np.asarray(int4_matmul_ref(x, packed, sc))
        got = np.asarray(int4_matmul_a8(x, packed, sc, interpret=True))
        assert got.shape == ref.shape
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 0.03, (m, err)
