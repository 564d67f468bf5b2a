"""Fused Pallas trellis-decode GEMM vs the reconstruct reference (interpret
mode on CPU), across bit widths and codebooks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.fast

from exllamav3_tpu.quant.reconstruct import exl3_matmul_ref_jnp
from exllamav3_tpu.quant.codebook import CB_3INST, CB_MCG, CB_MUL1
from exllamav3_tpu.ops.exl3_gemm import (
    prepare_trellis_words,
    words_to_trellis,
    exl3_matmul_fused,
    exl3_matmul,
)


def _rand_case(rng, k, n, K):
    trellis = rng.integers(-32768, 32768, size=(k // 16, n // 16, 16 * K)).astype(np.int16)
    suh = np.sign(rng.standard_normal(k)).astype(np.float32)
    svh = (np.sign(rng.standard_normal(n)) * 0.05).astype(np.float32)
    return trellis, suh, svh


def test_words_roundtrip():
    rng = np.random.default_rng(0)
    trellis = rng.integers(-32768, 32768, size=(2, 3, 64)).astype(np.int16)
    words = prepare_trellis_words(trellis)
    back = np.asarray(words_to_trellis(jnp.asarray(words)))
    assert np.array_equal(back, trellis)


@pytest.mark.parametrize("K,cb", [(4, CB_3INST), (2, CB_MCG), (3, CB_MUL1),
                                  (5, CB_3INST), (8, CB_3INST)])
def test_fused_matches_reconstruct(K, cb):
    rng = np.random.default_rng(K)
    k, n, m = 256, 256, 5
    trellis, suh, svh = _rand_case(rng, k, n, K)
    x = (rng.standard_normal((m, k)) * 0.3).astype(np.float32)

    ref = np.asarray(
        exl3_matmul_ref_jnp(jnp.asarray(x), jnp.asarray(trellis),
                            jnp.asarray(suh), jnp.asarray(svh), K, cb,
                            out_dtype=jnp.float32)
    )
    words = jnp.asarray(prepare_trellis_words(trellis))
    got = np.asarray(
        exl3_matmul_fused(jnp.asarray(x), words, jnp.asarray(suh),
                          jnp.asarray(svh), K, cb, out_dtype=jnp.float32)
    )
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() < 0.02 * scale, (K, cb, np.abs(got - ref).max(), scale)


def test_dispatch_large_m_falls_back():
    rng = np.random.default_rng(1)
    k, n, K = 128, 128, 4
    trellis, suh, svh = _rand_case(rng, k, n, K)
    x = (rng.standard_normal((300, k)) * 0.3).astype(np.float32)
    words = jnp.asarray(prepare_trellis_words(trellis))
    ref = np.asarray(
        exl3_matmul_ref_jnp(jnp.asarray(x), jnp.asarray(trellis),
                            jnp.asarray(suh), jnp.asarray(svh), K, CB_3INST,
                            out_dtype=jnp.float32)
    )
    got = np.asarray(
        exl3_matmul(jnp.asarray(x), words, jnp.asarray(suh), jnp.asarray(svh),
                    K, CB_3INST, out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, ref, rtol=0, atol=0.02 * np.abs(ref).max())
