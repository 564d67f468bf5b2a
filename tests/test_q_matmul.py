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
