"""Pallas paged flash-decode attention vs the jnp reference."""
import numpy as np
import jax.numpy as jnp
import pytest

from exllamav3_tpu.constants import PAGE_SIZE
from exllamav3_tpu.ops.attention import attend_paged
from exllamav3_tpu.ops.flash_attention import paged_decode_attention


@pytest.mark.parametrize("sliding,softcap,sinks", [
    (0, 0.0, False),
    (100, 0.0, False),
    (0, 30.0, False),
    (0, 0.0, True),
])
def test_paged_decode_matches_ref(sliding, softcap, sinks):
    rng = np.random.default_rng(1)
    B, Hq, Hk, D, P, MP = 2, 8, 2, 64, 6, 2
    q = rng.standard_normal((B, 1, Hq, D)).astype(np.float32)
    k_pages = rng.standard_normal((P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3
    v_pages = rng.standard_normal((P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3
    bt = np.array([[1, 2], [3, 0]], dtype=np.int32)
    qpos = np.array([300, 120], dtype=np.int32)  # seq lengths 301, 121
    sink_arr = (rng.standard_normal(Hq) * 0.5).astype(np.float32) if sinks else None
    scale = D ** -0.5

    ref = np.asarray(attend_paged(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(bt), jnp.asarray(qpos[:, None]), None,
        scale=scale, sliding_window=sliding, logit_softcap=softcap,
        sinks=jnp.asarray(sink_arr) if sinks else None,
    ))[:, 0]  # (B, Hq, D)

    got = np.asarray(paged_decode_attention(
        jnp.asarray(q[:, 0]), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(bt), jnp.asarray(qpos),
        sinks=jnp.asarray(sink_arr) if sinks else None,
        scale=scale, sliding_window=sliding, logit_softcap=softcap,
        interpret=True,
    ))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
