"""Gated delta rule / GLA recurrence and causal conv1d correctness.

Numpy reference loops re-derived from the semantic spec in
/root/reference/exllamav3/modules/gated_delta_net_fn/gated_delta_rule.py
(torch_recurrent_gated_delta_rule) — independent implementation, same math.
Also: chunked-vs-full state-carry parity (the property the generator relies
on) for GDN and Mamba2 modules.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from exllamav3_tpu.ops.recurrence import causal_conv1d, gated_recurrence, l2norm


def np_gated_recurrence(q, k, v, g, beta, S0, scale, delta_rule=True):
    B, T, H, dk = q.shape
    dv = v.shape[-1]
    S = S0.astype(np.float64).copy()
    o = np.zeros((B, T, H, dv))
    for t in range(T):
        dec = np.exp(g[:, t])  # (B,H)
        v_t = v[:, t].astype(np.float64)
        if delta_rule:
            mem = np.einsum("bhkv,bhk->bhv", S, k[:, t])
            v_t = v_t - mem * dec[..., None]
        S = S * dec[..., None, None] + (
            beta[:, t][..., None, None] * k[:, t][..., :, None] * v_t[..., None, :]
        )
        o[:, t] = np.einsum("bhkv,bhk->bhv", S, q[:, t]) * scale
    return o, S


@pytest.mark.parametrize("delta_rule", [True, False])
def test_gated_recurrence_matches_numpy(delta_rule):
    rng = np.random.default_rng(0)
    B, T, H, dk, dv = 2, 9, 3, 8, 4
    q = rng.standard_normal((B, T, H, dk)).astype(np.float32)
    k = rng.standard_normal((B, T, H, dk)).astype(np.float32)
    v = rng.standard_normal((B, T, H, dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((B, T, H))).astype(np.float32)
    beta = rng.uniform(0.1, 1.0, (B, T, H)).astype(np.float32)
    S0 = rng.standard_normal((B, H, dk, dv)).astype(np.float32) * 0.3

    o, S_T = gated_recurrence(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(g), jnp.asarray(beta),
                              jnp.asarray(S0), scale=0.5,
                              delta_rule=delta_rule)
    o_ref, S_ref = np_gated_recurrence(q, k, v, g, beta, S0, 0.5, delta_rule)
    np.testing.assert_allclose(np.asarray(o), o_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(S_T), S_ref, rtol=2e-4, atol=2e-4)


def test_gated_recurrence_state_carry():
    """Running [0:5] then [5:9] with carried state == one [0:9] run."""
    rng = np.random.default_rng(1)
    B, T, H, dk, dv = 1, 9, 2, 8, 8
    args = [rng.standard_normal((B, T, H, d)).astype(np.float32)
            for d in (dk, dk, dv)]
    g = -np.abs(rng.standard_normal((B, T, H))).astype(np.float32)
    beta = rng.uniform(0.1, 1.0, (B, T, H)).astype(np.float32)
    S0 = np.zeros((B, H, dk, dv), np.float32)

    o_full, S_full = gated_recurrence(*map(jnp.asarray, args),
                                      jnp.asarray(g), jnp.asarray(beta),
                                      jnp.asarray(S0), scale=1.0)
    o1, S1 = gated_recurrence(*[jnp.asarray(a[:, :5]) for a in args],
                              jnp.asarray(g[:, :5]), jnp.asarray(beta[:, :5]),
                              jnp.asarray(S0), scale=1.0)
    o2, S2 = gated_recurrence(*[jnp.asarray(a[:, 5:]) for a in args],
                              jnp.asarray(g[:, 5:]), jnp.asarray(beta[:, 5:]),
                              S1, scale=1.0)
    np.testing.assert_allclose(np.asarray(o_full[:, :5]), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_full[:, 5:]), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(S_full), np.asarray(S2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("delta_rule", [True, False])
@pytest.mark.parametrize("T,C", [(37, 8), (96, 32)])
def test_chunked_matches_scan(delta_rule, T, C):
    from exllamav3_tpu.ops.recurrence import gated_recurrence_chunked

    rng = np.random.default_rng(3)
    B, H, dk, dv = 2, 3, 16, 8
    q = jnp.asarray(rng.standard_normal((B, T, H, dk)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, H, dk)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, H, dv)).astype(np.float32))
    g = jnp.asarray(-np.abs(rng.standard_normal((B, T, H))).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.1, 1, (B, T, H)).astype(np.float32))
    S0 = jnp.asarray(rng.standard_normal((B, H, dk, dv)).astype(np.float32) * 0.3)
    o1, s1 = gated_recurrence(q, k, v, g, b, S0, 0.25, delta_rule=delta_rule)
    o2, s2 = gated_recurrence_chunked(q, k, v, g, b, S0, 0.25,
                                      delta_rule=delta_rule, chunk=C)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=2e-3, atol=2e-3)


def test_causal_conv1d_matches_numpy_and_carries_state():
    rng = np.random.default_rng(2)
    B, S, C, ks = 2, 10, 6, 4
    x = rng.standard_normal((B, S, C)).astype(np.float32)
    w = rng.standard_normal((C, ks)).astype(np.float32)
    b = rng.standard_normal(C).astype(np.float32)

    y, st = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    # numpy reference: y[t] = silu(sum_j w[:,j] * xpad[t+j] + b)
    xpad = np.concatenate([np.zeros((B, ks - 1, C), np.float32), x], axis=1)
    ref = np.zeros((B, S, C))
    for t in range(S):
        ref[:, t] = sum(w[:, j] * xpad[:, t + j] for j in range(ks)) + b
    ref = ref * (1.0 / (1.0 + np.exp(-ref)))  # silu
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st),
                               np.swapaxes(x[:, -(ks - 1):], 1, 2),
                               rtol=1e-5, atol=1e-5)

    # split run with carried state == full run
    y1, st1 = causal_conv1d(jnp.asarray(x[:, :4]), jnp.asarray(w), jnp.asarray(b))
    y2, st2 = causal_conv1d(jnp.asarray(x[:, 4:]), jnp.asarray(w),
                            jnp.asarray(b), st1)
    np.testing.assert_allclose(np.asarray(y[:, :4]), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y[:, 4:]), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
