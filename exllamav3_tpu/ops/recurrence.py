"""Linear-attention recurrences: causal conv1d + gated delta rule / GLA scan.

Feature reference: /root/reference/exllamav3/modules/gated_delta_net_fn/
(gated_delta_rule.py torch_recurrent_gated_delta_rule:45 is the semantic
spec; conv1d.py applies silu after the depthwise conv) and
exllamav3_ext/gdn.cu (beta = sigmoid(b)*beta_scale, g = -softplus(a +
dt_bias)*exp(A_log); mamba2 dt = clamp(softplus(dt+bias)), g = dt*A).

TPU-native: the recurrence is a lax.scan whose step is einsum work the VPU
and MXU handle directly; the state (B, H, dk, dv) f32 rides through the jitted
step as part of the cache pytree. The depthwise conv unrolls its (tiny)
kernel into shifted adds that XLA fuses. A chunked parallel formulation (WY
representation) can replace the scan for long prefill later; the scan is the
correctness baseline and is already fine for decode (T == 1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def l2norm(x, eps: float = 1e-6):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def causal_conv1d(x, w, b=None, conv_state=None, valid_len=None,
                  activation: bool = True):
    """Depthwise causal conv + silu. x: (B, S, C); w: (C, ksize); b: (C,) or
    None; conv_state: (B, C, ksize-1) trailing inputs of the previous call or
    None (zeros). valid_len: (B,) count of real (non-padded) tokens per row —
    padding must be a tail suffix; the carried state is taken after the last
    VALID token. Returns (y (B, S, C), new_conv_state (B, C, ksize-1))."""
    B, S, C = x.shape
    ks = w.shape[-1]
    xt = jnp.swapaxes(x, 1, 2).astype(jnp.float32)  # (B, C, S)
    if valid_len is not None:
        tok_ok = (jnp.arange(S) < valid_len[:, None]).astype(jnp.float32)
        xt = xt * tok_ok[:, None, :]
    if conv_state is None:
        conv_state = jnp.zeros((B, C, ks - 1), dtype=jnp.float32)
    full = jnp.concatenate([conv_state.astype(jnp.float32), xt], axis=-1)
    y = jnp.zeros_like(xt)
    for j in range(ks):  # tiny static kernel (4) — unrolled shifted adds
        y = y + w[:, j].astype(jnp.float32)[None, :, None] * full[..., j : j + S]
    if b is not None:
        y = y + b.astype(jnp.float32)[None, :, None]
    if activation:
        y = jax.nn.silu(y)
    if valid_len is None:
        new_state = full[..., S:]
    else:
        # last ks-1 inputs ending at the final valid token: full[:, :, L:L+ks-1]
        idx = valid_len[:, None] + jnp.arange(ks - 1)[None, :]  # (B, ks-1)
        new_state = jnp.take_along_axis(full, idx[:, None, :].astype(jnp.int32)
                                        .repeat(C, axis=1), axis=-1)
    return jnp.swapaxes(y, 1, 2), new_state


def gated_recurrence(q, k, v, g, beta, S0, scale: float, delta_rule: bool = True,
                     return_history: bool = False):
    """Gated delta rule (delta_rule=True) or plain gated linear attention.

    q, k: (B, T, H, dk); v: (B, T, H, dv); g (log decay), beta: (B, T, H);
    S0: (B, H, dk, dv) f32. Per step (reference semantics):

        dec = exp(g_t)
        [delta]  v_t' = v_t - (k_t . S) * dec
        S   = S * dec + beta_t * k_t (x) v_t'
        o_t = (q_t . S) * scale

    Returns (o (B, T, H, dv) f32, S_T (B, H, dk, dv) f32).
    """
    qT = jnp.moveaxis(q.astype(jnp.float32), 1, 0)
    kT = jnp.moveaxis(k.astype(jnp.float32), 1, 0)
    vT = jnp.moveaxis(v.astype(jnp.float32), 1, 0)
    gT = jnp.moveaxis(g.astype(jnp.float32), 1, 0)
    bT = jnp.moveaxis(beta.astype(jnp.float32), 1, 0)

    def step(S, inp):
        q_t, k_t, v_t, g_t, b_t = inp
        dec = jnp.exp(g_t)  # (B, H)
        if delta_rule:
            mem = jnp.einsum("bhkv,bhk->bhv", S, k_t)
            v_t = v_t - mem * dec[..., None]
        S = S * dec[..., None, None] + (
            b_t[..., None, None] * k_t[..., :, None] * v_t[..., None, :]
        )
        o_t = jnp.einsum("bhkv,bhk->bhv", S, q_t) * scale
        out = (o_t, S) if return_history else o_t
        return S, out

    # unrolling packs 8 steps per scan iteration: fewer loop trips and larger
    # fused bodies (the step math is tiny VPU work; loop overhead dominates)
    unroll = 8 if q.shape[1] >= 8 else 1
    S_T, out = jax.lax.scan(step, S0.astype(jnp.float32), (qT, kT, vT, gT, bT),
                            unroll=unroll)
    if return_history:
        o, S_hist = out
        # per-step states for speculative rewind (B, T, H, dk, dv)
        return jnp.moveaxis(o, 0, 1), S_T, jnp.moveaxis(S_hist, 0, 1)
    return jnp.moveaxis(out, 0, 1), S_T


def gated_recurrence_chunked(q, k, v, g, beta, S0, scale: float,
                             delta_rule: bool = True, chunk: int = 64):
    """Chunkwise-parallel gated delta rule / GLA — the TPU analogue of the
    reference's fla chunk_gated_delta_rule (gated_delta_net_fn/
    gated_delta_rule.py). Derivation: with u_t = beta_t (v_t - a_t S_{t-1}^T
    k_t) the recurrence is S_t = a_t S_{t-1} + k_t u_t^T, so within a chunk

        (I + M) U = B V - diag(beta*Gamma) K S_0,     M = B (D_< o K K^T)
        S_C = Gamma_C S_0 + K^T diag(Gamma_C / Gamma) U
        O   = scale [ diag(Gamma) Q S_0 + (D_<= o Q K^T) U ]

    where Gamma is the in-chunk cumulative decay and D the decay-ratio
    matrices. Everything is dense matmuls (MXU) plus one (C x C) triangular
    solve per chunk; chunks scan sequentially carrying S. Exactly matches
    the sequential scan (tested) — use for prefill; decode stays on the scan.
    """
    B, T, H, dk = q.shape
    dv = v.shape[-1]
    pad = (-T) % chunk
    if pad:
        zpad = lambda a: jnp.pad(a, [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2))
        q, k, v = zpad(q), zpad(k), zpad(v)
        g, beta = zpad(g), zpad(beta)  # g=0 (decay 1), beta=0 (no write)
    Tp = T + pad
    N = Tp // chunk

    def resh(a, d):
        return jnp.moveaxis(
            a.astype(jnp.float32).reshape(B, N, chunk, H, d), 3, 2
        ).transpose(1, 0, 2, 3, 4)  # (N, B, H, C, d)

    qc, kc, vc = resh(q, dk), resh(k, dk), resh(v, dv)
    gc = jnp.moveaxis(g.astype(jnp.float32).reshape(B, N, chunk, H), 3, 2
                      ).transpose(1, 0, 2, 3)  # (N, B, H, C)
    bc = jnp.moveaxis(beta.astype(jnp.float32).reshape(B, N, chunk, H), 3, 2
                      ).transpose(1, 0, 2, 3)

    tril_s = jnp.tril(jnp.ones((chunk, chunk), bool), k=-1)  # strict
    tril_i = jnp.tril(jnp.ones((chunk, chunk), bool))  # inclusive
    eye = jnp.eye(chunk, dtype=jnp.float32)

    def step(S, inp):
        Q, K, V, G, Bt = inp  # (B,H,C,dk) (B,H,C,dk) (B,H,C,dv) (B,H,C) x2
        cum = jnp.cumsum(G, axis=-1)  # log Gamma_t
        gamma = jnp.exp(cum)
        # decay ratios Gamma_t / Gamma_j, masked to the needed triangles
        ratio = jnp.exp(cum[..., :, None] - cum[..., None, :])
        KK = jnp.einsum("bhtd,bhjd->bhtj", K, K)
        rhs = Bt[..., None] * V
        if delta_rule:
            M = Bt[..., :, None] * jnp.where(tril_s, ratio * KK, 0.0)
            rhs = rhs - (Bt * gamma)[..., None] * jnp.einsum(
                "bhtd,bhdv->bhtv", K, S)
            A = eye + M
            U = jax.scipy.linalg.solve_triangular(A, rhs, lower=True)
        else:
            U = rhs
        QK = jnp.einsum("bhtd,bhjd->bhtj", Q, K)
        O = gamma[..., None] * jnp.einsum("bhtd,bhdv->bhtv", Q, S)
        O = O + jnp.einsum("bhtj,bhjv->bhtv",
                           jnp.where(tril_i, ratio * QK, 0.0), U)
        gC = gamma[..., -1]  # (B,H)
        S = gC[..., None, None] * S + jnp.einsum(
            "bhtd,bhtv->bhdv", K * (gC[..., None] / gamma)[..., None], U)
        return S, O * scale

    S_T, O = jax.lax.scan(step, S0.astype(jnp.float32), (qc, kc, vc, gc, bc))
    # (N,B,H,C,dv) -> (B,T,H,dv)
    O = O.transpose(1, 0, 3, 2, 4).reshape(B, Tp, H, dv)
    if pad:
        O = O[:, :T]
    return O, S_T


def conv_history(x, conv_state, ksize: int):
    """Per-step conv tails for speculative rewind: after step t the carried
    state is the last ksize-1 inputs. x: (B, S, C); conv_state: (B, C, ks-1)
    or None. Returns (B, S, C, ks-1)."""
    B, S, C = x.shape
    xt = jnp.swapaxes(x, 1, 2).astype(jnp.float32)
    if conv_state is None:
        conv_state = jnp.zeros((B, C, ksize - 1), dtype=jnp.float32)
    full = jnp.concatenate([conv_state.astype(jnp.float32), xt], axis=-1)
    return jnp.stack([full[:, :, t + 1 : t + ksize] for t in range(S)], axis=1)
