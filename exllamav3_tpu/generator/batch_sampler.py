"""Vectorized per-row sampling for the batched decode step.

The reference runs one composable sampler chain per job on host/GPU
(generator/sampler/custom.py); the TPU redesign turns sampler settings into
per-row parameter arrays so one jitted kernel serves a heterogeneous batch —
no recompilation when jobs with different settings mix.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .sampler import (
    Sampler,
    SS_AdaptiveP,
    SS_Temperature,
    SS_TopK,
    SS_TopP,
    SS_MinP,
    SS_RepP,
    SS_PresFreqP,
    SS_XTC,
    NEG_INF,
)

MAX_TOP_K = 256


@dataclass
class BatchSamplerParams:
    """Per-row sampling parameters as arrays (host side)."""

    temperature: np.ndarray  # (B,) f32
    top_k: np.ndarray  # (B,) i32, 0 = off
    top_p: np.ndarray  # (B,) f32, 1 = off
    min_p: np.ndarray  # (B,) f32, 0 = off
    rep_p: np.ndarray  # (B,) f32, 1 = off
    presence_p: np.ndarray  # (B,) f32
    frequency_p: np.ndarray  # (B,) f32
    xtc_threshold: np.ndarray  # (B,) f32
    xtc_probability: np.ndarray  # (B,) f32, 0 = off
    adaptive_target: np.ndarray  # (B,) f32, 0 = off (adapted per step)
    greedy: np.ndarray  # (B,) bool

    @staticmethod
    def from_samplers(samplers: list[Sampler]) -> "BatchSamplerParams":
        B = len(samplers)
        p = BatchSamplerParams(
            temperature=np.ones(B, np.float32),
            top_k=np.zeros(B, np.int32),
            top_p=np.ones(B, np.float32),
            min_p=np.zeros(B, np.float32),
            rep_p=np.ones(B, np.float32),
            presence_p=np.zeros(B, np.float32),
            frequency_p=np.zeros(B, np.float32),
            xtc_threshold=np.ones(B, np.float32),
            xtc_probability=np.zeros(B, np.float32),
            adaptive_target=np.zeros(B, np.float32),
            greedy=np.zeros(B, bool),
        )
        for i, s in enumerate(samplers):
            p.greedy[i] = s.greedy
            for step in s.steps:
                if isinstance(step, SS_Temperature):
                    p.temperature[i] = step.temperature
                elif isinstance(step, SS_TopK):
                    p.top_k[i] = min(step.top_k, MAX_TOP_K)
                elif isinstance(step, SS_TopP):
                    p.top_p[i] = step.top_p
                elif isinstance(step, SS_MinP):
                    p.min_p[i] = step.min_p
                elif isinstance(step, SS_RepP):
                    p.rep_p[i] = step.rep_p
                elif isinstance(step, SS_PresFreqP):
                    p.presence_p[i] = step.presence_p
                    p.frequency_p[i] = step.frequency_p
                elif isinstance(step, SS_XTC):
                    p.xtc_threshold[i] = step.threshold
                    p.xtc_probability[i] = step.probability
                elif isinstance(step, SS_AdaptiveP):
                    if step.target < 1.0:
                        p.adaptive_target[i] = step.adapted_target()
        return p

    def as_device(self) -> dict:
        return {
            "temperature": jnp.asarray(self.temperature),
            "top_k": jnp.asarray(self.top_k),
            "top_p": jnp.asarray(self.top_p),
            "min_p": jnp.asarray(self.min_p),
            "rep_p": jnp.asarray(self.rep_p),
            "presence_p": jnp.asarray(self.presence_p),
            "frequency_p": jnp.asarray(self.frequency_p),
            "xtc_threshold": jnp.asarray(self.xtc_threshold),
            "xtc_probability": jnp.asarray(self.xtc_probability),
            "adaptive_target": jnp.asarray(self.adaptive_target),
            "greedy": jnp.asarray(self.greedy),
        }


def batch_sample(logits, sp: dict, counts, key, filter_mask=None,
                 return_probs: bool = False):
    """logits: (B, V) f32; sp: device param dict; counts: (B, V) int32.

    Returns sampled token ids (B,) int32; with return_probs also the
    sampled token's post-truncation probability (B,) f32 (adaptive-p
    feedback). One fused chain, per-row params.
    """
    B, V = logits.shape
    x = logits.astype(jnp.float32)

    if filter_mask is not None:
        x = x + filter_mask

    # repetition penalty
    seen = counts > 0
    rep = sp["rep_p"][:, None]
    x = jnp.where(seen & (rep != 1.0), jnp.where(x > 0, x / rep, x * rep), x)
    # presence/frequency
    cf = counts.astype(jnp.float32)
    x = x - sp["presence_p"][:, None] * (cf > 0) - sp["frequency_p"][:, None] * cf
    # temperature
    x = x / jnp.maximum(sp["temperature"][:, None], 1e-6)
    # top-k (single fused top-k at the max supported k)
    topk_vals = jax.lax.top_k(x, MAX_TOP_K)[0]  # (B, MAX_TOP_K) sorted desc
    k = jnp.clip(sp["top_k"], 0, MAX_TOP_K)
    k_thresh = jnp.take_along_axis(
        topk_vals, jnp.maximum(k[:, None] - 1, 0), axis=-1
    )
    x = jnp.where((k[:, None] > 0) & (x < k_thresh), NEG_INF, x)
    # top-p over the top-MAX_TOP_K candidates (tail mass below is negligible)
    probs_sorted = jax.nn.softmax(topk_vals, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep = cum - probs_sorted < sp["top_p"][:, None]
    cut_idx = jnp.maximum(jnp.sum(keep, axis=-1, keepdims=True) - 1, 0)
    p_thresh = jnp.take_along_axis(topk_vals, cut_idx, axis=-1)
    x = jnp.where((sp["top_p"][:, None] < 1.0) & (x < p_thresh), NEG_INF, x)
    # min-p
    probs = jax.nn.softmax(x, axis=-1)
    mp_thresh = jnp.max(probs, axis=-1, keepdims=True) * sp["min_p"][:, None]
    x = jnp.where(probs < mp_thresh, NEG_INF, x)
    # XTC: with probability p drop every token with prob >= threshold except
    # the least likely of them (reference SS_XTC)
    key, xtc_key = jax.random.split(key)
    probs = jax.nn.softmax(x, axis=-1)
    above = probs >= sp["xtc_threshold"][:, None]
    n_above = jnp.sum(above, axis=-1, keepdims=True)
    min_above = jnp.min(jnp.where(above, probs, jnp.inf), axis=-1, keepdims=True)
    gate = (jax.random.uniform(xtc_key, (B, 1)) < sp["xtc_probability"][:, None])
    drop = above & (probs > min_above) & (n_above >= 2) & gate
    x = jnp.where(drop, NEG_INF, x)
    # adaptive-p (reference sampling_extra.cu adaptivep_gumbel_noise): bell
    # faux-logits centered on the per-row adapted target probability
    probs = jax.nn.softmax(x, axis=-1)
    at = sp["adaptive_target"][:, None]
    a = jnp.abs(probs - at) / 0.3
    faux = jnp.where(probs < 1e-8, NEG_INF, 5.0 - 10.0 * a * a / (a + 1.0))
    x = jnp.where(at > 0.0, faux, x)
    # sample / argmax
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, x.shape, minval=1e-20, maxval=1.0)))
    noisy = jnp.where(x <= NEG_INF / 2, NEG_INF, x + gumbel)
    sampled = jnp.argmax(noisy, axis=-1)
    greedy = jnp.argmax(x, axis=-1)
    tok = jnp.where(sp["greedy"], greedy, sampled).astype(jnp.int32)
    if not return_probs:
        return tok
    tok_p = jnp.take_along_axis(probs, tok[:, None].astype(jnp.int32),
                                axis=-1)[:, 0]
    return tok, tok_p
