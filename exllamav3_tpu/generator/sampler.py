"""Samplers: composable step pipeline compiled into the jitted decode step.

Feature reference: /root/reference/exllamav3/generator/sampler/custom.py
(SS_* steps :82-942) and presets.py. The reference collapses step chains into
fused CUDA kernels; on TPU the whole chain is jnp inside the jitted step, so
fusion is free. Sampling uses the Gumbel-argmax trick (reference gumbel.cu)
so no CDF inversion is needed.

State the generator must thread in: per-sequence token counts (for
repetition/presence/frequency penalties) and a PRNG key.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class SS:
    """Sampler step: transforms logits (B, V) f32."""

    def apply(self, logits, state):
        raise NotImplementedError


@dataclass(frozen=True)
class SS_Temperature(SS):
    temperature: float = 1.0

    def apply(self, logits, state):
        t = max(self.temperature, 1e-6)
        return logits / t


@dataclass(frozen=True)
class SS_TopK(SS):
    top_k: int = 50

    def apply(self, logits, state):
        if self.top_k <= 0:
            return logits
        k = min(self.top_k, logits.shape[-1])
        thresh = jax.lax.top_k(logits, k)[0][..., -1:]
        return jnp.where(logits < thresh, NEG_INF, logits)


@dataclass(frozen=True)
class SS_TopP(SS):
    top_p: float = 1.0

    def apply(self, logits, state):
        if self.top_p >= 1.0:
            return logits
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        keep_sorted = cum - probs < self.top_p
        cutoff_idx = jnp.sum(keep_sorted, axis=-1, keepdims=True) - 1
        cutoff = jnp.take_along_axis(sorted_logits, jnp.maximum(cutoff_idx, 0), axis=-1)
        return jnp.where(logits < cutoff, NEG_INF, logits)


@dataclass(frozen=True)
class SS_MinP(SS):
    min_p: float = 0.0

    def apply(self, logits, state):
        if self.min_p <= 0.0:
            return logits
        probs = jax.nn.softmax(logits, axis=-1)
        thresh = jnp.max(probs, axis=-1, keepdims=True) * self.min_p
        return jnp.where(probs < thresh, NEG_INF, logits)


@dataclass(frozen=True)
class SS_RepP(SS):
    """Repetition penalty (divisive, HF-style) over seen-token counts."""

    rep_p: float = 1.0

    def apply(self, logits, state):
        if self.rep_p == 1.0:
            return logits
        seen = state["token_counts"] > 0
        return jnp.where(
            seen,
            jnp.where(logits > 0, logits / self.rep_p, logits * self.rep_p),
            logits,
        )


@dataclass(frozen=True)
class SS_PresFreqP(SS):
    """Additive presence/frequency penalties (OpenAI-style)."""

    presence_p: float = 0.0
    frequency_p: float = 0.0

    def apply(self, logits, state):
        counts = state["token_counts"].astype(jnp.float32)
        pen = self.presence_p * (counts > 0).astype(jnp.float32) + self.frequency_p * counts
        return logits - pen


@dataclass(frozen=True)
class SS_LogitBias(SS):
    bias: tuple = ()  # ((token_id, bias), ...)

    def apply(self, logits, state):
        for tid, b in self.bias:
            logits = logits.at[..., tid].add(b)
        return logits


@dataclass(frozen=True)
class SS_BanTokens(SS):
    tokens: tuple = ()

    def apply(self, logits, state):
        for tid in self.tokens:
            logits = logits.at[..., tid].set(NEG_INF)
        return logits


@dataclass(frozen=True)
class SS_XTC(SS):
    """Exclude-top-choices (reference sampler/custom.py SS_XTC): with
    probability `probability`, drop every token whose probability is >=
    `threshold` EXCEPT the least likely of them (keeps outputs creative by
    removing the dominant heads)."""

    threshold: float = 0.1
    probability: float = 0.5

    def apply(self, logits, state):
        import jax

        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        above = probs >= self.threshold
        n_above = jnp.sum(above, axis=-1, keepdims=True)
        min_above = jnp.min(jnp.where(above, probs, jnp.inf), axis=-1,
                            keepdims=True)
        drop = above & (probs > min_above) & (n_above >= 2)
        key = state.get("xtc_key")
        if key is not None:
            gate = jax.random.uniform(key, n_above.shape) < self.probability
        else:
            gate = jnp.ones_like(n_above, dtype=bool)
        return jnp.where(drop & gate, NEG_INF, logits)


@dataclass(frozen=True)
class SS_MaskApply(SS):
    """Apply a (B, V) additive mask from constrained-decoding filters."""

    def apply(self, logits, state):
        mask = state.get("filter_mask")
        if mask is None:
            return logits
        return logits + mask


@dataclass
class SS_AdaptiveP(SS):
    """Adaptive-P (reference sampler/custom.py SS_AdaptiveP:864 +
    sampling_extra.cu adaptivep_gumbel_noise): replaces logits with a bell
    centered on an adapted target probability — faux logit =
    PEAK - SHARP*a^2/(a+1), a = |p - target|/WIDTH — then the usual
    gumbel-argmax samples a token whose probability tracks the target. A
    running decayed average of SAMPLED probabilities adapts the target
    (host-side feedback; the generator's batched path feeds update())."""

    target: float = 1.0
    decay: float = 0.0
    weighted_sum: float = 0.0
    total_weight: float = 0.0

    WIDTH = 0.3
    PEAK = 5.0
    SHARP = 10.0

    def __post_init__(self):
        cd = max(min(self.decay, 0.99), 0.0)
        self.weighted_sum = self.target / (1.0 - cd)
        self.total_weight = 1.0 / (1.0 - cd)

    def adapted_target(self) -> float:
        t = min(max(self.target, 0.0), 1.0)
        if self.total_weight == 0.0:
            return t
        a = 2.0 * t - (self.weighted_sum / self.total_weight)
        return min(max(a, 0.0), 1.0)

    def update(self, sampled_prob: float) -> None:
        self.weighted_sum = sampled_prob + self.decay * self.weighted_sum
        self.total_weight = 1.0 + self.decay * self.total_weight

    def apply(self, logits, state):
        # NOTE: standalone path reads the adapted target at trace time;
        # the generator's batched path threads it as a per-row array
        t = state.get("adaptive_target", self.adapted_target())
        probs = jax.nn.softmax(
            jnp.where(logits <= NEG_INF / 2, NEG_INF, logits), axis=-1)
        a = jnp.abs(probs - t) / self.WIDTH
        faux = self.PEAK - self.SHARP * a * a / (a + 1.0)
        return jnp.where(probs < 1e-8, NEG_INF, faux)


@dataclass(frozen=True)
class Sampler:
    steps: tuple = ()
    greedy: bool = False

    def sample(self, logits, key, state=None):
        """logits: (B, V) -> token ids (B,) int32. Traceable."""
        state = state or {}
        if "xtc_key" not in state and any(isinstance(s, SS_XTC)
                                          for s in self.steps):
            key, xkey = jax.random.split(key)
            state["xtc_key"] = xkey
        x = logits.astype(jnp.float32)
        for s in self.steps:
            x = s.apply(x, state)
        if self.greedy:
            return jnp.argmax(x, axis=-1).astype(jnp.int32)
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(key, x.shape, minval=1e-20, maxval=1.0)
        ))
        masked = jnp.where(x <= NEG_INF / 2, NEG_INF, x + gumbel)
        return jnp.argmax(masked, axis=-1).astype(jnp.int32)


# -- presets (reference sampler/presets.py:3-137) -------------------------------


def GreedySampler() -> Sampler:
    return Sampler(steps=(), greedy=True)


def ArgmaxSampler() -> Sampler:
    return GreedySampler()


def DefaultSampler(temperature: float = 0.8, min_p: float = 0.08, rep_p: float = 1.01) -> Sampler:
    return CustomSampler(temperature=temperature, min_p=min_p, rep_p=rep_p)


def TopKSampler(top_k: int = 50, temperature: float = 0.8) -> Sampler:
    return CustomSampler(temperature=temperature, top_k=top_k)


def TopPSampler(top_p: float = 0.9, temperature: float = 0.8) -> Sampler:
    return CustomSampler(temperature=temperature, top_p=top_p)


def AdaptivePSampler(target: float = 0.3, decay: float = 0.9,
                     temperature: float = 1.0) -> Sampler:
    """Adaptive-P preset (reference presets.py): sampled-token probability
    tracks `target` via a decayed running average."""
    return CustomSampler(temperature=temperature, adaptive_p=target,
                         adaptive_decay=decay)


def CustomSampler(
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    rep_p: float = 1.0,
    presence_p: float = 0.0,
    frequency_p: float = 0.0,
    logit_bias: tuple = (),
    ban_tokens: tuple = (),
    adaptive_p: float = 1.0,
    adaptive_decay: float = 0.0,
) -> Sampler:
    steps: list = [SS_MaskApply()]
    if ban_tokens:
        steps.append(SS_BanTokens(tuple(ban_tokens)))
    if logit_bias:
        steps.append(SS_LogitBias(tuple(logit_bias)))
    if rep_p != 1.0:
        steps.append(SS_RepP(rep_p))
    if presence_p or frequency_p:
        steps.append(SS_PresFreqP(presence_p, frequency_p))
    if temperature != 1.0:
        steps.append(SS_Temperature(temperature))
    if top_k:
        steps.append(SS_TopK(top_k))
    if top_p < 1.0:
        steps.append(SS_TopP(top_p))
    if min_p > 0.0:
        steps.append(SS_MinP(min_p))
    if adaptive_p < 1.0:
        steps.append(SS_AdaptiveP(target=adaptive_p, decay=adaptive_decay))
    return Sampler(steps=tuple(steps))
