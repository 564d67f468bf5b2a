"""Rotary position embeddings: NEOX / GPTJ styles with HF scaling families
(default, linear, llama3, yarn, longrope).

Feature reference: /root/reference/exllamav3/util/rope.py (RopeSettings:17,
yarn_inv_freq:52, scaling families :172-183). Tables are computed with numpy
at load time; sin/cos for given positions are computed inside the jitted step
(cheap elementwise work XLA fuses into the attention prologue).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from enum import IntEnum

import numpy as np
import jax.numpy as jnp


class RopeStyle(IntEnum):
    NONE = 0
    GPTJ = 1
    NEOX = 2
    NANOCHAT = 3  # NEOX halves rotated in the opposite direction


@dataclass
class RopeSettings:
    head_dim: int = 128
    rope_theta: float = 10000.0
    rope_scaling: dict | None = None
    rotary_dim: int | None = None
    partial_rotary_factor: float = 1.0
    max_position_embeddings: int | None = None
    original_max_position_embeddings: int | None = None
    rope_style: RopeStyle = RopeStyle.NEOX
    attn_factor_override: float | None = None
    # DeepSeek-style YaRN: the attention factor is the RATIO of the mscale
    # computed with `mscale` over the one with `mscale_all_dim` (the latter is
    # folded into sm_scale by the architecture config instead).
    yarn_mscale_ratio: bool = False

    def rotary_width(self) -> int:
        if self.rotary_dim is not None:
            return self.rotary_dim
        return int(self.head_dim * self.partial_rotary_factor)


def _yarn_inv_freq(dim, base, rope_scaling, factor=None, orig_max_pos=None):
    pos_freqs = base ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    extrap = 1.0 / pos_freqs
    sc = rope_scaling or {}
    if factor is None:
        factor = float(sc["factor"])
    if orig_max_pos is None:
        orig_max_pos = int(sc["original_max_position_embeddings"])
    beta_fast = float(sc.get("beta_fast", 32))
    beta_slow = float(sc.get("beta_slow", 1))
    truncate = sc.get("truncate", True)

    def corr_dim(num_rot):
        return (dim * math.log(orig_max_pos / (num_rot * 2 * math.pi))) / (2 * math.log(base))

    low, high = corr_dim(beta_fast), corr_dim(beta_slow)
    if truncate:
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0), min(high, dim - 1)
    if low == high:
        high += 0.001
    ramp = (np.arange(dim // 2, dtype=np.float64) - low) / (high - low)
    extrap_factor = 1.0 - np.clip(ramp, 0, 1)
    interp = 1.0 / (factor * pos_freqs)
    return interp * (1 - extrap_factor) + extrap * extrap_factor


def _yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def compute_rope_params(settings: RopeSettings) -> tuple[np.ndarray, float]:
    """Return (inv_freq (rotary_width/2,) f64, attention_factor)."""
    dim = settings.rotary_width()
    base = settings.rope_theta
    sc = settings.rope_scaling
    attn_factor = 1.0
    if sc is None:
        inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    else:
        rt = sc.get("rope_type", sc.get("type", "default"))
        if rt in ("default", "mrope"):
            inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        elif rt == "linear":
            factor = float(sc["factor"])
            inv_freq = 1.0 / (factor * base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        elif rt == "dynamic":
            factor = float(sc["factor"])
            mpe = settings.max_position_embeddings or 2048
            base2 = base * ((factor * mpe / mpe) - (factor - 1)) ** (dim / (dim - 2))
            inv_freq = 1.0 / (base2 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        elif rt == "llama3":
            factor = float(sc["factor"])
            lo_factor = float(sc.get("low_freq_factor", 1.0))
            hi_factor = float(sc.get("high_freq_factor", 4.0))
            old_len = float(sc.get("original_max_position_embeddings", 8192))
            inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
            low_wl = old_len / lo_factor
            high_wl = old_len / hi_factor
            wavelen = 2 * math.pi / inv_freq
            inv_llama = np.where(wavelen > low_wl, inv_freq / factor, inv_freq)
            smooth = (old_len / wavelen - lo_factor) / (hi_factor - lo_factor)
            smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
            is_mid = (wavelen < low_wl) & (wavelen > high_wl)
            inv_freq = np.where(is_mid, smoothed, inv_llama)
        elif rt == "yarn":
            inv_freq = _yarn_inv_freq(dim, base, sc)
            factor = float(sc["factor"])
            mscale = float(sc.get("mscale", 1.0))
            attn_factor_cfg = sc.get("attention_factor")
            if settings.yarn_mscale_ratio:
                msad = float(sc.get("mscale_all_dim", 0.0))
                attn_factor = (
                    _yarn_mscale(factor, mscale) / _yarn_mscale(factor, msad)
                    if msad else _yarn_mscale(factor, mscale)
                )
            elif attn_factor_cfg is not None:
                attn_factor = float(attn_factor_cfg)
            else:
                attn_factor = _yarn_mscale(factor, mscale)
        elif rt == "longrope":
            mpe = settings.max_position_embeddings or 2048
            orig = int(
                sc.get(
                    "original_max_position_embeddings",
                    settings.original_max_position_embeddings or mpe,
                )
            )
            factor = mpe / orig
            ext = np.array(sc["long_factor" if factor > 1.0 else "short_factor"], dtype=np.float64)
            inv_freq = 1.0 / (ext * base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
            if factor > 1.0:
                attn_factor = math.sqrt(1 + math.log(factor) / math.log(orig))
        else:
            raise ValueError(f"unsupported rope_type {rt}")
    if settings.attn_factor_override is not None:
        attn_factor = settings.attn_factor_override
    return inv_freq.astype(np.float64), float(attn_factor)


class Rope:
    """Precomputed RoPE application for a fixed head_dim/settings."""

    def __init__(self, settings: RopeSettings):
        self.settings = settings
        self.style = settings.rope_style
        inv_freq, attn_factor = compute_rope_params(settings)
        self.inv_freq = inv_freq  # (rot/2,)
        self.attn_factor = attn_factor
        self.rot = settings.rotary_width()
        # MRoPE (Qwen-VL family): frequency channels are partitioned into
        # (t, h, w) sections; each channel's angle uses its section's
        # position stream (HF rope_scaling.mrope_section)
        sc = settings.rope_scaling or {}
        self.mrope_sections = sc.get("mrope_section")

    def sin_cos(self, positions: jnp.ndarray):
        """positions: (...,) int32 -> sin/cos (..., rot/2) f32, with the
        yarn/longrope attention factor folded in."""
        inv = jnp.asarray(self.inv_freq, dtype=jnp.float32)
        ang = positions.astype(jnp.float32)[..., None] * inv[None, :]
        return (
            jnp.sin(ang) * self.attn_factor,
            jnp.cos(ang) * self.attn_factor,
        )

    def sin_cos_mrope(self, positions3: jnp.ndarray):
        """positions3 (..., 3) int32 (t, h, w streams) -> sin/cos
        (..., rot/2) with per-channel stream selection. Text-only inputs
        (all three streams equal) reduce exactly to sin_cos."""
        import numpy as _np

        sec = self.mrope_sections
        sel = _np.repeat(_np.arange(len(sec)), sec)[: self.rot // 2]
        inv = jnp.asarray(self.inv_freq, dtype=jnp.float32)
        pos_c = positions3[..., jnp.asarray(sel)]  # (..., rot/2)
        ang = pos_c.astype(jnp.float32) * inv
        return (jnp.sin(ang) * self.attn_factor,
                jnp.cos(ang) * self.attn_factor)

    def apply(self, x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
        """x: (..., seq, heads, head_dim); sin/cos: (..., seq, rot/2)."""
        if self.style == RopeStyle.NONE:
            return x
        rot = self.rot
        xf = x.astype(jnp.float32)
        x_rot, x_pass = xf[..., :rot], xf[..., rot:]
        s = sin[..., :, None, :]
        c = cos[..., :, None, :]
        if self.style in (RopeStyle.NEOX, RopeStyle.NANOCHAT):
            x1, x2 = x_rot[..., : rot // 2], x_rot[..., rot // 2 :]
            if self.style == RopeStyle.NANOCHAT:
                s = -s  # reference rope.cu ROPESTYLE_NANOCHAT: opposite spin
            o1 = x1 * c - x2 * s
            o2 = x2 * c + x1 * s
            out = jnp.concatenate([o1, o2], axis=-1)
        else:  # GPTJ: interleaved pairs
            x1 = x_rot[..., 0::2]
            x2 = x_rot[..., 1::2]
            o1 = x1 * c - x2 * s
            o2 = x2 * c + x1 * s
            out = jnp.stack([o1, o2], axis=-1).reshape(x_rot.shape)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out.astype(x.dtype)
