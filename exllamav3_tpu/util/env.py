"""Environment-variable tuning surface.

Feature reference: /root/reference/doc/env_vars.md (the reference documents
~60 env knobs for kernel selection, tuning caches and debug probes). The TPU
build needs far fewer — XLA replaces most hand-tuning — but the surface that
remains is centralized here and documented in doc/env_vars.md.
"""
from __future__ import annotations

import os


def env_str(name: str, default: str) -> str:
    return os.environ.get(name, default)


def env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return default if v is None else int(v)


def env_bool(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() not in ("", "0", "false", "no", "off")


def attn_backend(k_bits: int = 0, v_bits: int = 0) -> str:
    """Resolve the attention implementation for the current platform.

    EXL3_TPU_ATTN = auto (default: Pallas kernel on TPU, jnp dense on CPU) |
    flash (force compiled kernel) | interpret (force kernel in interpret
    mode — CPU testing) | dense (force the jnp reference path).
    Returns "flash" | "interpret" | "dense". All quantized-cache widths
    (2-8 bits) run in-kernel (odd widths via bit-plane decomposition).
    """
    mode = env_str("EXL3_TPU_ATTN", "auto")
    if mode == "dense":
        return "dense"
    if k_bits or v_bits:
        from ..ops.flash_attention import flash_supported

        if not flash_supported(k_bits, v_bits):
            return "dense"
    if mode in ("flash", "interpret"):
        return mode
    import jax

    return "flash" if jax.default_backend() not in ("cpu",) else "dense"


def mlp_backend() -> str:
    """Resolve the decode-MLP implementation.

    EXL3_TPU_MLP = auto (default: the single-launch fused kernel on TPU —
    measured 102.4 vs 96.3 tok/s int8 decode at 8B geometry, 92.4% vs 87%
    of the HBM roofline, 2026-08-18 — XLA three-dot path on CPU) |
    fused (force ops/fused_mlp.py) | interpret (kernel in interpret mode —
    CPU testing) | xla (three dots).
    """
    mode = env_str("EXL3_TPU_MLP", "auto")
    if mode in ("fused", "interpret", "xla"):
        return mode
    import jax

    return "fused" if jax.default_backend() not in ("cpu",) else "xla"


def moe_backend() -> str:
    """Resolve the MoE decode implementation.

    EXL3_TPU_MOE = auto (default: selected-expert Pallas kernel on TPU,
    dense-all on CPU) | selected (force kernel) | interpret (kernel in
    interpret mode — CPU testing) | dense (force the einsum-all-experts
    path; required under expert-parallel GSPMD sharding, where the stacked
    weights are split across the mesh and XLA partitions the einsum).
    """
    mode = env_str("EXL3_TPU_MOE", "auto")
    if mode in ("selected", "interpret", "dense"):
        return mode
    import jax

    return "selected" if jax.default_backend() not in ("cpu",) else "dense"
