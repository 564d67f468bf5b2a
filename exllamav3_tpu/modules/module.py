"""Module tree: metadata nodes over a functional parameter pytree.

TPU-native redesign of the reference Module ABC
(/root/reference/exllamav3/modules/module.py:14). The reference mutates
device-resident tensors per module; here every module is a *static*
description: `load()` fills a flat params dict (key -> dict of jnp arrays),
and `forward(x, params, ctx)` is pure/traceable so the whole model step can
be jit-compiled and sharded with GSPMD. CUDA-graph capture (BC_* classes) has
no equivalent because jit compilation subsumes it.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp


@dataclass
class ForwardCtx:
    """Per-call context threaded through module forwards. Traceable fields
    only (the cache object encapsulates functional state updates)."""

    positions: jnp.ndarray | None = None  # (B, S) int32 token positions
    attn_mode: str = "dense"  # "dense" | "paged"
    cache: Any = None  # Cache adapter (see model/cache.py)
    k_bits: int = 0  # quantized-cache bit widths (0 = unquantized); static
    v_bits: int = 0
    compand_a: float = 0.0  # cubic-compander coefficient (0 = midpoint grid)
    block_tables: jnp.ndarray | None = None  # (B, max_pages) int32, paged mode
    cache_seqlens: jnp.ndarray | None = None  # (B,) int32 tokens already cached
    # stable per-sequence slots for recurrent layer state (GDN/Mamba2/SWA);
    # None -> row index. The generator passes its job slots here.
    state_slots: jnp.ndarray | None = None  # (B,) int32
    # non-traceable extras (Hessian capture, stats) — only used in eager mode
    capture: dict | None = None
    # traced Hessian capture: Linears append their (tokens, k) input here so
    # a JITTED capture pass can contract H = x^T x on device (one dispatch
    # per row chunk; rows shard over a dp mesh axis under GSPMD — the
    # reference's conversion data parallelism, convert_model.py:976-984)
    capture_dev: dict | None = None
    extras: dict = field(default_factory=dict)


class Module:
    def __init__(self, config, key: str, qmap: str | None = None):
        self.config = config
        self.key = key
        self.qmap = qmap
        self.modules: list[Module] = []
        self.caps: dict = {}

    # -- loading -----------------------------------------------------------

    def load(self, params: dict) -> None:
        """Populate params[self.key] (and children's keys) from config.stc."""
        for m in self.modules:
            m.load(params)

    def unload(self, params: dict) -> None:
        params.pop(self.key, None)
        for m in self.modules:
            m.unload(params)

    # -- execution ----------------------------------------------------------

    def forward(self, x, params: dict, ctx: ForwardCtx):
        for m in self.modules:
            x = m.forward(x, params, ctx)
        return x

    # -- introspection -------------------------------------------------------

    def walk(self):
        yield self
        for m in self.modules:
            yield from m.walk()

    def find(self, key: str) -> Optional["Module"]:
        for m in self.walk():
            if m.key == key:
                return m
        return None

    def __repr__(self):
        return f"<{self.__class__.__name__} {self.key}>"
