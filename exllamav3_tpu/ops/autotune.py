"""Shape-keyed block-size autotune for the fused EXL3 Pallas GEMM.

Feature reference: /root/reference/exllamav3/exllamav3_ext/quant/
coop_autotune.cu:54-80 (on-disk autotune cache keyed by shape hash,
EXLLAMAV3_TUNE_CACHE). TPU version: sweep a small candidate set of
(block_m, block_n, block_k) for each distinct (m_bucket, k, n, K, cb) the
fused kernel sees, time them on the real device with the tunnel RTT
cancelled, and persist winners to a JSON cache.

Opt-in via EXL3_TPU_AUTOTUNE=1 (each first-seen shape costs a few kernel
compiles); the cache persists at EXL3_TPU_TUNE_CACHE (default
~/.cache/exl3tpu/tune.json), so production serving pays the sweep once per
shape per device generation.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

from ..util.env import env_bool, env_str

_CACHE: dict | None = None
_DIRTY = False


def _cache_path() -> str:
    return env_str("EXL3_TPU_TUNE_CACHE",
                   os.path.expanduser("~/.cache/exl3tpu/tune.json"))


def _load_cache() -> dict:
    global _CACHE
    if _CACHE is None:
        try:
            with open(_cache_path()) as f:
                _CACHE = json.load(f)
        except Exception:
            _CACHE = {}
    return _CACHE


def _save_cache() -> None:
    path = _cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(_CACHE, f)
    os.replace(tmp, path)


def _key(m_bucket: int, k: int, n: int, K: int, cb: int, device: str) -> str:
    return f"{device}|m{m_bucket}|k{k}|n{n}|K{K}|cb{cb}"


def _candidates(m_bucket: int, k: int, n: int):
    """Small, legal candidate set: block dims must divide the tensor dims."""
    cands = []
    # bm descending: the 16-candidate cap must not drop the large-bm
    # configs that win at prefill m_buckets
    for bm in (128, 64, 32, 16):
        if bm > m_bucket and bm != m_bucket:
            continue
        # wide-n blocks measured fastest at decode shapes (fewer grid steps
        # amortize the per-block DMA/assembly; tools/fused_ablate.py r5:
        # bn=1024 beat bn=256 by ~6% at m=16 k=n=4096)
        for bn in (128, 256, 512, 1024):
            if n % bn:
                continue
            for bk in (128, 256, 512):
                if k % bk:
                    continue
                cands.append((min(bm, m_bucket), bn, bk))
    # dedupe, keep a bounded sweep
    seen, out = set(), []
    for c in cands:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out[:16] or [(min(16, m_bucket), 256 if n % 256 == 0 else 128,
                         256 if k % 256 == 0 else 128)]


def _time_config(words, m_bucket, k, K, cb, bm, bn, bk) -> float:
    """Median per-call seconds via the scan-difference method (the axon
    relay caches identical executions and RTT dominates single dispatch)."""
    import jax
    import jax.numpy as jnp
    import functools
    from .exl3_gemm import exl3_gemm_core

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(x, w, reps):
        def body(c, _):
            y = exl3_gemm_core(c, w, K, cb, block_m=bm, block_n=bn,
                               block_k=bk)
            d = jnp.max(jnp.abs(y)) * 1e-12
            return c + d.astype(c.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m_bucket, k)).astype(np.float32),
                    dtype=jnp.bfloat16)
    reps = 20

    def run(r):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            np.asarray(loop(x, words, r)[0, :8])
            best = min(best, time.time() - t0)
        return best

    run(reps)
    run(4 * reps)
    return max(run(4 * reps) - run(reps), 1e-9) / (3 * reps)


def best_blocks(m_bucket: int, k: int, n: int, K: int, cb: int,
                words=None) -> tuple | None:
    """-> (block_m, block_n, block_k) for this shape, or None (defaults).
    Sweeps + caches on first sight when EXL3_TPU_AUTOTUNE=1 and a cached
    winner is returned on every platform once present."""
    global _DIRTY
    import jax

    device = str(jax.devices()[0].device_kind)
    cache = _load_cache()
    key = _key(m_bucket, k, n, K, cb, device)
    hit = cache.get(key)
    if hit is not None:
        return tuple(hit)
    if not env_bool("EXL3_TPU_AUTOTUNE") or jax.default_backend() == "cpu":
        return None
    if words is None:
        return None
    best, best_t = None, float("inf")
    for bm, bn, bk in _candidates(m_bucket, k, n):
        try:
            t = _time_config(words, m_bucket, k, K, cb, bm, bn, bk)
        except Exception:
            continue
        if t < best_t:
            best, best_t = (bm, bn, bk), t
    if best is None:
        return None
    cache[key] = list(best)
    _DIRTY = True
    try:
        _save_cache()
    except Exception:
        pass
    return best
