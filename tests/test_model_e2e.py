"""End-to-end: synthetic EXL3 checkpoint -> load -> forward -> cache parity.

Checks that (1) the EXL3 runtime representations agree with each other,
(2) incremental decode with KV cache reproduces cacheless full-sequence
logits (attention/RoPE/cache correctness), (3) paged attention matches
linear-cache attention.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.fast

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec, InferParams
from exllamav3_tpu.modules.module import ForwardCtx
from exllamav3_tpu.constants import PAGE_SIZE


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_llama")
    write_tiny_llama_exl3(str(d))
    return str(d)


def _load(ckpt, mode):
    config = Config.from_directory(ckpt, infer_params=InferParams(linear_mode=mode))
    model = Model.from_config(config)
    model.load()
    return model


def test_runtime_modes_agree(ckpt):
    ids = np.array([[1, 5, 9, 13, 200, 37, 4, 2]], dtype=np.int32)
    logits = {}
    for mode in ("reconstruct", "bf16", "int8", "int4", "fused"):
        model = _load(ckpt, mode)
        logits[mode] = np.asarray(model.forward_simple(ids))
    ref = logits["reconstruct"]
    assert np.isfinite(ref).all()
    for mode in ("bf16", "int8", "fused"):
        # bf16/int8 reps add bounded rounding noise on top of identical math
        err = np.abs(logits[mode] - ref)
        scale = np.abs(ref).max()
        assert err.max() < 0.05 * scale, (mode, err.max(), scale)
    # int4 requant is a genuinely coarser representation (~0.093 weight-rms
    # noise, the scalar-int4 floor — per-layer check below). On this
    # UNTRAINED random checkpoint the per-layer noise compounds through
    # every block with no trained signal to dominate it: measured logit
    # rel-rms ~0.36. Bound at 0.5 so the check still catches wiring bugs
    # (swapped nibbles / wrong scales blow past 1.0) without asserting a
    # quality this representation does not have on random weights.
    rel = np.sqrt(((logits["int4"] - ref) ** 2).mean() / (ref**2).mean())
    assert rel < 0.5, ("int4", rel)


def test_int4_per_layer_weight_noise(ckpt):
    """The load-time trellis->int4 requant must sit at the scalar-int4
    noise floor (~0.093 of weight rms for Lloyd-refined group-32); anything
    materially above that is a packing/scale wiring bug."""
    from exllamav3_tpu.ops.q_matmul import int4_unpack_jnp

    mref = _load(ckpt, "bf16")
    m4 = _load(ckpt, "int4")
    checked = 0
    for key, p in m4.params.items():
        if "weight_q4" not in p:
            continue
        w4 = np.asarray(int4_unpack_jnp(p["weight_q4"], p["scale4"]))
        wr = np.asarray(mref.params[key]["weight"]).astype(np.float32)
        rel = np.sqrt(((w4 - wr) ** 2).mean() / (wr**2).mean())
        assert rel < 0.11, (key, rel)
        checked += 1
    assert checked >= 3


def test_cache_decode_matches_full_forward(ckpt):
    model = _load(ckpt, "bf16")
    rng = np.random.default_rng(0)
    B, S = 2, 12
    ids = rng.integers(0, 500, size=(B, S)).astype(np.int32)

    full = np.asarray(model.forward_simple(ids))  # (B, S, V)

    spec = CacheSpec(layout="linear", batch_size=B, max_len=32)
    cache = Cache(model, spec)
    step = model.jitted_step("dense", donate_cache=False)

    # prefill first 5 tokens, then decode one at a time
    pos = np.broadcast_to(np.arange(5, dtype=np.int32), (B, 5))
    logits, cache.state = step(model.params, jnp.asarray(ids[:, :5]), cache.state,
                               jnp.asarray(pos), jnp.zeros(B, jnp.int32), None)
    out = [np.asarray(logits)]
    for t in range(5, S):
        pos_t = np.full((B, 1), t, dtype=np.int32)
        logits, cache.state = step(model.params, jnp.asarray(ids[:, t : t + 1]),
                                   cache.state, jnp.asarray(pos_t),
                                   jnp.full(B, t, jnp.int32), None)
        out.append(np.asarray(logits))
    inc = np.concatenate(out, axis=1)
    np.testing.assert_allclose(inc, full, rtol=0.05, atol=0.05 * np.abs(full).max())
    # argmax agreement is the real requirement
    assert (inc.argmax(-1) == full.argmax(-1)).mean() > 0.95


def test_paged_matches_linear(ckpt):
    model = _load(ckpt, "bf16")
    rng = np.random.default_rng(1)
    B, S = 2, 9
    ids = rng.integers(0, 500, size=(B, S)).astype(np.int32)
    full = np.asarray(model.forward_simple(ids))

    num_pages = 8
    spec = CacheSpec(layout="paged", num_pages=num_pages)
    cache = Cache(model, spec)
    # give each sequence 2 pages
    block_tables = np.array([[1, 2], [3, 4]], dtype=np.int32)
    step = model.jitted_step("paged", donate_cache=False)
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S))
    logits, cache.state = step(model.params, jnp.asarray(ids), cache.state,
                               jnp.asarray(pos), jnp.zeros(B, jnp.int32),
                               jnp.asarray(block_tables))
    got = np.asarray(logits)
    np.testing.assert_allclose(got, full, rtol=0.05, atol=0.05 * np.abs(full).max())
