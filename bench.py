"""Benchmark: single-sequence greedy decode throughput on a synthetic
EXL3-quantized Llama-class model (real checkpoints are unreachable from this
environment; synthetic trellis streams exercise the identical compute path).

Prints ONE JSON line:
  {"metric": "decode_tok_s", "value": N, "unit": "tok/s",
   "vs_baseline": N, ...detail fields}

vs_baseline = measured / HBM-roofline estimate for the active runtime
representation (weights-bytes / HBM bandwidth per token), i.e. 1.0 means
memory-bound decode, the reference's own headline claim (README.md:174).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v4": 1228.0, "TPU v5p": 2765.0}


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    dev = jax.devices()[0]
    hbm_gbps = 819.0
    for k, v in HBM_GBPS.items():
        if k.lower() in str(dev.device_kind).lower():
            hbm_gbps = v

    from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
    from exllamav3_tpu.model import Config, Model, InferParams, Cache, CacheSpec

    if on_tpu:
        cfg = tiny_llama_cfg(
            vocab_size=32768, hidden_size=2048, intermediate_size=8192,
            num_layers=16, num_q_heads=32, num_kv_heads=8, head_dim=64,
        )
        mode = os.environ.get("EXL3TPU_BENCH_MODE", "int8")
        decode_steps = 128
    else:
        cfg = tiny_llama_cfg(
            vocab_size=2048, hidden_size=512, intermediate_size=1024,
            num_layers=4, num_q_heads=8, num_kv_heads=4,
        )
        mode = "int8"
        decode_steps = 16

    import tempfile

    d = os.path.join(tempfile.gettempdir(), f"exl3tpu_bench_{cfg['hidden_size']}")
    if not os.path.exists(os.path.join(d, "config.json")):
        write_tiny_llama_exl3(d, cfg, K=4, seed=0)

    t0 = time.time()
    config = Config.from_directory(d, infer_params=InferParams(linear_mode=mode))
    model = Model.from_config(config)
    model.load()
    load_s = time.time() - t0

    # weight bytes actually read per decode step (active runtime representation)
    wbytes = 0
    for key, grp in model.params.items():
        for name, arr in grp.items():
            if name in ("weight", "weight_q", "trellis", "qkv_w", "qkv_q",
                        "gate_up_w", "gate_up_q", "words"):
                wbytes += arr.size * arr.dtype.itemsize
    roofline_tok_s = hbm_gbps * 1e9 / max(wbytes, 1)

    B, S = 1, 128
    cache = Cache(model, CacheSpec(layout="linear", batch_size=B,
                                   max_len=S + 8 + 3 * decode_steps))
    step = model.jitted_step("dense", donate_cache=True)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg["vocab_size"], size=(B, S)).astype(np.int32)
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S)).copy()

    # prefill
    t0 = time.time()
    logits, cache.state = step(model.params, jnp.asarray(ids), cache.state,
                               jnp.asarray(pos), jnp.zeros(B, jnp.int32), None)
    logits.block_until_ready()
    prefill_s = time.time() - t0

    # decode: greedy steps chained inside one jitted scan, so the measurement
    # reflects device throughput (host dispatch through the axon tunnel adds
    # ~ms/step that on-host serving would not pay)
    step_fn = model.step_fn("dense")

    def scan_decode(params, tok, state, t0_):
        def body(carry, i):
            tok, state = carry
            t = t0_ + i
            pos_t = jnp.full((B, 1), 0, jnp.int32) + t
            logits, state = step_fn(params, tok, state, pos_t,
                                    jnp.full(B, 0, jnp.int32) + t, None)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return (nxt, state), nxt[:, 0]

        (tok, state), toks = jax.lax.scan(body, (tok, state), jnp.arange(decode_steps))
        return tok, state, toks

    scan_decode_j = jax.jit(scan_decode, donate_argnums=(2,))
    tok = jnp.asarray(ids[:, -1:])
    tok, cache.state, toks = scan_decode_j(model.params, tok, cache.state,
                                           jnp.int32(S))
    np.asarray(toks)  # device_get forces a full flush (block_until_ready
    # best of 3 (axon tunnel RTT jitter)      # alone does not always wait)
    dt = float("inf")
    base = S
    for r in range(3):
        t0 = time.time()
        tok, cache.state, toks = scan_decode_j(
            model.params, tok, cache.state,
            jnp.int32(base + (r + 1) * decode_steps))
        np.asarray(toks)
        dt = min(dt, time.time() - t0)
    tok_s = decode_steps / dt

    # serving-shaped extras: batched decode aggregate and prefill throughput
    batch_tok_s = prefill_tok_s = 0.0
    if on_tpu:
        BB = 8
        cache_b = Cache(model, CacheSpec(layout="linear", batch_size=BB,
                                         max_len=S + 8 + 3 * decode_steps))
        B = BB  # scan_decode closes over B

        def scan_decode_b(params, tok, state, t0_):
            return scan_decode(params, tok, state, t0_)

        scan_b = jax.jit(scan_decode_b, donate_argnums=(2,))
        ids_b = rng.integers(0, cfg["vocab_size"], size=(BB, S)).astype(np.int32)
        pos_b = np.broadcast_to(np.arange(S, dtype=np.int32), (BB, S)).copy()
        _, cache_b.state = step(model.params, jnp.asarray(ids_b), cache_b.state,
                                jnp.asarray(pos_b), jnp.zeros(BB, jnp.int32),
                                None)
        tok_b = jnp.asarray(ids_b[:, -1:])
        tok_b, cache_b.state, toks_b = scan_b(model.params, tok_b,
                                              cache_b.state, jnp.int32(S))
        np.asarray(toks_b)
        dtb = float("inf")
        for r in range(3):
            t0 = time.time()
            tok_b, cache_b.state, toks_b = scan_b(
                model.params, tok_b, cache_b.state,
                jnp.int32(S + (r + 1) * decode_steps))
            np.asarray(toks_b)
            dtb = min(dtb, time.time() - t0)
        batch_tok_s = BB * decode_steps / dtb
        B = 1

        # prefill throughput: 2048 tokens, steady state (pre-compiled shape)
        Sp = 2048
        cache_p = Cache(model, CacheSpec(layout="linear", batch_size=1,
                                         max_len=Sp + 8))
        ids_p = rng.integers(0, cfg["vocab_size"], size=(1, Sp)).astype(np.int32)
        pos_p = np.broadcast_to(np.arange(Sp, dtype=np.int32), (1, Sp)).copy()
        lp, cache_p.state = step(model.params, jnp.asarray(ids_p),
                                 cache_p.state, jnp.asarray(pos_p),
                                 jnp.zeros(1, jnp.int32), None)
        np.asarray(lp[:, -1, :8])
        # best of 3: a single dispatch through the axon tunnel carries tens
        # of ms of RTT jitter that would swamp the 2048-token compute
        best = float("inf")
        for _ in range(3):
            cache_p.reset()
            t0 = time.time()
            lp, cache_p.state = step(model.params, jnp.asarray(ids_p),
                                     cache_p.state, jnp.asarray(pos_p),
                                     jnp.zeros(1, jnp.int32), None)
            np.asarray(lp[:, -1, :8])
            best = min(best, time.time() - t0)
        prefill_tok_s = Sp / best

    print(json.dumps({
        "metric": "decode_tok_s",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / roofline_tok_s, 4),
        "detail": {
            "model": f"synthetic llama h{cfg['hidden_size']} L{cfg['num_hidden_layers']} 4bpw",
            "runtime_mode": mode,
            "backend": backend,
            "device": str(dev.device_kind),
            "weight_bytes": wbytes,
            "roofline_tok_s": round(roofline_tok_s, 2),
            "prefill_s_128tok_incl_compile": round(prefill_s, 3),
            "batch8_decode_tok_s": round(batch_tok_s, 2),
            "prefill_tok_s_2048": round(prefill_tok_s, 2),
            "load_s": round(load_s, 2),
        },
    }))


if __name__ == "__main__":
    main()
