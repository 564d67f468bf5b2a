#!/usr/bin/env python
"""Quantization-error attribution by single-module swap (feature reference:
/root/reference/eval/model_diff_attrib.py).

Runs the *reference* model (B) but substitutes the quantized module (from A)
for exactly one top-level module at a time; the KL divergence of the result
against the clean reference isolates that module's marginal contribution to
the end-to-end error, propagated through an otherwise noise-free network.
Because one full forward per module would be expensive, the reference pass
caches the residual stream at every module boundary and each experiment only
runs the suffix from the swap point.

To the extent per-module contributions add up to the full-model KLD (the
additivity ratio), the output is a per-module error budget in units of the
final metric — unlike per-layer state drift, which conflates injected with
propagated noise.

With --iso, each swap is followed by a control that replaces the real
quantization error at the swap output with Gaussian noise of identical
per-token norm. kld/kld_iso ≈ 1 means the error is effectively isotropic
(only more bits help); >> 1 means direction-aligned error a better
quantization objective could avoid.

The functional JAX design makes the reference's clone discipline unnecessary:
boundary states are immutable arrays, and "swap module i" is simply calling
A's module forward with A's params pytree on B's cached input.

    python eval/model_diff_attrib.py -ma <quant_dir> -mb <ref_dir> \
        [--mode_a int4] [--mode_b reconstruct] [-r 4] [-l 512] [--iso]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from model_diff import token_kld  # noqa: E402


def _fresh_ctx(positions, ids):
    from exllamav3_tpu.modules.module import ForwardCtx

    ctx = ForwardCtx(positions=positions)
    ctx.extras["input_ids"] = ids
    return ctx


def reference_pass(model_b, ids_rows):
    """Full reference forwards caching the input state to every module and
    the final logits. boundary[i][r] is the input of module i for row r."""
    import jax.numpy as jnp

    num_mods = len(model_b.modules)
    boundary = [[] for _ in range(num_mods)]
    ref_logits = []
    for ids in ids_rows:
        B, S = ids.shape
        positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
        jids = jnp.asarray(ids)
        ctx = _fresh_ctx(positions, jids)
        x = jids
        for i, m in enumerate(model_b.modules):
            boundary[i].append(x)
            x = m.forward(x, model_b.params, ctx)
        ref_logits.append(np.asarray(x, dtype=np.float32))
    return boundary, ref_logits


def suffix_kld(model_b, start_idx, start_states, ids_rows, ref_logits):
    """Forward every row from module start_idx to the end through model B,
    returning the mean per-token KLD vs the cached reference logits."""
    import jax.numpy as jnp

    klds = []
    for r, x in enumerate(start_states):
        ids = ids_rows[r]
        B, S = ids.shape
        positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
        ctx = _fresh_ctx(positions, jnp.asarray(ids))
        for m in model_b.modules[start_idx:]:
            x = m.forward(x, model_b.params, ctx)
        klds.append(float(np.mean(token_kld(ref_logits[r], np.asarray(x, np.float32)))))
    return float(np.mean(klds))


def attribute(model_a, model_b, ids_rows, iso: bool = False, seed: int = 0):
    import jax.numpy as jnp

    mods_a, mods_b = model_a.modules, model_b.modules
    assert len(mods_a) == len(mods_b), (
        f"module trees differ: {len(mods_a)} vs {len(mods_b)} — attribution "
        "requires structurally identical architectures")
    num_mods = len(mods_b)

    boundary, ref_logits = reference_pass(model_b, ids_rows)

    # end-to-end error of the full quantized model (the budget to explain)
    full_klds = []
    for r, ids in enumerate(ids_rows):
        la = np.asarray(model_a.forward_simple(ids), np.float32)
        full_klds.append(float(np.mean(token_kld(ref_logits[r], la))))
    kld_full = float(np.mean(full_klds))

    rng = np.random.default_rng(seed)
    rows_out = []
    for i in range(num_mods):
        # no-swap control: restart from the cached boundary through B only —
        # must be exactly 0 or the restart machinery is broken
        ctrl = suffix_kld(model_b, i, boundary[i], ids_rows, ref_logits)

        # swap: module i runs as model A (its params + runtime mode)
        swapped, iso_states = [], []
        for r in range(len(ids_rows)):
            ids = ids_rows[r]
            B, S = ids.shape
            positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
            ctx_a = _fresh_ctx(positions, jnp.asarray(ids))
            xa = mods_a[i].forward(boundary[i][r], model_a.params, ctx_a)
            swapped.append(xa)
            if iso:
                # clean output of module i: next boundary, or the reference
                # logits for the final module (where the reference observed
                # the strongest direction-aligned error)
                clean = (boundary[i + 1][r] if i + 1 < num_mods
                         else ref_logits[r])
                err = np.asarray(xa, np.float32) - np.asarray(clean, np.float32)
                eps = np.linalg.norm(err, axis=-1, keepdims=True)
                n = rng.standard_normal(err.shape).astype(np.float32)
                n = n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-20) * eps
                iso_states.append(jnp.asarray(np.asarray(clean, np.float32) + n))
        kld_i = suffix_kld(model_b, i + 1, swapped, ids_rows, ref_logits)

        kld_iso = None
        if iso and iso_states:
            kld_iso = suffix_kld(model_b, i + 1, iso_states, ids_rows, ref_logits)
        rows_out.append({
            "module": mods_b[i].key, "kld": kld_i, "ctrl": ctrl,
            "kld_iso": kld_iso,
        })
    return kld_full, rows_out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-ma", "--model_a", required=True, help="quantized model dir")
    p.add_argument("-mb", "--model_b", required=True, help="reference model dir")
    p.add_argument("--mode_a", default="auto")
    p.add_argument("--mode_b", default="auto")
    p.add_argument("-r", "--rows", type=int, default=4)
    p.add_argument("-l", "--length", type=int, default=512)
    p.add_argument("-t", "--text", help="evaluation text file")
    p.add_argument("--iso", action="store_true",
                   help="per-module isotropic-noise control")
    args = p.parse_args()

    from exllamav3_tpu.model import Config, Model, InferParams
    from exllamav3_tpu.tokenizer import Tokenizer
    from exllamav3_tpu.conversion.calibration import get_calibration

    def load(d, mode):
        m = Model.from_config(Config.from_directory(
            d, infer_params=InferParams(linear_mode=mode)))
        m.load()
        return m

    model_a = load(args.model_a, args.mode_a)
    model_b = load(args.model_b, args.mode_b)
    tokenizer = None
    try:
        tokenizer = Tokenizer(args.model_a)
    except Exception:
        pass
    rows = get_calibration(tokenizer, rows=args.rows, length=args.length,
                           text_files=[args.text] if args.text else None,
                           vocab_size=model_a.config.vocab_size)
    ids_rows = [rows[i : i + 1].astype(np.int32) for i in range(rows.shape[0])]

    kld_full, table = attribute(model_a, model_b, ids_rows, iso=args.iso)
    total = sum(r["kld"] for r in table)
    print(f"full-model KLD: {kld_full:.6f}")
    print(f"sum of per-module contributions: {total:.6f} "
          f"(additivity ratio {total / max(kld_full, 1e-12):.3f})")
    hdr = f"{'module':40s} {'kld':>10s} {'ctrl':>10s}"
    if args.iso:
        hdr += f" {'kld_iso':>10s} {'ratio':>8s}"
    print(hdr)
    for r in table:
        line = f"{r['module']:40s} {r['kld']:10.6f} {r['ctrl']:10.6f}"
        if args.iso and r["kld_iso"] is not None:
            ratio = r["kld"] / max(r["kld_iso"], 1e-12)
            line += f" {r['kld_iso']:10.6f} {ratio:8.2f}"
        print(line)


if __name__ == "__main__":
    main()
