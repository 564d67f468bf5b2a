"""Model conversion driver: dense HF checkpoint -> EXL3.

Feature reference: /root/reference/exllamav3/conversion/convert_model.py
(main:879 — per-module loop: load unquantized, capture Hessians over
calibration rows, quantize linears, advance reference state, save shard,
timed resumable checkpoint) and convert.py CLI.

TPU architecture: the forward passes (capture + state advance) run as jitted
module forwards on the TPU; the Viterbi tile search runs batched on the TPU
through quant/quantize.py's jnp backend; the LDLQ recursion's small matmuls
run in numpy on host. Conversion is resumable via a job_state.json +
per-module qtensors shards, like the reference.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np
import jax

from ..model.config import Config
from ..model.model import Model
from ..modules.module import ForwardCtx
from ..modules.linear import Linear
from ..quant.quantize import HessianData, quantize_exl3_np
from ..quant.codebook import CB_3INST, CB_MCG, CB_MUL1
from ..loader.safetensors import save_file, f32_to_bf16_u16
from .allocation import QGroup, create_q_strategy
from .calibration import get_calibration
from .compile import compile_model

import jax.numpy as jnp


def convert_model(
    in_dir: str,
    out_dir: str,
    bpw: float = 4.0,
    head_bits: int = 6,
    rows: int = 64,
    length: int = 1024,
    cal_text: list | None = None,
    cb: int = CB_3INST,
    seed: int = 0,
    resume: bool = True,
    verbose: bool = True,
    viterbi_backend: str = "auto",
    fast: bool = False,
    strategy: dict | None = None,  # per-linear-key K overrides (optimize.py)
    hq: bool = False,              # clamp sensitive groups >= base+1 bits
    mtp_bits: int | None = None,   # auxiliary target for MTP-head linears
):
    os.makedirs(out_dir, exist_ok=True)
    qdir = os.path.join(out_dir, "qtensors")
    os.makedirs(qdir, exist_ok=True)
    state_path = os.path.join(out_dir, "job_state.json")

    # fusion would hide per-projection weights from Hessian capture
    from ..model.config import InferParams

    config = Config.from_directory(
        in_dir, infer_params=InferParams(fuse_projections=False))
    model = Model.from_config(config)

    tokenizer = None
    try:
        from ..tokenizer import Tokenizer

        tokenizer = Tokenizer(in_dir)
    except Exception:
        pass

    cal_ids = get_calibration(tokenizer, rows=rows, length=length,
                              text_files=cal_text, vocab_size=config.vocab_size,
                              seed=seed)

    # quantization groups: per-module, grouped by qmap
    job = {"in_dir": in_dir, "bpw": bpw, "head_bits": head_bits,
           "completed": [], "proxy_err": {}}
    if resume and os.path.exists(state_path):
        with open(state_path) as f:
            job = json.load(f)

    # build the module-level plan
    plans = []
    for mi, module in enumerate(model.modules):
        linears = [m for m in module.walk() if isinstance(m, Linear)]
        groups: dict[str, QGroup] = {}
        for lin in linears:
            gkey = lin.key.rsplit(".", 1)[0]
            g = groups.setdefault(gkey, QGroup(key=lin.key, linears=[], numel=0))
            g.linears.append(lin)
            g.numel += lin.in_features * lin.out_features
        plans.append((mi, module, list(groups.values())))

    all_groups = [g for _, _, gs in plans for g in gs]
    achieved = create_q_strategy(all_groups, bpw, head_bits, hq=hq,
                                 mtp_bits=mtp_bits)
    if verbose:
        print(f" -- bit allocation: body {achieved:.3f} bpw "
              f"(target {bpw}), head {head_bits}")

    # calibration state flows through modules; starts as token ids
    state = cal_ids.astype(np.int32)
    B, S = state.shape
    positions = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S)).copy()

    t_start = time.time()
    for mi, module, groups in plans:
        params: dict = {}
        module.load(params)  # loads dense weights (or passthrough modules)

        done = str(mi) in map(str, job["completed"])
        shard_path = os.path.join(qdir, f"module_{mi:04d}.safetensors")
        if done and os.path.exists(shard_path):
            # re-apply saved quantized tensors so the state advance matches
            _apply_saved(module, params, shard_path, config)
        has_linears = any(isinstance(m, Linear) for m in module.walk())
        if has_linears and not done:
            # 1. capture Hessians
            capture: dict = {}
            ctx = ForwardCtx(positions=jnp.asarray(positions), capture=capture)
            x = module.forward(jnp.asarray(state), params, ctx)
            del x

            # 2. quantize each group
            shard: dict = {}
            for g in groups:
                for lin in g.linears:
                    qmap_key = lin.qmap
                    hd = capture.get(qmap_key) or HessianData(k=lin.in_features)
                    w = lin.get_weight_f32(params)  # (in, out) f32
                    t0 = time.time()
                    K = (strategy or {}).get(lin.key, g.K)
                    out, proxy_err, _ = quantize_exl3_np(
                        w, hd, K=K, cb=cb, seed=seed + hash(lin.key) % 65536,
                        backend=viterbi_backend, skip_g_scale=fast,
                    )
                    if verbose:
                        print(f" -- {lin.key}: K={K} proxy_err={proxy_err:.6f} "
                              f"({time.time()-t0:.1f}s)")
                    job["proxy_err"][lin.key] = proxy_err
                    for name, arr in out.items():
                        shard[f"{lin.key}.{name}"] = arr
                    _swap_linear_to_exl3(lin, params, out, K, cb)
            save_file(shard, shard_path)
            job["completed"].append(mi)
            with open(state_path, "w") as f:
                json.dump(job, f)

        # 3. advance state with the (possibly quantized) module
        ctx = ForwardCtx(positions=jnp.asarray(positions))
        state_j = module.forward(jnp.asarray(state), params, ctx)
        state = np.asarray(jax.device_get(state_j), dtype=np.float32)

    if verbose:
        print(f" -- quantization done in {time.time()-t_start:.0f}s; compiling")
    compile_model(in_dir, out_dir, bpw=bpw, head_bits=head_bits)
    return job


def _swap_linear_to_exl3(lin: Linear, params: dict, out: dict, K: int, cb: int):
    """Replace the dense params with quantized (reconstruct mode) so the
    state advance sees quantized weights (error feedback across layers)."""
    p = {
        "trellis": jnp.asarray(out["trellis"]),
        "suh": jnp.asarray(out["suh"].astype(np.float32)),
        "svh": jnp.asarray(out["svh"].astype(np.float32)),
    }
    old = params[lin.key]
    if "bias" in old:
        p["bias"] = old["bias"]
    params[lin.key] = p
    lin.quant_type = "exl3"
    lin.mode = "reconstruct"
    lin.K = K
    lin.cb = cb


def _apply_saved(module, params, shard_path, config):
    from ..loader.safetensors import SafetensorsCollection
    import mmap

    stc = SafetensorsCollection(os.path.dirname(shard_path))
    for m in module.walk():
        if isinstance(m, Linear):
            t = stc.get_tensor(m.key + ".trellis", optional=True)
            if t is None:
                continue
            out = {
                "trellis": t,
                "suh": stc.get_tensor(m.key + ".suh"),
                "svh": stc.get_tensor(m.key + ".svh"),
            }
            K = t.shape[-1] // 16
            cb = CB_MCG if stc.has_tensor(m.key + ".mcg") else (
                CB_MUL1 if stc.has_tensor(m.key + ".mul1") else CB_3INST)
            _swap_linear_to_exl3(m, params, out, K, cb)
    stc.close()
