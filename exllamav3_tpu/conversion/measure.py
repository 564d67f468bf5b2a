"""Per-module quantization sensitivity measurement.

Feature reference: /root/reference/exllamav3/conversion/measure_model.py:132
(post-hoc per-layer sensitivity: how much error each layer contributes at
each bitrate). Compact TPU version: walk the dense model once, capture each
module's Hessians from calibration rows, quantize every linear at each
candidate K and record the proxy error tr(EHE^T)/tr(WHW^T) plus element
count — the inputs the optimizer (optimize.py) needs to allocate bits.
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..model.config import Config
from ..model.model import Model
from ..modules.module import ForwardCtx
from ..modules.linear import Linear
from ..quant.quantize import HessianData, quantize_exl3_np
from .calibration import get_calibration


def measure_model(
    in_dir: str,
    out_file: str | None = None,
    bits: tuple = (2, 3, 4, 5),
    rows: int = 16,
    length: int = 512,
    seed: int = 0,
    verbose: bool = True,
) -> dict:
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
    cal = get_calibration(tokenizer, rows=rows, length=length,
                          vocab_size=config.vocab_size, seed=seed)
    state = cal.astype(np.int32)
    B, S = state.shape
    positions = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S)).copy()

    measurement: dict = {}
    for mi, module in enumerate(model.modules):
        params: dict = {}
        module.load(params)
        linears = [m for m in module.walk()
                   if isinstance(m, Linear) and m.qmap]
        if linears:
            capture: dict = {}
            ctx = ForwardCtx(positions=jnp.asarray(positions), capture=capture)
            _ = module.forward(jnp.asarray(state), params, ctx)
            for lin in linears:
                hd = capture.get(lin.qmap) or HessianData(k=lin.in_features)
                w = lin.get_weight_f32(params)
                entry = {"numel": int(w.size), "err": {}}
                for K in bits:
                    _, proxy_err, _ = quantize_exl3_np(
                        w, hd, K=K, seed=seed, skip_g_scale=True)
                    entry["err"][str(K)] = float(proxy_err)
                measurement[lin.key] = entry
                if verbose:
                    errs = " ".join(f"{K}:{entry['err'][str(K)]:.5f}"
                                    for K in map(str, bits))
                    print(f" -- {lin.key}: {errs}")
        # advance with DENSE weights (sensitivity, not error feedback)
        ctx = ForwardCtx(positions=jnp.asarray(positions))
        state = np.asarray(jax.device_get(
            module.forward(jnp.asarray(state), params, ctx)), dtype=np.float32)

    if out_file:
        with open(out_file, "w") as f:
            json.dump({"bits": list(bits), "modules": measurement}, f, indent=2)
    return {"bits": list(bits), "modules": measurement}


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("-i", "--in_dir", required=True)
    p.add_argument("-o", "--out_file", default="measurement.json")
    p.add_argument("--bits", default="2,3,4,5")
    p.add_argument("--rows", type=int, default=16)
    p.add_argument("--length", type=int, default=512)
    args = p.parse_args()
    measure_model(args.in_dir, args.out_file,
                  bits=tuple(int(b) for b in args.bits.split(",")),
                  rows=args.rows, length=args.length)


if __name__ == "__main__":
    main()
