#!/usr/bin/env python
"""EXL3 conversion CLI (feature reference: /root/reference/convert.py and
conversion/convert_model.py argparse surface).

Usage:
    python convert.py -i <hf_model_dir> -o <out_dir> -b 4.0 [-hb 6] [...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser(description="Convert an HF model to EXL3 (TPU)")
    p.add_argument("-i", "--in_dir", required=True, help="input HF model directory")
    p.add_argument("-o", "--out_dir", required=True, help="output directory")
    p.add_argument("-b", "--bits", type=float, default=4.0, help="target bits per weight")
    p.add_argument("-hb", "--head_bits", type=int, default=6, help="lm_head bits")
    p.add_argument("-r", "--rows", type=int, default=64, help="calibration rows")
    p.add_argument("-l", "--length", type=int, default=1024, help="calibration row length")
    p.add_argument("--cal_text", nargs="*", help="calibration text files")
    p.add_argument("-cb", "--codebook", choices=["3inst", "mcg", "mul1"], default="3inst")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--hq", action="store_true",
                   help="boost sensitive layers (down/o/v) one bit above base")
    p.add_argument("--serving_bits", type=int, default=None,
                   choices=[3, 4, 5, 6],
                   help="also emit Hessian-aware packed int-B serving "
                        "tensors (<key>.sq) usable by the intN runtime "
                        "modes at low-bit HBM bytes")
    p.add_argument("--mtp_bits", type=int, default=None,
                   help="bits for MTP-head linears (aux target)")
    p.add_argument("--dp", type=int, default=0,
                   help="shard calibration rows over N devices during "
                        "capture/advance (conversion data parallelism)")
    p.add_argument("--no_resume", action="store_true", help="ignore existing job state")
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args()

    from exllamav3_tpu.conversion.convert_model import convert_model
    from exllamav3_tpu.quant.codebook import CB_3INST, CB_MCG, CB_MUL1

    cb = {"3inst": CB_3INST, "mcg": CB_MCG, "mul1": CB_MUL1}[args.codebook]
    convert_model(
        args.in_dir,
        args.out_dir,
        bpw=args.bits,
        head_bits=args.head_bits,
        rows=args.rows,
        length=args.length,
        cal_text=args.cal_text,
        cb=cb,
        seed=args.seed,
        resume=not args.no_resume,
        verbose=not args.quiet,
        hq=args.hq,
        mtp_bits=args.mtp_bits,
        serving_bits=args.serving_bits,
        dp=args.dp,
    )


if __name__ == "__main__":
    main()
