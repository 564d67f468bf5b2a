#!/usr/bin/env python
"""HF Transformers interop (feature reference:
/root/reference/examples/transformers_integration.py): load an EXL3
checkpoint as a transformers model — quantized runtime by default (packed
trellis tensors, EXL3 memory footprint, decode-on-demand Exl3HfLinear).

    python examples/transformers_integration.py -m <exl3_model_dir> \
        -p "The capital of France is"
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_dir", required=True)
    p.add_argument("-p", "--prompt", default="Hello")
    p.add_argument("--dense", action="store_true",
                   help="decode everything to dense torch weights up front")
    p.add_argument("--max_new_tokens", type=int, default=64)
    args = p.parse_args()

    import torch
    from transformers import AutoTokenizer
    from exllamav3_tpu.integration import load_exl3_transformers

    model = load_exl3_transformers(args.model_dir,
                                   quantized_runtime=not args.dense)
    tok = AutoTokenizer.from_pretrained(args.model_dir)
    ids = tok(args.prompt, return_tensors="pt").input_ids
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=args.max_new_tokens,
                             do_sample=False)
    print(tok.decode(out[0], skip_special_tokens=True))


if __name__ == "__main__":
    main()
