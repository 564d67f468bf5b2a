#!/usr/bin/env python
"""Multimodal generation example (feature reference: /root/reference/
examples/multimodal.py, imgdesc.py).

Loads a vision-language checkpoint (Gemma-3 / Qwen-VL / GLM-4V / Pixtral
class), embeds one or more images through the vision tower, splices the
resulting MM tokens into the prompt, and generates. With --image paths the
images load via PIL; without, a synthetic gradient image demonstrates the
full path on any checkpoint (including the synthetic ones used in CI).

    python examples/multimodal.py -m <vlm_dir> --image cat.png \
        --prompt "Describe this image."
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


def load_image(path: str | None, size: int) -> np.ndarray:
    if path:
        from PIL import Image

        img = Image.open(path).convert("RGB")
        px = np.asarray(img, np.float32) / 127.5 - 1.0
        return px
    # synthetic gradient (exercises the tower without an image file)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    return np.stack([x, y, (x + y) / 2], axis=-1) * 2.0 - 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--mode", default="auto")
    ap.add_argument("--image", nargs="*", default=None, help="image file(s)")
    ap.add_argument("--prompt", default="Describe this image.")
    ap.add_argument("--max_tokens", type=int, default=100)
    ap.add_argument("--pages", type=int, default=64)
    args = ap.parse_args()

    from exllamav3_tpu.model import Cache, CacheSpec, Config, Model, InferParams
    from exllamav3_tpu.generator import Generator, Job
    from exllamav3_tpu.tokenizer import Tokenizer

    config = Config.from_directory(
        args.model, infer_params=InferParams(linear_mode=args.mode))
    text = Model.from_config(config)
    text.load()
    vision = Model.from_config(config, component="vision")
    vision.load()
    tokenizer = None
    try:
        tokenizer = Tokenizer(args.model)
    except Exception:
        print("(no tokenizer: raw token-id prompt)")

    img_size = (getattr(config, "vision_image_size", None)
                or (config.cfg.get("vision_config") or {}).get("image_size")
                or 224)
    paths = args.image or [None]
    embeddings = [vision.get_image_embeddings(load_image(p, img_size))
                  for p in paths]

    # images first, question last: generation must start from a text token
    parts = [np.array([2], np.int64)]  # bos
    for e in embeddings:
        parts.append(e.token_ids)
    if tokenizer is not None:
        parts.append(tokenizer.encode(args.prompt).reshape(-1))
    else:
        parts.append(np.arange(2, 10, dtype=np.int64))
    prompt = np.concatenate(parts)

    gen = Generator(text, Cache(text, CacheSpec(layout="paged",
                                                num_pages=args.pages)),
                    tokenizer=tokenizer)
    stop = []
    if tokenizer is not None and tokenizer.eos_token_id is not None:
        stop = [tokenizer.eos_token_id]
    job = Job(prompt, max_new_tokens=args.max_tokens, embeddings=embeddings,
              stop_conditions=stop)
    gen.enqueue(job)
    while gen.num_remaining_jobs():
        gen.iterate()
    if tokenizer is not None:
        print(tokenizer.decode(job.new_tokens))
    else:
        print("generated token ids:", job.new_tokens)


if __name__ == "__main__":
    main()
