"""Image preprocessing for the vision towers: aspect-preserving smart
resize + normalization, producing the (H, W, 3) float arrays the towers'
get_image_embeddings() consume.

Feature reference: /root/reference/exllamav3/architecture/mm_processing/
qwen2.py (qwen2_smart_resize:51, adapted in turn from the HF Qwen2-VL image
processor) and the per-architecture preprocess() methods. Towers do their
own patchification, so preprocessing only needs resize + scale + normalize.
"""
from __future__ import annotations

import math

import numpy as np

# OpenAI-CLIP statistics (Qwen-VL, GLM-4V, Pixtral checkpoints)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
# SigLIP / Gemma3: rescale to [-1, 1]
HALF_MEAN = (0.5, 0.5, 0.5)
HALF_STD = (0.5, 0.5, 0.5)


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> tuple[int, int]:
    """(h, w) divisible by `factor`, total pixels within [min, max], aspect
    ratio preserved as closely as possible (HF Qwen2-VL semantics)."""
    if height < factor or width < factor:
        raise ValueError(
            f"height:{height} or width:{width} must be larger than {factor}")
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def preprocess_image(image, factor: int, mean=CLIP_MEAN, std=CLIP_STD,
                     min_pixels: int = 56 * 56,
                     max_pixels: int = 14 * 14 * 4 * 1280,
                     fixed_size: int | None = None,
                     resample=None) -> np.ndarray:
    """PIL image (or (H, W, 3) array in 0..255 / 0..1) -> normalized
    (H', W', 3) float32 pixels. fixed_size forces a square resize (SigLIP /
    Gemma-style towers); otherwise smart_resize to a multiple of `factor`."""
    try:
        from PIL import Image

        is_pil = isinstance(image, Image.Image)
    except ImportError:  # pragma: no cover
        Image, is_pil = None, False
    if is_pil:
        image = image.convert("RGB")
        if fixed_size is not None:
            new_hw = (fixed_size, fixed_size)
        else:
            new_hw = smart_resize(image.height, image.width, factor,
                                  min_pixels, max_pixels)
        if (image.height, image.width) != new_hw:
            rs = resample if resample is not None else Image.Resampling.BICUBIC
            image = image.resize((new_hw[1], new_hw[0]), resample=rs)
        arr = np.asarray(image).astype(np.float32) / 255.0
    else:
        arr = np.asarray(image, dtype=np.float32)
        if arr.max() > 2.0:
            arr = arr / 255.0
        h, w = arr.shape[:2]
        if fixed_size is not None:
            new_hw = (fixed_size, fixed_size)
        else:
            new_hw = smart_resize(h, w, factor, min_pixels, max_pixels)
        if (h, w) != new_hw:
            # nearest-neighbor fallback for raw arrays without PIL
            yi = (np.arange(new_hw[0]) * h / new_hw[0]).astype(int)
            xi = (np.arange(new_hw[1]) * w / new_hw[1]).astype(int)
            arr = arr[yi][:, xi]
    if mean is not None:
        arr = (arr - np.asarray(mean, np.float32)) \
            / np.asarray(std, np.float32)
    return arr.astype(np.float32)
