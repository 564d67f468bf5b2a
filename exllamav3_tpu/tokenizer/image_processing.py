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


# -- Step-3.7 sliding-window tiling ------------------------------------------
# Feature reference: /root/reference/exllamav3/architecture/mm_processing/
# step3_7.py (determine_window_size, slide_window, get_patches). Large
# images tile into square window crops (plus the resized global view); each
# crop embeds separately and the patch grid carries newline markers.

STEP37_MAX_IMAGE_SIZE = 3024


def _step37_window_size(long: int, short: int) -> int:
    if long <= 728:
        return short if long / short > 1.5 else 0
    return min(short, 504) if long / short > 4 else 504


def _step37_crop_size(w: int, h: int, win: int) -> tuple:
    """Round each side to a whole number of windows (within 20% slack)."""
    def rnd(x):
        r = x / win
        if r < 1:
            return x
        frac = r - x // win
        n = int(r) + 1 if frac > 0.2 else int(r)
        return win * n

    return rnd(w), rnd(h)


def _step37_slide(width: int, height: int, win: int):
    """-> (crop boxes (x, y, w, h), columns per row)."""
    import math
    from itertools import product

    def starts(total):
        n = 1 if total <= win else math.ceil((total - win) / win + 1)
        st = [win * i for i in range(n)]
        if len(st) > 1 and st[-1] + win > total:
            st[-1] = total - win
        return st

    xs, ys = starts(width), starts(height)
    boxes = [(x, y, win, win) for y, x in product(ys, xs)]
    return boxes, len(xs)


def step37_get_patches(image):
    """PIL image -> (global PIL image, [window-crop PIL images],
    newline mask per crop | None). Mirrors the reference get_patches:
    extreme aspect ratios square-pad, the image caps at 3024 px, the crop
    canvas rounds to whole windows, and crops slide left-to-right,
    top-to-bottom with a newline marker at each row end (except the last).
    """
    from PIL import Image

    w, h = image.size
    ratio = w / h
    if min(w, h) < 32 and (ratio > 4 or ratio < 0.25):
        size = max(w, h)
        padded = Image.new(image.mode, (size, size), 0)
        padded.paste(image, (0, 0))
        image = padded
        w, h = image.size
    if max(w, h) > STEP37_MAX_IMAGE_SIZE:
        sc = STEP37_MAX_IMAGE_SIZE / max(w, h)
        w, h = int(w * sc), int(h * sc)
        image = image.resize((w, h), Image.Resampling.BILINEAR)
    win = _step37_window_size(max(w, h), min(w, h))
    if win == 0:
        return image, [], None
    cw, ch = _step37_crop_size(w, h, win)
    crop_src = image if (cw, ch) == (w, h) else \
        image.resize((cw, ch), Image.Resampling.BILINEAR)
    boxes, x_num = _step37_slide(cw, ch, win)
    patches, newlines = [], []
    for i, (x, y, pw, ph) in enumerate(boxes):
        patches.append(crop_src.crop((x, y, x + pw, y + ph)))
        if (i + 1) % x_num == 0:
            newlines.append(i)
    if newlines and newlines[-1] == len(patches) - 1:
        newlines.pop()
    mask = [i in newlines for i in range(len(patches))] if patches else None
    return image, patches, mask
