"""HF Transformers interop: load EXL3 checkpoints as transformers models.

Feature reference: /root/reference/exllamav3/integration/transformers.py
(Exl3HfQuantizer:141, patch_transformers:271 — the reference swaps nn.Linear
for a module running its CUDA kernels). The TPU framework's compute path is
JAX, so the transformers side instead gets *dequantized* torch weights: every
EXL3 tensor group decodes (trellis -> codebook values -> Hadamard un-rotation
-> sign flips) into a dense (out, in) weight via the same verified
reconstruction kernels the JAX runtime uses. That makes any EXL3 checkpoint
loadable by `transformers` on CPU for validation, scoring or fine-tuning
workflows, and is the cross-check that our decode matches HF's model math.

Two entry points:
  * load_exl3_transformers(dir) -> transformers PreTrainedModel (torch).
  * patch_transformers() -> registers the "exl3" quant method so plain
    AutoModelForCausalLM.from_pretrained(dir) works on EXL3 checkpoints.
"""
from __future__ import annotations

import json
import os

import numpy as np


def _iter_exl3_groups(stc):
    """Yield (key, group_dict) for every EXL3 tensor group in the collection."""
    keys = stc.keys()
    bases = {}
    for k in keys:
        for suffix in (".trellis", ".suh", ".svh", ".su", ".sv", ".mcg", ".mul1"):
            if k.endswith(suffix):
                bases.setdefault(k[: -len(suffix)], set()).add(suffix[1:])
    for base, parts in bases.items():
        if "trellis" in parts:
            yield base, parts


def load_exl3_state_dict(directory: str, dtype="float32") -> dict:
    """Decode an EXL3 checkpoint into a dense torch state dict (HF layout:
    (out, in) weights, original key names)."""
    import torch
    import jax.numpy as jnp

    from ..loader.safetensors import SafetensorsCollection, bf16_to_f32
    from ..quant.reconstruct import reconstruct_full_jnp, codebook_id
    from ..modules.linear import _unpack_signs

    stc = SafetensorsCollection(directory)
    out: dict = {}
    exl3_members: set = set()

    for base, parts in _iter_exl3_groups(stc):
        trellis = stc.get_tensor(base + ".trellis")
        suh = (stc.get_tensor(base + ".suh") if "suh" in parts
               else _unpack_signs(stc.get_tensor(base + ".su")))
        svh = (stc.get_tensor(base + ".svh") if "svh" in parts
               else _unpack_signs(stc.get_tensor(base + ".sv")))
        cb = codebook_id("mcg" in parts, "mul1" in parts)
        K = trellis.shape[-1] // 16
        w = reconstruct_full_jnp(
            jnp.asarray(np.ascontiguousarray(trellis)),
            jnp.asarray(suh.astype(np.float32)),
            jnp.asarray(svh.astype(np.float32)),
            K, cb, dtype=jnp.float32,
        )
        w = np.asarray(w)  # (in, out)
        out[base + ".weight"] = torch.from_numpy(
            np.ascontiguousarray(w.T)).to(getattr(torch, dtype))
        for p in parts:
            exl3_members.add(f"{base}.{p}")
        bias = stc.get_tensor(base + ".bias", optional=True)
        if bias is not None:
            out[base + ".bias"] = torch.from_numpy(
                bias.astype(np.float32)).to(getattr(torch, dtype))
            exl3_members.add(base + ".bias")

    # pass through every non-EXL3 tensor
    for k in stc.keys():
        if k in exl3_members or k in out:
            continue
        dt = stc.get_dtype_str(k)
        if dt == "BF16":
            t = bf16_to_f32(stc.get_tensor(k, allow_bf16=True))
        else:
            t = stc.get_tensor(k)
        import torch as _t

        out[k] = _t.from_numpy(np.ascontiguousarray(t.astype(np.float32))).to(
            getattr(_t, dtype))
    return out


def load_exl3_transformers(directory: str, dtype="float32"):
    """Instantiate a transformers model from an EXL3 checkpoint directory."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = AutoConfig.from_pretrained(directory)
    if hasattr(cfg, "quantization_config"):
        cfg.quantization_config = None
    sd = load_exl3_state_dict(directory, dtype=dtype)
    with torch.device("meta"):
        model = AutoModelForCausalLM.from_config(cfg)
    model = model.to_empty(device="cpu").to(getattr(torch, dtype))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # tied embeddings: fill lm_head from embed when absent in the checkpoint
    if any("lm_head" in m for m in missing) and getattr(
            cfg, "tie_word_embeddings", False):
        model.tie_weights()
    model.eval()
    return model


class Exl3HfQuantizationConfig:
    """Minimal QuantizationConfigMixin-compatible config for quant_method
    'exl3' (reference integration/transformers.py Exl3QuantizationConfig)."""

    quant_method = "exl3"

    def __init__(self, **kwargs):
        self.bits = kwargs.get("bits")
        self.head_bits = kwargs.get("head_bits")
        self.extra = kwargs

    @classmethod
    def from_dict(cls, d, return_unused_kwargs=False, **kwargs):
        cfg = cls(**d)
        return (cfg, {}) if return_unused_kwargs else cfg

    def to_dict(self):
        return dict(self.extra, quant_method="exl3")


class Exl3HfQuantizer:
    """Duck-typed HfQuantizer: dequantizes EXL3 groups at load time."""

    requires_calibration = False

    def __init__(self, quantization_config, **kwargs):
        self.quantization_config = quantization_config

    def load(self, directory: str, dtype="float32"):
        return load_exl3_transformers(directory, dtype=dtype)


def patch_transformers() -> None:
    """Register 'exl3' with transformers' auto-quantization maps so
    AutoModelForCausalLM.from_pretrained() accepts EXL3 checkpoints."""
    try:
        from transformers.quantizers.auto import (
            AUTO_QUANTIZER_MAPPING,
            AUTO_QUANTIZATION_CONFIG_MAPPING,
        )

        AUTO_QUANTIZATION_CONFIG_MAPPING["exl3"] = Exl3HfQuantizationConfig
        AUTO_QUANTIZER_MAPPING["exl3"] = Exl3HfQuantizer
    except Exception as e:  # transformers internals moved; fall back to API fns
        import warnings

        warnings.warn(f"patch_transformers: auto-mapping unavailable ({e}); "
                      "use load_exl3_transformers() directly")
