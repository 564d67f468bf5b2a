"""HF Transformers interop: load EXL3 checkpoints as transformers models.

Feature reference: /root/reference/exllamav3/integration/transformers.py
(Exl3HfLinear:15, Exl3HfQuantizer:141, patch_transformers:271 — the
reference swaps nn.Linear for a module running its CUDA kernels). Two
runtimes here:

  * quantized (default): every nn.Linear with an EXL3 tensor group becomes
    an `Exl3HfLinear` holding only the PACKED trellis + sign vectors — the
    model sits at EXL3 memory footprint (a 70B 4-bpw checkpoint stays
    ~35 GB instead of exploding to 140 GB dense). Forward decodes the tile
    stream on demand through the same verified reconstruction kernels the
    JAX runtime uses, with a byte-bounded LRU of dense weights
    (EXL3_HF_CACHE_MB, default 256) amortizing repeated calls.
  * dense (quantized_runtime=False): decode everything up front into plain
    torch weights — for fine-tuning / workflows that need real nn.Linear.

Entry points:
  * load_exl3_transformers(dir) -> transformers PreTrainedModel (torch).
  * patch_transformers() -> registers the "exl3" quant method so plain
    AutoModelForCausalLM.from_pretrained(dir) works on EXL3 checkpoints.
"""
from __future__ import annotations

import functools
import json
import os
from collections import OrderedDict

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


# -- quantized-runtime linear ---------------------------------------------------

_DENSE_LRU: "OrderedDict[str, object]" = OrderedDict()
_DENSE_LRU_BYTES = [0]


def _lru_budget() -> int:
    from ..util.env import env_int

    return env_int("EXL3_HF_CACHE_MB", 256) * 1024 * 1024


def _lru_get(key):
    w = _DENSE_LRU.get(key)
    if w is not None:
        _DENSE_LRU.move_to_end(key)
    return w


def _lru_put(key, w):
    nbytes = w.numel() * w.element_size()
    _DENSE_LRU[key] = w
    _DENSE_LRU_BYTES[0] += nbytes
    while _DENSE_LRU_BYTES[0] > _lru_budget() and len(_DENSE_LRU) > 1:
        _, old = _DENSE_LRU.popitem(last=False)
        _DENSE_LRU_BYTES[0] -= old.numel() * old.element_size()


@functools.lru_cache(maxsize=None)
def _hf_linear_cls():
    import torch

    class Exl3HfLinear(torch.nn.Module):
        """nn.Linear stand-in at EXL3 footprint (reference
        integration/transformers.py Exl3HfLinear:15-271). Buffers hold the
        packed trellis halfwords + suh/svh sign-scale vectors; forward
        decodes to a transient dense (in, out) f32 weight (byte-bounded LRU
        across layers) and matmuls. The reference runs its fused CUDA GEMV
        instead; on the torch/CPU side of this framework the decode-on-
        demand path keeps identical numerics to the JAX runtime."""

        def __init__(self, key: str, trellis, suh, svh, bias, cb: int):
            super().__init__()
            self.key = key
            self.cb = cb
            self.K = trellis.shape[-1] // 16
            self.in_features = trellis.shape[0] * 16
            self.out_features = trellis.shape[1] * 16
            self.register_buffer("trellis", trellis)
            self.register_buffer("suh", suh)
            self.register_buffer("svh", svh)
            if bias is not None:
                self.register_buffer("bias", bias)
            else:
                self.bias = None
            # some transformers impls probe .weight.dtype directly
            self.weight = torch.zeros((1,), dtype=torch.float32)

        def _dense(self):
            import torch
            import jax.numpy as jnp

            w = _lru_get(self.key)
            if w is not None:
                return w
            from ..quant.reconstruct import reconstruct_full_jnp

            wj = reconstruct_full_jnp(
                jnp.asarray(self.trellis.numpy()),
                jnp.asarray(self.suh.float().numpy()),
                jnp.asarray(self.svh.float().numpy()),
                self.K, self.cb, dtype=jnp.float32,
            )
            w = torch.from_numpy(np.asarray(wj))  # (in, out) f32
            _lru_put(self.key, w)
            return w

        def forward(self, x):
            import torch

            w = self._dense()
            y = torch.matmul(x.to(torch.float32), w)
            if self.bias is not None:
                y = y + self.bias.to(torch.float32)
            return y.to(x.dtype)

        def extra_repr(self):
            return (f"in={self.in_features}, out={self.out_features}, "
                    f"K={self.K} (EXL3 packed)")

    return Exl3HfLinear


def _swap_exl3_linears(model, stc, bases) -> int:
    """Replace matching submodules with Exl3HfLinear built from the packed
    checkpoint tensors. Returns the number of swaps."""
    import torch

    cls = _hf_linear_cls()
    from ..quant.reconstruct import codebook_id
    from ..modules.linear import _unpack_signs

    # the dense-weight LRU is process-global: key by checkpoint identity +
    # layer path so two same-architecture models loaded in one process
    # (base vs fine-tune A/B) never serve each other's decoded weights
    ckpt_id = str(getattr(stc, "directory", None) or f"stc{id(stc)}")
    swapped = 0
    named = dict(model.named_modules())
    for base, parts in bases:
        parent_name, _, attr = base.rpartition(".")
        parent = named.get(parent_name)
        if parent is None or not hasattr(parent, attr):
            continue
        trellis = torch.from_numpy(
            np.array(stc.get_tensor(base + ".trellis"), copy=True))
        suh = (stc.get_tensor(base + ".suh") if "suh" in parts
               else _unpack_signs(stc.get_tensor(base + ".su")))
        svh = (stc.get_tensor(base + ".svh") if "svh" in parts
               else _unpack_signs(stc.get_tensor(base + ".sv")))
        bias = stc.get_tensor(base + ".bias", optional=True)
        lin = cls(
            f"{ckpt_id}::{base}", trellis,
            torch.from_numpy(np.ascontiguousarray(suh.astype(np.float16))),
            torch.from_numpy(np.ascontiguousarray(svh.astype(np.float16))),
            torch.from_numpy(bias.astype(np.float32)) if bias is not None
            else None,
            codebook_id("mcg" in parts, "mul1" in parts),
        )
        setattr(parent, attr, lin)
        swapped += 1
    return swapped


def _reinit_rope_buffers(model) -> None:
    """Meta-device construction + to_empty leaves NON-PERSISTENT buffers
    (LlamaRotaryEmbedding.inv_freq and friends) uninitialized — they are not
    in the checkpoint, so load_state_dict never fills them. Re-run the rope
    init on CPU for every module that carries one."""
    import torch

    for mod in model.modules():
        if hasattr(mod, "rope_init_fn") and hasattr(mod, "inv_freq"):
            try:
                inv, scaling = mod.rope_init_fn(mod.config,
                                                torch.device("cpu"))
                mod.register_buffer("inv_freq", inv, persistent=False)
                mod.original_inv_freq = inv
                mod.attention_scaling = scaling
            except Exception:
                pass


def load_exl3_transformers(directory: str, dtype="float32",
                           quantized_runtime: bool = True):
    """Instantiate a transformers model from an EXL3 checkpoint directory.

    quantized_runtime=True (default) keeps every EXL3 linear packed
    (Exl3HfLinear, EXL3 memory footprint); False decodes everything to dense
    torch weights up front.
    """
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = AutoConfig.from_pretrained(directory)
    if hasattr(cfg, "quantization_config"):
        cfg.quantization_config = None
    with torch.device("meta"):
        model = AutoModelForCausalLM.from_config(cfg)

    if not quantized_runtime:
        sd = load_exl3_state_dict(directory, dtype=dtype)
        model = model.to_empty(device="cpu").to(getattr(torch, dtype))
        missing, unexpected = model.load_state_dict(sd, strict=False)
        if any("lm_head" in m for m in missing) and getattr(
                cfg, "tie_word_embeddings", False):
            model.tie_weights()
        _reinit_rope_buffers(model)
        model.eval()
        return model

    from ..loader.safetensors import SafetensorsCollection, bf16_to_f32

    stc = SafetensorsCollection(directory)
    bases = list(_iter_exl3_groups(stc))
    exl3_members = {f"{b}.{p}" for b, parts in bases for p in parts}
    exl3_members |= {f"{b}.bias" for b, _ in bases}

    # non-EXL3 tensors (embeddings, norms) load densely
    sd = {}
    for k in stc.keys():
        if k in exl3_members:
            continue
        dt = stc.get_dtype_str(k)
        t = (bf16_to_f32(stc.get_tensor(k, allow_bf16=True)) if dt == "BF16"
             else stc.get_tensor(k))
        sd[k] = torch.from_numpy(
            np.ascontiguousarray(t.astype(np.float32))).to(getattr(torch, dtype))

    # swap while the model is still on meta — the dense weights of EXL3
    # linears are never materialized, so peak memory stays at EXL3 footprint
    n = _swap_exl3_linears(model, stc, bases)
    for mod in model.modules():
        for coll, wrap in ((mod._parameters, True), (mod._buffers, False)):
            for pname, p in list(coll.items()):
                if p is not None and p.is_meta:
                    t = torch.empty_like(
                        p, device="cpu",
                        dtype=getattr(torch, dtype)
                        if p.is_floating_point() else p.dtype)
                    coll[pname] = torch.nn.Parameter(
                        t, requires_grad=False) if wrap else t
    missing, unexpected = model.load_state_dict(sd, strict=False)
    missing = [m for m in missing if not any(
        m.startswith(b + ".") for b, _ in bases)]
    if any("lm_head" in m for m in missing) and getattr(
            cfg, "tie_word_embeddings", False):
        model.tie_weights()
    _reinit_rope_buffers(model)
    model.eval()
    model._exl3_swapped = n
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
