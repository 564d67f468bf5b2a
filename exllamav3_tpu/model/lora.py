"""LoRA adapters: load PEFT directories, attach to Linear modules.

Feature reference: /root/reference/exllamav3/model/lora.py (LoRA
.from_directory:45; applied in Linear.forward, modules/linear.py:605-613).
Adapters are folded into the params pytree as lora_a/lora_b tensors with a
static scale; Linear.forward adds (x @ a) @ b * scale, traced into the same
jitted step (no recompile per request as long as adapter presence is stable).
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from ..loader.safetensors import SafetensorsCollection, bf16_to_f32

_PREFIXES = ("base_model.model.", "base_model.", "")


class LoRA:
    def __init__(self, directory: str, adapters: dict, scale: float, r: int):
        self.directory = directory
        self.adapters = adapters  # module key -> (a (in, r), b (r, out))
        self.scale = scale
        self.r = r

    @staticmethod
    def from_directory(directory: str) -> "LoRA":
        with open(os.path.join(directory, "adapter_config.json")) as f:
            cfg = json.load(f)
        r = int(cfg.get("r", 8))
        alpha = float(cfg.get("lora_alpha", r))
        scale = alpha / r
        stc = SafetensorsCollection(directory)
        adapters: dict = {}
        for key in list(stc.keys()):
            if ".lora_A." not in key and not key.endswith(".lora_A.weight"):
                continue
            base = key.split(".lora_A")[0]
            for p in _PREFIXES:
                if base.startswith(p):
                    base = base[len(p):]
                    break
            a = _read(stc, key)  # PEFT layout: (r, in)
            b = _read(stc, key.replace("lora_A", "lora_B"))  # (out, r)
            adapters[base] = (
                np.ascontiguousarray(a.T),  # (in, r)
                np.ascontiguousarray(b.T),  # (r, out)
            )
        stc.close()
        return LoRA(directory, adapters, scale, r)

    def attach(self, model) -> int:
        """Add adapter tensors to the loaded model's params. Returns the
        number of Linear modules patched."""
        n = 0
        # fused qkv/gate_up projections hide their children's entries: split
        # any parent whose child is targeted by an adapter
        missing = [k for k in self.adapters if k not in model.params]
        if missing:
            for m in model.root.walk():
                if not hasattr(m, "unfuse"):
                    continue
                child_keys = {c.key for c in m.modules}
                if any(k in child_keys for k in missing):
                    m.unfuse(model.params)
        for key, (a, b) in self.adapters.items():
            if key in model.params:
                p = model.params[key]
                p["lora_a"] = jnp.asarray(a, dtype=jnp.bfloat16)
                p["lora_b"] = jnp.asarray(b, dtype=jnp.bfloat16)
                p["lora_scale"] = jnp.float32(self.scale)
                n += 1
        model._step_cache.clear()  # adapter presence changes the trace
        return n

    def detach(self, model) -> None:
        for key in self.adapters:
            if key in model.params:
                for name in ("lora_a", "lora_b", "lora_scale"):
                    model.params[key].pop(name, None)
        # restore any projection fusion that attach() had to split
        for m in model.root.walk():
            if hasattr(m, "refuse"):
                m.refuse(model.params)
        model._step_cache.clear()


def _read(stc, key):
    if stc.get_dtype_str(key) == "BF16":
        return bf16_to_f32(stc.get_tensor(key, allow_bf16=True))
    return stc.get_tensor(key).astype(np.float32)
