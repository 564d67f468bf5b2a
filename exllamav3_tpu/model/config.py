"""Model configuration: HF config.json parsing + architecture dispatch.

Feature reference: /root/reference/exllamav3/model/config.py (Config:72,
read_cfg/assert_cfg:176-206, from_directory:210) — reimagined without torch:
a Config subclass per architecture reads its parameters, owns the
SafetensorsCollection, and names the Model class that assembles modules.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from ..loader.safetensors import SafetensorsCollection
from ..util.rope import RopeSettings, RopeStyle


class _NoDefault:
    pass


no_default = _NoDefault()


@dataclass
class InferParams:
    """Runtime tunables (reference model/config.py:11-64)."""

    # EXL3 linear runtime representation: "auto" | "fused" | "int4" | "int8" | "bf16" | "reconstruct"
    linear_mode: str = "auto"
    # rows <= this use the decode-optimized path; more rows use reconstruct+GEMM
    reconstruct_threshold: int = 32
    # MoE decode body: "auto" (selected-expert Pallas kernel on TPU) |
    # "dense" (einsum over all experts — REQUIRED under expert-parallel
    # GSPMD sharding, where XLA partitions the einsum). EXL3_TPU_MOE
    # overrides (util/env.py).
    moe_decode: str = "auto"
    # host-offload MoE expert stacks (capacity mode, reference
    # moe_cpu_host.py): experts requantize to host-RAM int8 and compute on
    # the CPU threadpool via a pure_callback inside the traced step; the
    # device keeps router + shared experts + all dense/attention tensors
    moe_offload: bool = False
    max_chunk_size: int = 2048
    activation_dtype: str = "bfloat16"
    # fuse q/k/v and gate/up into single matmuls at load (the reference's
    # MultiLinear/MGEMM batching, modules/multilinear.py:5) — fewer, larger
    # kernels on the decode path. Disable under TP channel splits.
    fuse_projections: bool = True


class Config:
    arch_string: str | None = None

    def __init__(self, directory: str, model_classes: dict, **kwargs):
        self.directory = directory
        self.model_classes = model_classes
        self.infer_params = kwargs.get("infer_params") or InferParams()
        cfg_path = os.path.join(directory, "config.json")
        with open(cfg_path, "r") as f:
            self.cfg = json.load(f)
        self.stc = SafetensorsCollection(directory)

        self.architectures = self.cfg.get("architectures", [])
        self.bos_token_id = self.read_cfg((int, list), "bos_token_id", None)
        self.eos_token_id = self.read_cfg((int, list), "eos_token_id", None)
        self.pad_token_id = self.read_cfg(int, "pad_token_id", None)
        self.vocab_size = self.read_cfg(int, "vocab_size", no_default)
        self.hidden_size = self.read_cfg(int, "hidden_size", no_default)
        self.max_position_embeddings = self.read_cfg(int, "max_position_embeddings", 4096)
        self.quantization_config = self.cfg.get("quantization_config")

    # -- config readers --------------------------------------------------

    def _walk(self, keys):
        """keys may be 'a.b.c' path or list of fallbacks. Keys missing at the
        top level fall back to text_config.<key> (HF conditional-generation
        configs nest the text model's parameters there)."""
        if isinstance(keys, str):
            keys = [keys]
        keys = list(keys)
        if isinstance(self.cfg.get("text_config"), dict):
            keys = keys + [f"text_config.{k}" for k in keys
                           if not k.startswith("text_config")]
        for key in keys:
            node = self.cfg
            ok = True
            for part in key.replace("->", ".").split("."):
                if isinstance(node, dict) and part in node:
                    node = node[part]
                else:
                    ok = False
                    break
            if ok and node is not None:
                return node
        return None

    def read_cfg(self, types, keys, default):
        v = self._walk(keys)
        if v is None:
            if isinstance(default, _NoDefault):
                raise ValueError(f"missing config key: {keys} in {self.directory}")
            return default
        if types is bool and isinstance(v, bool):
            return v
        if types is int and isinstance(v, bool):
            raise ValueError(f"config key {keys}: bool where int expected")
        if types in (int, float) and isinstance(v, (int, float)):
            return types(v)
        return v

    def assert_cfg(self, types, keys, value, optional: bool = False):
        v = self._walk(keys)
        if v is None and optional:
            return
        if v != value:
            raise ValueError(f"unsupported config: {keys} = {v!r}, expected {value!r}")

    def read_rope_settings_default(self, style: RopeStyle, head_dim: int | None = None,
                                   override_type: str | None = None,
                                   default_theta: float = 10000.0,
                                   key_prefix: str = "") -> RopeSettings:
        head_dim = head_dim or getattr(self, "head_dim", None) or (
            self.hidden_size // self.read_cfg(int, "num_attention_heads", 1)
        )
        pre = key_prefix
        rope_scaling = self.read_cfg(dict, pre + "rope_scaling", None)
        if override_type == "default":
            rope_scaling = None  # e.g. Olmo3 sliding layers use unscaled rope
        elif override_type is not None and rope_scaling is not None:
            rope_scaling = dict(rope_scaling, rope_type=override_type)
        return RopeSettings(
            head_dim=head_dim,
            rope_theta=self.read_cfg(float, pre + "rope_theta", default_theta),
            rope_scaling=rope_scaling,
            rotary_dim=self.read_cfg(int, pre + "rotary_dim", None),
            partial_rotary_factor=self.read_cfg(
                float, pre + "partial_rotary_factor", 1.0),
            max_position_embeddings=self.max_position_embeddings,
            original_max_position_embeddings=self.read_cfg(
                int, pre + "original_max_position_embeddings", None
            ),
            rope_style=style,
        )

    # -- factory ----------------------------------------------------------

    @staticmethod
    def from_directory(directory: str, **kwargs) -> "Config":
        from ..architectures import get_architectures

        with open(os.path.join(directory, "config.json"), "r") as f:
            cfg = json.load(f)
        archs = cfg.get("architectures") or []
        registry = get_architectures()
        for arch in archs:
            if arch in registry:
                return registry[arch]["config_class"](directory, **kwargs)
        raise ValueError(f"unsupported architecture(s): {archs}")


class NullConfig(Config):
    """Placeholder config for modules constructed without a checkpoint."""

    def __init__(self):
        self.directory = None
        self.model_classes = {}
        self.infer_params = InferParams()
        self.cfg = {}
        self.stc = None
        self.architectures = []
        self.vocab_size = 0
        self.hidden_size = 0
