"""Architecture registry.

Feature reference: /root/reference/exllamav3/architecture/architectures.py:56
(the reference registers ~57 architectures; this registry grows toward that
set — each entry maps the HF `architectures` string to config/model classes).
"""
from __future__ import annotations

from functools import lru_cache


@lru_cache
def get_architectures() -> dict:
    registry: dict = {}

    def register(config_cls):
        registry[config_cls.arch_string] = {
            "config_class": config_cls,
        }

    from . import llama

    register(llama.LlamaConfig)
    register(llama.MistralConfig)
    register(llama.Qwen2Config)
    register(llama.Qwen3Config)

    for mod_name in ("gemma", "phi", "moe", "glm", "deepseek", "qwen3_next",
                     "nemotron_h", "llama_variants", "cohere", "gpt_oss",
                     "qwen3_5", "lfm2", "olmo_hybrid", "afmoe", "misc",
                     "vl_text", "step3_hcx", "dflash", "nanochat", "laguna", "deepseek_v4", "gemma4"):
        try:
            import importlib

            mod = importlib.import_module(f".{mod_name}", __package__)
            for cls in getattr(mod, "ARCHITECTURES", []):
                register(cls)
        except ImportError:
            continue
    return registry
