"""Phi-3 family (fused qkv_proj / gate_up_proj checkpoints).

Feature reference: /root/reference/exllamav3/architecture/phi3.py.
Dense checkpoints store fused tensors; EXL3 conversions store each logical
slice under its own key, so the Linear fkey/frange mechanism covers both.
"""
from __future__ import annotations

import jax.numpy as jnp

from .llama import LlamaConfig, LlamaModel
from ..modules import TransformerBlock, Attention, GatedMLP


class Phi3Config(LlamaConfig):
    arch_string = "Phi3ForCausalLM"

    def __init__(self, directory: str, **kwargs):
        super().__init__(directory, derived_model={"text": Phi3Model}, **kwargs)


class Phi3Model(LlamaModel):
    config_class = Phi3Config

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        hd = config.head_dim
        nq, nkv = config.num_q_heads, config.num_kv_heads
        for m in self.modules:
            if not isinstance(m, TransformerBlock):
                continue
            attn: Attention = m.attn
            fk = f"{m.key}.self_attn.qkv_proj"
            attn.q_proj.fkey = fk
            attn.q_proj.frange = (0, nq * hd)
            attn.k_proj.fkey = fk
            attn.k_proj.frange = (nq * hd, (nq + nkv) * hd)
            attn.v_proj.fkey = fk
            attn.v_proj.frange = ((nq + nkv) * hd, (nq + 2 * nkv) * hd)
            mlp: GatedMLP = m.mlp
            fg = f"{m.key}.mlp.gate_up_proj"
            inter = config.intermediate_size
            mlp.gate.fkey = fg
            mlp.gate.frange = (0, inter)
            mlp.up.fkey = fg
            mlp.up.frange = (inter, 2 * inter)


ARCHITECTURES = [Phi3Config]
