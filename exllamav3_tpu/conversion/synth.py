"""Synthetic EXL3 checkpoints for tests and benchmarks.

Any random bit stream is a valid tail-biting trellis (the packed form stores
the stream itself; codes are overlapping windows of it), so we can fabricate
format-correct EXL3 checkpoints of any size instantly — no Viterbi needed.
Decoded weights follow the codebook distribution (~unit std), scaled to sane
magnitudes through svh. Used by tests, bench.py and __graft_entry__.py since
the build environment has no egress to fetch real checkpoints.
"""
from __future__ import annotations

import functools
import json
import math
import os
import shutil

import numpy as np

from ..loader.safetensors import save_file, f32_to_bf16_u16


def _atomic_checkpoint(write_fn):
    """Run a checkpoint writer against a temp sibling directory, then move
    its files into place with config.json LAST. Callers across the repo use
    "config.json exists" as the checkpoint-cache marker (bench.py,
    __graft_entry__.py), so a writer killed mid-flight must never leave a
    marker over missing tensors. Files already in the target are kept."""

    @functools.wraps(write_fn)
    def wrapped(directory: str, *args, **kwargs):
        tmp = f"{directory}.partial{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        try:
            write_fn(tmp, *args, **kwargs)
            os.makedirs(directory, exist_ok=True)
            names = [n for n in os.listdir(tmp) if n != "config.json"]
            for n in names + ["config.json"]:
                os.replace(os.path.join(tmp, n), os.path.join(directory, n))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return directory

    return wrapped


def tiny_llama_cfg(
    vocab_size=512,
    hidden_size=256,
    intermediate_size=512,
    num_layers=2,
    num_q_heads=4,
    num_kv_heads=2,
    head_dim=None,
    rope_scaling=None,
    tie_word_embeddings=False,
    arch="LlamaForCausalLM",
    extra=None,
):
    cfg = {
        "architectures": [arch],
        "model_type": "llama",
        "bos_token_id": 1,
        "eos_token_id": 2,
        "hidden_act": "silu",
        "hidden_size": hidden_size,
        "intermediate_size": intermediate_size,
        "max_position_embeddings": 8192,
        "num_attention_heads": num_q_heads,
        "num_hidden_layers": num_layers,
        "num_key_value_heads": num_kv_heads,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "tie_word_embeddings": tie_word_embeddings,
        "torch_dtype": "bfloat16",
        "vocab_size": vocab_size,
    }
    if head_dim:
        cfg["head_dim"] = head_dim
    if rope_scaling:
        cfg["rope_scaling"] = rope_scaling
    if extra:
        cfg.update(extra)
    return cfg


def synth_exl3_linear(rng, in_features, out_features, K=4, out_std=0.02):
    """Fabricate one EXL3 tensor group with ~N(0, out_std^2) effective weights."""
    tk, tn = in_features // 16, out_features // 16
    trellis = rng.integers(-32768, 32768, size=(tk, tn, 16 * K)).astype(np.int16)
    su = np.sign(rng.standard_normal(in_features)).astype(np.float16)
    sv = (np.sign(rng.standard_normal(out_features)) * out_std).astype(np.float16)
    return {"trellis": trellis, "suh": su, "svh": sv}


@_atomic_checkpoint
def write_tiny_llama_exl3(
    directory: str,
    cfg: dict | None = None,
    K: int = 4,
    seed: int = 0,
    quant_lm_head: bool = True,
):
    """Write a synthetic EXL3-quantized Llama-style checkpoint."""
    os.makedirs(directory, exist_ok=True)
    cfg = cfg or tiny_llama_cfg()
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)

    rng = np.random.default_rng(seed)
    h = cfg["hidden_size"]
    inter = cfg["intermediate_size"]
    nq = cfg["num_attention_heads"]
    nkv = cfg["num_key_value_heads"]
    hd = cfg.get("head_dim") or h // nq
    vocab = cfg["vocab_size"]

    tensors: dict[str, np.ndarray] = {}
    bf16_keys = set()

    def add_bf16(key, arr):
        tensors[key] = f32_to_bf16_u16(arr.astype(np.float32))
        bf16_keys.add(key)

    def add_exl3(key, k_in, n_out, out_std):
        grp = synth_exl3_linear(rng, k_in, n_out, K, out_std)
        for sk, t in grp.items():
            tensors[f"{key}.{sk}"] = t

    add_bf16("model.embed_tokens.weight",
             rng.standard_normal((vocab, h)).astype(np.float32) * 0.02)
    for i in range(cfg["num_hidden_layers"]):
        lk = f"model.layers.{i}"
        add_bf16(f"{lk}.input_layernorm.weight", np.ones(h, np.float32))
        add_bf16(f"{lk}.post_attention_layernorm.weight", np.ones(h, np.float32))
        s = 1.0 / math.sqrt(h)
        add_exl3(f"{lk}.self_attn.q_proj", h, nq * hd, s)
        add_exl3(f"{lk}.self_attn.k_proj", h, nkv * hd, s)
        add_exl3(f"{lk}.self_attn.v_proj", h, nkv * hd, s)
        add_exl3(f"{lk}.self_attn.o_proj", nq * hd, h, s * 0.5)
        add_exl3(f"{lk}.mlp.gate_proj", h, inter, s)
        add_exl3(f"{lk}.mlp.up_proj", h, inter, s)
        add_exl3(f"{lk}.mlp.down_proj", inter, h, s * 0.5)
    add_bf16("model.norm.weight", np.ones(h, np.float32))
    if not cfg.get("tie_word_embeddings"):
        if quant_lm_head:
            add_exl3("lm_head", h, vocab, 1.0 / math.sqrt(h))
        else:
            add_bf16("lm_head.weight", rng.standard_normal((vocab, h)).astype(np.float32) * 0.02)

    save_file(tensors, os.path.join(directory, "model.safetensors"), bf16_keys=bf16_keys)
    return directory


@_atomic_checkpoint
def write_tiny_llama_dense(directory: str, cfg: dict | None = None, seed: int = 0,
                           weight_scale: float | None = None):
    """Write a synthetic DENSE (bf16) Llama-style checkpoint (for testing the
    conversion pipeline end-to-end)."""
    os.makedirs(directory, exist_ok=True)
    cfg = cfg or tiny_llama_cfg()
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)

    rng = np.random.default_rng(seed)
    h = cfg["hidden_size"]
    inter = cfg["intermediate_size"]
    nq = cfg["num_attention_heads"]
    nkv = cfg["num_key_value_heads"]
    hd = cfg.get("head_dim") or h // nq
    vocab = cfg["vocab_size"]
    ws = weight_scale if weight_scale is not None else 1.0 / math.sqrt(h)

    tensors: dict[str, np.ndarray] = {}
    bf16_keys = set()

    def add(key, arr):
        tensors[key] = f32_to_bf16_u16(arr.astype(np.float32))
        bf16_keys.add(key)

    def lin(key, n_out, k_in, scale):
        # HF layout (out, in)
        add(key + ".weight", rng.standard_normal((n_out, k_in)) * scale)

    add("model.embed_tokens.weight", rng.standard_normal((vocab, h)) * 0.02)
    for i in range(cfg["num_hidden_layers"]):
        lk = f"model.layers.{i}"
        add(f"{lk}.input_layernorm.weight", np.ones(h))
        add(f"{lk}.post_attention_layernorm.weight", np.ones(h))
        lin(f"{lk}.self_attn.q_proj", nq * hd, h, ws)
        lin(f"{lk}.self_attn.k_proj", nkv * hd, h, ws)
        lin(f"{lk}.self_attn.v_proj", nkv * hd, h, ws)
        lin(f"{lk}.self_attn.o_proj", h, nq * hd, ws * 0.5)
        lin(f"{lk}.mlp.gate_proj", inter, h, ws)
        lin(f"{lk}.mlp.up_proj", inter, h, ws)
        lin(f"{lk}.mlp.down_proj", h, inter, ws * 0.5)
    add("model.norm.weight", np.ones(h))
    if not cfg.get("tie_word_embeddings"):
        lin("lm_head", vocab, h, 0.02 * math.sqrt(h))

    save_file(tensors, os.path.join(directory, "model.safetensors"), bf16_keys=bf16_keys)
    return directory


@_atomic_checkpoint
def write_synth_dense_for_arch(directory: str, cfg: dict, seed: int = 0,
                               fused_phi3: bool = False):
    """Write a dense bf16 checkpoint for ANY registered architecture by
    introspecting the module tree (walks Linears/norms/embeddings)."""
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)

    from ..model.config import Config
    from ..model.model import Model
    from ..modules import (Linear, RMSNorm, LayerNorm, GatedRMSNorm,
                           Embedding, GatedDeltaNet, Mamba2)
    from ..modules.block_sparse_mlp import BlockSparseMLP
    from ..modules.mla_attn import MLAttention

    # nanochat detects its VE/resid/backout features from tensor PRESENCE, so
    # those tensors must exist before the config is built
    if cfg.get("architectures", [""])[0] == "NanoChatForCausalLM":
        _write_nanochat_extras(directory, cfg, seed)

    config = Config.from_directory(directory)
    model = Model.from_config(config)

    rng = np.random.default_rng(seed)
    tensors: dict[str, np.ndarray] = {}
    bf16_keys = set()

    def add(key, arr):
        if key in tensors:
            return
        tensors[key] = f32_to_bf16_u16(arr.astype(np.float32))
        bf16_keys.add(key)

    def add_linear(lin: Linear, with_bias: bool = False):
        scale = 1.0 / math.sqrt(max(lin.in_features, 1))
        if fused_phi3 and lin.fkey:
            return  # emitted as fused below
        add(lin.key + ".weight",
            rng.standard_normal((lin.out_features, lin.in_features)) * scale)
        if with_bias:
            add(lin.key + ".bias", rng.standard_normal(lin.out_features) * 0.02)

    fused: dict[str, int] = {}
    walk_modules = list(model.modules)
    if "mtp" in getattr(config, "model_classes", {}):
        # MTP/DSpark component modules go through the same emission
        walk_modules += Model.from_config(config, component="mtp").modules
    for module in walk_modules:
        for m in module.walk():
            if isinstance(m, BlockSparseMLP):
                if m.key_gate_up_split:
                    # gpt-oss stacked layout (+ biases, biased router)
                    E, h, i = m.num_experts, m.hidden_size, m.intermediate_size
                    s = 1.0 / math.sqrt(h)
                    add(f"{m.key}.{m.key_gate_up_split}",
                        rng.standard_normal((E, h, 2 * i)) * s)
                    add(f"{m.key}.{m.key_gate_up_split}_bias",
                        rng.standard_normal((E, 2 * i)) * 0.02)
                    add(f"{m.key}.{m.key_down_split}",
                        rng.standard_normal((E, i, h)) / math.sqrt(i))
                    add(f"{m.key}.{m.key_down_split}_bias",
                        rng.standard_normal((E, h)) * 0.02)
                else:
                    for lin in m._expert_linears:
                        add_linear(lin)
                if m.routing in ("ds3", "group_greedy"):
                    ebk = (f"{m.key}.{m.key_e_score_bias}" if m.key_e_score_bias
                           else m.router.key + ".e_score_correction_bias")
                    add(ebk, rng.standard_normal(m.num_experts) * 0.05)
                if m.routing == "std_bias":
                    add_linear(m.router, with_bias=True)
                if m.routing == "sqrtsp":
                    add(f"{m.key}.{m.key_e_score_bias}",
                        rng.standard_normal(m.num_experts) * 0.05)
                if m.key_per_expert_scale:
                    add(f"{m.key}.{m.key_per_expert_scale}",
                        rng.uniform(0.8, 1.2, m.num_experts))
                if m.key_tid2eid:
                    t2e = rng.integers(
                        0, m.num_experts,
                        size=(cfg["vocab_size"], m.top_k)).astype(np.int32)
                    if f"{m.key}.{m.key_tid2eid}" not in tensors:
                        tensors[f"{m.key}.{m.key_tid2eid}"] = t2e
            from ..modules import Attention as _Attn
            from ..modules import MLP as _MLP, GatedMLP as _GMLP

            if isinstance(m, _Attn) and m.has_sinks:
                add(f"{m.key}.sinks", rng.standard_normal(m.num_q_heads) * 0.5)
            from ..modules.transformer import TransformerBlock as _TB

            if isinstance(m, _TB) and m.key_layer_scalar:
                add(f"{m.key}.{m.key_layer_scalar}",
                    rng.uniform(0.8, 1.2, 1))
            from ..modules.dsv4_attn import DSV4Attention as _DSV4
            from ..modules import HyperConnection as _HC, HyperHead as _HH

            if isinstance(m, _DSV4):
                add(f"{m.key}.attn_sink",
                    rng.standard_normal(m.num_q_heads) * 0.5)
                for comp in (m.compressor, m.indexer):
                    if comp is not None:
                        add(f"{comp.key}.ape",
                            rng.standard_normal(
                                (comp.compress_rate, comp.proj_width)) * 0.3)
            if isinstance(m, _HC):
                hcm = m.hc_mult
                add(f"{m.key}_fn", rng.standard_normal(
                    ((2 + hcm) * hcm, hcm * m.hidden_size)) * 0.02)
                add(f"{m.key}_base", rng.standard_normal((2 + hcm) * hcm) * 0.1)
                add(f"{m.key}_scale", rng.uniform(0.5, 1.5, 3))
            if isinstance(m, _HH):
                hcm = m.hc_mult
                hs = cfg.get("hidden_size")
                add(f"{m.key}_fn",
                    rng.standard_normal((hcm, hcm * hs)) * 0.02)
                add(f"{m.key}_base", rng.standard_normal(hcm) * 0.1)
                add(f"{m.key}_scale", rng.uniform(0.5, 1.5, hcm))
            if isinstance(m, (_MLP, _GMLP)) and m.activation == "xielu":
                add(m.key_alpha_p or f"{m.key}.act_fn.alpha_p",
                    rng.standard_normal(1) * 0.5)
                add(m.key_alpha_n or f"{m.key}.act_fn.alpha_n",
                    rng.standard_normal(1) * 0.5)
            if isinstance(m, MLAttention):
                # kv_b is read raw (never through a Linear) — emit HF layout
                H = m.num_q_heads
                rows = H * (m.qk_nope_head_dim + m.v_head_dim)
                add(f"{m.key}.{m.key_kv_b}.weight",
                    rng.standard_normal((rows, m.kv_lora_rank))
                    / math.sqrt(m.kv_lora_rank))
            if isinstance(m, (GatedDeltaNet, Mamba2)):
                Hv = m.num_v_heads
                add(m.key_a_log, np.log(rng.uniform(1.0, 8.0, Hv)))
                add(m.key_dt_bias, rng.standard_normal(Hv) * 0.5)
                if getattr(m, "keys_conv_qkv", None):
                    for ck, dim in zip(m.keys_conv_qkv,
                                       (m.k_dim, m.k_dim, m.v_dim)):
                        add(ck + ".weight",
                            rng.standard_normal((dim, 1, m.conv_kernel_size)) * 0.3)
                else:
                    add(m.key_conv1d + ".weight",
                        rng.standard_normal((m.conv_dim, 1, m.conv_kernel_size)) * 0.3)
                if isinstance(m, Mamba2):
                    add(m.key_conv1d + ".bias", rng.standard_normal(m.conv_dim) * 0.05)
                    add(m.key_d, rng.uniform(0.5, 1.5, Hv))
            from ..modules.short_conv import ShortConv as _SC

            if isinstance(m, _SC):
                add(m.key_conv1d + ".weight",
                    rng.standard_normal((m.conv_dim, 1, m.conv_kernel_size)) * 0.3)
            if isinstance(m, Linear):
                if m.alt_key and not m.key.startswith("lm_head"):
                    continue
                if m.alt_key == "model.embed_tokens":
                    continue  # tied head
                add_linear(m)
                if fused_phi3 and m.fkey:
                    fused[m.fkey] = max(fused.get(m.fkey, 0), m.frange[1])
            elif isinstance(m, (RMSNorm, LayerNorm, GatedRMSNorm)):
                if getattr(m, "unweighted", False):
                    continue
                dim = (getattr(m, "dim", None) or cfg.get("hidden_size")
                       or cfg.get("text_config", {}).get("hidden_size"))
                arch_l = str(cfg.get("architectures", [""])[0]).lower()
                is_gemma = "gemma" in arch_l and "gemma4" not in arch_l
                nkey = (m.key + ".weight"
                        if getattr(m, "tensor_suffix", True) else m.key)
                add(nkey, np.zeros(dim) if is_gemma else np.ones(dim))
            elif isinstance(m, Embedding):
                add(m.key + ".weight",
                    rng.standard_normal((m.vocab_size, m.hidden_size)) * 0.02)

    if fused_phi3:
        # emit fused qkv/gate_up tensors instead of the per-slice ones
        for module in model.modules:
            for m in module.walk():
                if isinstance(m, Linear) and m.fkey:
                    n_out = fused.get(m.fkey, 0)
                    if n_out and m.fkey + ".weight" not in tensors:
                        scale = 1.0 / math.sqrt(max(m.in_features, 1))
                        add(m.fkey + ".weight",
                            rng.standard_normal((n_out, m.in_features)) * scale)


    # vision component (multimodal architectures)
    if "vision" in getattr(config, "model_classes", {}):
        from ..modules.vision import SiglipVisionTower, Gemma3MultimodalProjector

        vm = Model.from_config(config, component="vision")
        for module in vm.modules:
            for m in module.walk():
                if isinstance(m, Linear):
                    add_linear(m)
                elif isinstance(m, (RMSNorm, LayerNorm)):
                    dim = (getattr(m, "dim", None) or cfg.get("hidden_size")
                       or cfg.get("text_config", {}).get("hidden_size"))
                    add(m.key + ".weight", np.ones(dim))
                if isinstance(m, SiglipVisionTower):
                    P, D = m.patch_size, m.hidden
                    add(f"{m.key}.embeddings.patch_embedding.weight",
                        rng.standard_normal((D, 3, P, P)) / math.sqrt(P * P * 3))
                    add(f"{m.key}.embeddings.patch_embedding.bias",
                        rng.standard_normal(D) * 0.02)
                    add(f"{m.key}.embeddings.position_embedding.weight",
                        rng.standard_normal((m.num_patches, D)) * 0.02)
                from ..modules.vision_qwen import Qwen25VisionTower as _QVT
                from ..modules.vision_qwen import Qwen3VisionTower as _Q3VT

                if isinstance(m, (_QVT, _Q3VT)):
                    P, Tp, D = m.patch_size, m.temporal_patch_size, m.hidden
                    add(f"{m.key}.patch_embed.proj.weight",
                        rng.standard_normal((D, 3, Tp, P, P))
                        / math.sqrt(Tp * P * P * 3))
                if isinstance(m, _Q3VT):
                    add(f"{m.key}.patch_embed.proj.bias",
                        rng.standard_normal(m.hidden) * 0.02)
                    add(f"{m.key}.pos_embed.weight",
                        rng.standard_normal((m.num_pos, m.hidden)) * 0.02)
                from ..modules.vision_pixtral import PixtralVisionTower as _PVT

                if isinstance(m, _PVT):
                    P, D = m.patch_size, m.hidden
                    add(f"{m.key}.patch_conv.weight",
                        rng.standard_normal((D, 3, P, P)) / math.sqrt(P * P * 3))
                from ..modules.vision_step3 import Step3VisionTower as _S3VT

                if isinstance(m, _S3VT):
                    P, D = m.patch_size, m.width
                    add(f"{m.key}.conv1.weight",
                        rng.standard_normal((D, 3, P, P)) / math.sqrt(P * P * 3))
                    add(f"{m.key}.positional_embedding",
                        rng.standard_normal((m.base_grid ** 2, D)) * 0.02)
                    add(f"{m.key}.vit_downsampler1.weight",
                        rng.standard_normal((2 * D, D, 3, 3))
                        / math.sqrt(9 * D))
                    add(f"{m.key}.vit_downsampler1.bias",
                        rng.standard_normal(2 * D) * 0.02)
                    add(f"{m.key}.vit_downsampler2.weight",
                        rng.standard_normal((4 * D, 2 * D, 3, 3))
                        / math.sqrt(18 * D))
                    add(f"{m.key}.vit_downsampler2.bias",
                        rng.standard_normal(4 * D) * 0.02)
                    for blk in m.blocks:
                        add(f"{blk.key}.ls_1.gamma",
                            rng.uniform(0.05, 0.15, D))
                        add(f"{blk.key}.ls_2.gamma",
                            rng.uniform(0.05, 0.15, D))
                from ..modules.vision_gemma4 import Gemma4VisionTower as _G4VT
                from ..modules.vision_gemma4 import (
                    Gemma4UnifiedVisionEmbedder as _G4U)

                if isinstance(m, _G4U):
                    add(f"{m.key}.pos_embedding",
                        rng.standard_normal((64, 2, m.mm_embed_dim)) * 0.02)
                if isinstance(m, _G4VT):
                    add(f"{m.key}.patch_embedder.position_embedding_table",
                        rng.standard_normal((2, m.pos_size, m.hidden)) * 0.02)
                    if m.standardize:
                        add(f"{m.key}.std_bias",
                            rng.standard_normal(m.hidden) * 0.02)
                        add(f"{m.key}.std_scale",
                            rng.uniform(0.8, 1.2, m.hidden))
                from ..modules.vision_glm import Glm4vVisionTower as _GVT

                if isinstance(m, _GVT):
                    P, Tp, D = m.patch_size, m.temporal_patch_size, m.hidden
                    add(f"{m.key}.patch_embed.proj.weight",
                        rng.standard_normal((D, 3, Tp, P, P))
                        / math.sqrt(Tp * P * P * 3))
                    add(f"{m.key}.patch_embed.proj.bias",
                        rng.standard_normal(D) * 0.02)
                    add(f"{m.key}.embeddings.position_embedding.weight",
                        rng.standard_normal((m.grid_side ** 2, D)) * 0.02)
                    mm_ = m.merge
                    add(f"{m.key}.downsample.weight",
                        rng.standard_normal((m.out_hidden, D, mm_, mm_))
                        / math.sqrt(D * mm_ * mm_))
                    add(f"{m.key}.downsample.bias",
                        rng.standard_normal(m.out_hidden) * 0.02)
                if isinstance(m, Gemma3MultimodalProjector):
                    add(f"{m.key}.mm_input_projection_weight",
                        rng.standard_normal((m.vision_hidden, m.text_hidden))
                        / math.sqrt(m.vision_hidden))

    save_file(tensors, os.path.join(directory, "model.safetensors"), bf16_keys=bf16_keys)
    return directory


def _write_nanochat_extras(directory: str, cfg: dict, seed: int) -> None:
    """Value-embedding tables and residual scalars for a synthetic nanochat
    checkpoint (written first: NanoChatConfig feature-detects on them)."""
    rng = np.random.default_rng(seed + 7)
    L = cfg["num_hidden_layers"]
    nkv = cfg.get("num_key_value_heads", cfg["num_attention_heads"])
    hd = cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"]
    V = cfg["vocab_size"]
    tensors = {
        "resid_lambdas": rng.uniform(0.9, 1.1, L).astype(np.float32),
        "x0_lambdas": rng.uniform(-0.1, 0.1, L).astype(np.float32),
        "backout_lambda": np.array([0.25], np.float32),
    }
    bf16_keys = set()
    for i in range(L // 2):
        k = f"value_embeds.{2 * i + 1}.weight"
        tensors[k] = f32_to_bf16_u16(
            rng.standard_normal((V, nkv * hd)).astype(np.float32) * 0.02)
        bf16_keys.add(k)
    save_file(tensors, os.path.join(directory, "model.extras.safetensors"),
              bf16_keys=bf16_keys)

def write_synth_tokenizer(directory: str) -> None:
    """Byte-level tokenizer files for synthetic checkpoints (tests/eval
    harnesses need a real text round-trip; vocab = 256 byte alphabet)."""
    import json as _json
    from tokenizers import Tokenizer as HFT, models, pre_tokenizers, decoders

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    vocab = {tok: i for i, tok in enumerate(alphabet)}
    hft = HFT(models.BPE(vocab=vocab, merges=[]))
    hft.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    hft.decoder = decoders.ByteLevel()
    hft.save(os.path.join(directory, "tokenizer.json"))
    with open(os.path.join(directory, "tokenizer_config.json"), "w") as f:
        _json.dump({}, f)
