"""Compile a converted model directory: merge quantized tensors with the
source's non-quantized tensors into sharded safetensors + updated config.

Feature reference: /root/reference/exllamav3/conversion/compile.py
(compile_model:19 — <=8GB shards, quantization_config, safetensors index).
"""
from __future__ import annotations

import json
import os
import shutil

import numpy as np

from ..loader.safetensors import SafetensorsCollection, save_file

SHARD_BYTES = 8 * 1024**3

_TOKENIZER_FILES = (
    "tokenizer.json",
    "tokenizer_config.json",
    "special_tokens_map.json",
    "generation_config.json",
    "tokenizer.model",
)


def compile_model(in_dir: str, out_dir: str, bpw: float, head_bits: int,
                  serving_bits: int | None = None):
    qdir = os.path.join(out_dir, "qtensors")
    q_stc = SafetensorsCollection(qdir)
    src_stc = SafetensorsCollection(in_dir)

    # quantized linears replace their source "<key>.weight"
    quantized_prefixes = {k.rsplit(".", 1)[0] for k in q_stc.keys()}

    tensors: dict[str, np.ndarray] = {}
    bf16_keys = set()
    for key in q_stc.keys():
        tensors[key] = q_stc.get_tensor(key)
    for key in src_stc.keys():
        prefix = key.rsplit(".", 1)[0]
        if prefix in quantized_prefixes and key.endswith(".weight"):
            continue
        if src_stc.get_dtype_str(key) == "BF16":
            tensors[key] = src_stc.get_tensor(key, allow_bf16=True)
            bf16_keys.add(key)
        else:
            tensors[key] = src_stc.get_tensor(key)

    # write shards
    shards: list[dict] = [{}]
    size = 0
    for key in sorted(tensors.keys()):
        nb = tensors[key].nbytes
        if size + nb > SHARD_BYTES and shards[-1]:
            shards.append({})
            size = 0
        shards[-1][key] = tensors[key]
        size += nb

    weight_map = {}
    n = len(shards)
    for i, shard in enumerate(shards):
        fn = (
            "model.safetensors"
            if n == 1
            else f"model-{i+1:05d}-of-{n:05d}.safetensors"
        )
        save_file(shard, os.path.join(out_dir, fn),
                  bf16_keys=tuple(k for k in shard if k in bf16_keys))
        for k in shard:
            weight_map[k] = fn
    if n > 1:
        with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
            json.dump({"weight_map": weight_map}, f)

    # config with quantization metadata
    with open(os.path.join(in_dir, "config.json")) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {
        "quant_method": "exl3",
        "version": "0.1",
        "bits": bpw,
        "head_bits": head_bits,
        "producer": "exllamav3_tpu",
    }
    if serving_bits:
        cfg["quantization_config"]["serving_bits"] = serving_bits
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)

    for fn in _TOKENIZER_FILES:
        src = os.path.join(in_dir, fn)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, fn))

    q_stc.close()
    src_stc.close()
