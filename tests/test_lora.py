"""LoRA: PEFT adapter load/attach changes outputs; detach restores."""
import json
import os

import numpy as np

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3
from exllamav3_tpu.model import Config, Model, InferParams
from exllamav3_tpu.model.lora import LoRA
from exllamav3_tpu.loader.safetensors import save_file


def _write_adapter(d, r=4, alpha=8):
    os.makedirs(d, exist_ok=True)
    json.dump({"r": r, "lora_alpha": alpha, "peft_type": "LORA",
               "target_modules": ["q_proj"]},
              open(os.path.join(d, "adapter_config.json"), "w"))
    rng = np.random.default_rng(0)
    tensors = {}
    for layer in (0, 1):
        base = f"base_model.model.model.layers.{layer}.self_attn.q_proj"
        tensors[base + ".lora_A.weight"] = (rng.standard_normal((r, 256)) * 0.05).astype(np.float32)
        tensors[base + ".lora_B.weight"] = (rng.standard_normal((256, r)) * 0.05).astype(np.float32)
    save_file(tensors, os.path.join(d, "adapter_model.safetensors"))


def test_lora_attach_detach(tmp_path):
    mdir = str(tmp_path / "m")
    adir = str(tmp_path / "a")
    write_tiny_llama_exl3(mdir, seed=3)
    _write_adapter(adir)

    model = Model.from_config(Config.from_directory(
        mdir, infer_params=InferParams(linear_mode="bf16")))
    model.load()

    ids = np.arange(8).reshape(1, 8).astype(np.int32) % 400
    base = np.asarray(model.forward_simple(ids))

    lora = LoRA.from_directory(adir)
    n = lora.attach(model)
    assert n == 2
    with_lora = np.asarray(model.forward_simple(ids))
    assert not np.allclose(with_lora, base)

    lora.detach(model)
    restored = np.asarray(model.forward_simple(ids))
    np.testing.assert_array_equal(restored, base)
