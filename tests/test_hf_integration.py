"""HF Transformers interop: an EXL3 checkpoint loaded through the
integration layer (dense-dequantized torch weights) must produce the same
logits as the JAX runtime — cross-validating our EXL3 decode against HF's
independent Llama implementation."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
from exllamav3_tpu.model import Config, Model, InferParams
from exllamav3_tpu.integration import load_exl3_transformers, patch_transformers


def test_exl3_checkpoint_matches_hf_llama(tmp_path):
    d = str(tmp_path / "m")
    cfg = tiny_llama_cfg(vocab_size=512, hidden_size=128, intermediate_size=256,
                         num_layers=2, num_q_heads=4, num_kv_heads=4)
    write_tiny_llama_exl3(d, cfg, K=4, seed=9)

    ours = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(linear_mode="reconstruct")))
    ours.load()

    # (1) dequantized weights must match our reconstruction EXACTLY
    from exllamav3_tpu.integration import load_exl3_state_dict

    sd = load_exl3_state_dict(d)
    for key in ("model.layers.0.self_attn.q_proj", "model.layers.1.mlp.down_proj",
                "lm_head"):
        lin = ours.root.find(key)
        w_ours = lin.get_weight_f32(ours.params)  # (in, out)
        w_hf = sd[key + ".weight"].numpy()  # (out, in)
        np.testing.assert_allclose(w_ours.T, w_hf, rtol=0, atol=0)

    ids = np.array([[5, 9, 13, 2, 7, 301]], dtype=np.int32)
    ref = np.asarray(ours.forward_simple(ids))
    hf = load_exl3_transformers(d)
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids.astype(np.int64))).logits
        out = out.float().numpy()

    # (2) first position has no positional/accumulation chain: near-exact
    c0 = np.sum(out[0, 0] * ref[0, 0]) / (
        np.linalg.norm(out[0, 0]) * np.linalg.norm(ref[0, 0]) + 1e-9)
    assert c0 > 0.999, c0
    # (3) later positions drift by bf16-vs-f32 op ordering through a RANDOM
    # (untrained, chaotic) model — sanity-bound only
    cos = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref) + 1e-9)
    assert cos > 0.7, cos


def test_quantized_runtime_footprint_and_logits(tmp_path):
    """Exl3HfLinear path: the model must hold packed trellis tensors (EXL3
    footprint, not dense) and produce the same logits as the dense-decoded
    load (identical reconstruction, so near-exact)."""
    d = str(tmp_path / "m")
    cfg = tiny_llama_cfg(vocab_size=512, hidden_size=128, intermediate_size=256,
                         num_layers=2, num_q_heads=4, num_kv_heads=4)
    write_tiny_llama_exl3(d, cfg, K=4, seed=9)

    hq = load_exl3_transformers(d, quantized_runtime=True)
    hd = load_exl3_transformers(d, quantized_runtime=False)
    assert hq._exl3_swapped > 0

    def nbytes(m):
        return sum(t.numel() * t.element_size()
                   for t in list(m.parameters()) + list(m.buffers()))

    # packed trellis at K=4: ~4 bits/weight vs 32 dense; embeddings dominate
    # the tiny model, so just require a solid reduction
    assert nbytes(hq) < 0.6 * nbytes(hd)

    from exllamav3_tpu.integration.transformers import _hf_linear_cls

    assert any(isinstance(m, _hf_linear_cls()) for m in hq.modules())

    ids = torch.from_numpy(np.array([[5, 9, 13, 2, 7, 301]], dtype=np.int64))
    with torch.no_grad():
        lq = hq(input_ids=ids).logits.float().numpy()
        ld = hd(input_ids=ids).logits.float().numpy()
    np.testing.assert_allclose(lq, ld, rtol=1e-4, atol=1e-4)


def test_patch_transformers_registers():
    patch_transformers()
    from transformers.quantizers.auto import AUTO_QUANTIZER_MAPPING

    assert "exl3" in AUTO_QUANTIZER_MAPPING
