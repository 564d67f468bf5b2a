"""Host-offloaded MoE experts (capacity mode): the pure_callback path with
CPU-resident int8 expert stacks must reproduce the on-device routed compute
to int8 accuracy, through both the direct module forward and a jitted
end-to-end model step.

Reference capability: /root/reference/exllamav3/model/moe_cpu_host.py (CPU
expert offload; its int8 activation class is quoted at ~0.9% per-call output
RMS, exllamav3_ext/cpu/moe_mul1.cpp:33-41)."""
import numpy as np
import jax.numpy as jnp
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, InferParams
from exllamav3_tpu.model import moe_host
from exllamav3_tpu.modules.block_sparse_mlp import BlockSparseMLP
from exllamav3_tpu.modules.module import ForwardCtx


def _cfg(arch, **extra):
    cfg = dict(architectures=[arch], bos_token_id=1, eos_token_id=2,
               vocab_size=256, hidden_size=128, intermediate_size=64,
               max_position_embeddings=2048, num_attention_heads=4,
               num_key_value_heads=2, num_hidden_layers=1, rms_norm_eps=1e-5,
               rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
               hidden_act="silu", moe_intermediate_size=64)
    cfg.update(extra)
    return cfg


def test_native_kernel_matches_numpy():
    """moe_ffn_int8 (C++ threadpool) vs the numpy golden, same int8 math."""
    from exllamav3_tpu.native.build import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    E, h, inter, T, k = 6, 96, 80, 5, 2
    wg = rng.standard_normal((E, h, inter)).astype(np.float32) * 0.2
    wu = rng.standard_normal((E, h, inter)).astype(np.float32) * 0.2
    wd = rng.standard_normal((E, inter, h)).astype(np.float32) * 0.2
    bu = rng.standard_normal((E, inter)).astype(np.float32) * 0.05
    bd = rng.standard_normal((E, h)).astype(np.float32) * 0.05
    moe_host.reset()
    lidx = moe_host.register_layer(wg, wu, wd, bu=bu, bd=bd,
                                   activation="silu")
    x = rng.standard_normal((T, h)).astype(np.float32)
    topi = np.stack([rng.choice(E, size=k, replace=False)
                     for _ in range(T)]).astype(np.int32)
    topv = np.abs(rng.standard_normal((T, k))).astype(np.float32)
    topv[0, 1] = 0.0  # dead slot must be skipped identically

    got = moe_host.forward(lidx, x, topi, topv)
    want = moe_host._forward_np(moe_host._layers[lidx], x, topi, topv)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    moe_host.reset()


@pytest.mark.parametrize("arch,extra", [
    ("MixtralForCausalLM", dict(num_local_experts=8, num_experts_per_tok=2)),
    ("GptOssForCausalLM", dict(num_local_experts=8, num_experts_per_tok=2,
                               sliding_window=64, swiglu_limit=7.0,
                               layer_types=["sliding_attention",
                                            "full_attention"])),
])
def test_offload_matches_device(tmp_path, arch, extra):
    """Same checkpoint loaded twice — device experts vs host-offloaded int8
    experts — must agree to int8 accuracy on the MoE module output."""
    d = str(tmp_path / arch)
    write_synth_dense_for_arch(d, _cfg(arch, **extra), seed=11)

    model = Model.from_config(Config.from_directory(d))
    model.load()
    moe = next(m for m in model.root.walk() if isinstance(m, BlockSparseMLP))

    moe_host.reset()
    model_off = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(moe_offload=True)))
    model_off.load()
    moe_off = next(m for m in model_off.root.walk()
                   if isinstance(m, BlockSparseMLP))
    assert moe_off.offload_lidx is not None
    assert moe_host.host_ram_bytes() > 0
    # the device param group must not carry the expert stacks
    assert not any(k.startswith("w_")
                   for k in model_off.params.get(moe_off.key, {}))

    rng = np.random.default_rng(2)
    for T in (1, 16):
        x = jnp.asarray(rng.standard_normal((1, T, 128)), dtype=jnp.bfloat16)
        ctx = ForwardCtx(positions=jnp.zeros((1, T), jnp.int32))
        dev = np.asarray(moe.forward(x, model.params, ctx), np.float32)
        off = np.asarray(moe_off.forward(x, model_off.params, ctx),
                         np.float32)
        rel = np.linalg.norm(off - dev) / (np.linalg.norm(dev) + 1e-9)
        assert rel < 0.05, f"T={T}: rel RMS {rel}"
        cos = np.sum(off * dev) / (np.linalg.norm(off)
                                   * np.linalg.norm(dev) + 1e-9)
        assert cos > 0.995
    moe_host.reset()


def test_offload_e2e_jitted_forward(tmp_path):
    """pure_callback must survive the jitted model step (the path decode
    bursts trace): logits of the offloaded model track the device model."""
    arch = "MixtralForCausalLM"
    d = str(tmp_path / arch)
    write_synth_dense_for_arch(
        d, _cfg(arch, num_local_experts=4, num_experts_per_tok=2), seed=3)

    model = Model.from_config(Config.from_directory(d))
    model.load()
    moe_host.reset()
    model_off = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(moe_offload=True)))
    model_off.load()

    ids = np.array([[5, 9, 2, 7, 1, 3, 8, 4]], dtype=np.int32)
    ref = np.asarray(model.forward_simple(ids), np.float32)
    # forward_simple jits its step: this traces the pure_callback under jit
    got = np.asarray(model_off.forward_simple(ids), np.float32)
    lp = ref - ref.max(-1, keepdims=True)
    lq = got - got.max(-1, keepdims=True)
    p = np.exp(lp) / np.exp(lp).sum(-1, keepdims=True)
    q = np.exp(lq) / np.exp(lq).sum(-1, keepdims=True)
    kld = float(np.mean(np.sum(p * (np.log(p + 1e-12) - np.log(q + 1e-12)),
                               axis=-1)))
    assert kld < 0.05, f"offload KLD vs device {kld}"
    moe_host.reset()
