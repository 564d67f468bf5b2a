"""Packed int-B (3/5/6-bit) weight modes: pack/unpack roundtrip, Pallas
kernel exactness vs the jnp reference (interpret mode), the W·A8 int8-MXU
variant, end-to-end linear modes, and the quality ordering
int4 > int5 > int6 requant noise. Feature reference: the reference serves
any bpw from one trellis format (exllamav3_ext/quant/exl3_gemm.cu); the
TPU runtime instead exposes a byte-width Pareto (doc/performance.md)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exllamav3_tpu.ops.q_matmul import (
    INTB_GROUP,
    intb_bits_from_shapes,
    intb_geometry,
    intb_matmul,
    intb_matmul_pallas,
    intb_matmul_pallas_a8,
    intb_matmul_ref,
    intb_pack_jnp,
    intb_unpack_jnp,
)


@pytest.mark.parametrize("bits", [3, 5, 6])
@pytest.mark.parametrize("k", [256, 320, 4096 // 8])
def test_pack_unpack_roundtrip(bits, k):
    rng = np.random.default_rng(bits * 100 + k)
    n = 128
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    packed, scales = intb_pack_jnp(jnp.asarray(w), bits)
    W, kp, k_pad = intb_geometry(k, bits)
    assert packed.shape == (kp, n) and packed.dtype == jnp.int32
    assert scales.shape == (W * kp // INTB_GROUP, n)
    back = np.asarray(intb_unpack_jnp(packed, scales, bits, k))
    assert back.shape == (k, n)
    # quantization noise must be bounded by the grid step: rel err per
    # element <= ~scale/2 ~ amax/(2^(B-1)-1)/2
    rel = np.abs(back - w).max() / np.abs(w).max()
    assert rel < 1.5 / (2 ** (bits - 1) - 1)


def test_bits_inference():
    for bits in (3, 5, 6):
        for k in (256, 448, 640, 4096):  # incl. k where paddings collide
            W, kp, _ = intb_geometry(k, bits)
            assert intb_bits_from_shapes(kp, W * kp // INTB_GROUP) == bits


@pytest.mark.parametrize("bits", [3, 5, 6])
def test_pallas_matches_ref(bits):
    rng = np.random.default_rng(7)
    k, n, m = 512, 256, 16
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    x = rng.standard_normal((m, k)).astype(np.float32)
    packed, scales = intb_pack_jnp(jnp.asarray(w), bits)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    ref = np.asarray(intb_matmul_ref(xb, packed, scales, bits))
    _, kp, k_pad = intb_geometry(k, bits)
    xpad = jnp.pad(xb, ((0, 0), (0, k_pad - k)))
    out = np.asarray(intb_matmul_pallas(
        xpad, packed, scales, bits, block_m=16, block_n=128, block_kp=128,
        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=1e-3)


@pytest.mark.parametrize("bits", [5, 6])
def test_a8_close_to_ref(bits):
    rng = np.random.default_rng(9)
    k, n, m = 512, 256, 8
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    x = rng.standard_normal((m, k)).astype(np.float32)
    packed, scales = intb_pack_jnp(jnp.asarray(w), bits)
    ref = np.asarray(intb_matmul_ref(jnp.asarray(x, dtype=jnp.bfloat16),
                                     packed, scales, bits))
    _, kp, k_pad = intb_geometry(k, bits)
    xf = jnp.asarray(x)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    xq = jnp.pad(xq, ((0, 32 - m), (0, k_pad - k)))
    out = np.asarray(intb_matmul_pallas_a8(
        xq, packed, scales, bits, block_m=32, block_n=128, block_kp=128,
        interpret=True))[:m] * np.asarray(xs)
    # activation quant adds ~1% noise on top of bf16 rounding
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / denom < 0.03


def test_dispatcher_pads_and_infers():
    rng = np.random.default_rng(3)
    k, n = 448, 128   # k not a multiple of W*group for either width
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    x = rng.standard_normal((2, 3, k)).astype(np.float32)
    for bits in (5, 6):
        packed, scales = intb_pack_jnp(jnp.asarray(w), bits)
        y = np.asarray(intb_matmul(jnp.asarray(x), packed, scales))
        ref = x.reshape(-1, k) @ np.asarray(
            intb_unpack_jnp(packed, scales, bits, k))
        assert y.shape == (2, 3, n)
        np.testing.assert_allclose(y.reshape(-1, n), ref, rtol=5e-2,
                                   atol=5e-3)


def test_requant_noise_ordering():
    """More bits must mean monotonically less requant noise."""
    rng = np.random.default_rng(5)
    k, n = 512, 256
    w = rng.standard_normal((k, n)).astype(np.float32)
    errs = {}
    for bits in (3, 5, 6):
        packed, scales = intb_pack_jnp(jnp.asarray(w), bits)
        back = np.asarray(intb_unpack_jnp(packed, scales, bits, k))
        errs[bits] = float(np.sqrt(np.mean((back - w) ** 2)))
    assert errs[3] > errs[5] > errs[6]
    assert errs[6] < 0.025  # int6 ~2% rms on unit-variance weights


@pytest.mark.parametrize("mode", ["int5", "int6"])
def test_linear_mode_end_to_end(tmp_path, mode):
    from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3
    from exllamav3_tpu.model import Config, Model, InferParams

    d = str(tmp_path / "m")
    write_tiny_llama_exl3(d)
    golden = Model.from_config(
        Config.from_directory(d, infer_params=InferParams(linear_mode="bf16")))
    golden.load()
    m = Model.from_config(
        Config.from_directory(d, infer_params=InferParams(linear_mode=mode)))
    m.load()
    # the packed representation must actually be in use
    names = {name for grp in m.params.values() for name in grp}
    assert "weight_qb" in names or "qkv_qb" in names or "gate_up_qb" in names
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 100, size=(1, 12)).astype(np.int32))
    lg = np.asarray(golden.forward_simple(ids), dtype=np.float64)
    lq = np.asarray(m.forward_simple(ids), dtype=np.float64)

    def lsm(z):
        z = z - z.max(-1, keepdims=True)
        return z - np.log(np.exp(z).sum(-1, keepdims=True))

    kld = float(np.mean(np.sum(np.exp(lsm(lg)) * (lsm(lg) - lsm(lq)), -1)))
    assert kld < (0.05 if mode == "int6" else 0.15), kld


def test_intb_a8_shapes():
    """W·A8 across decode (row-sliced fixups) and multi-m-block prefill."""
    import os
    rng = np.random.default_rng(3)
    k, n = 512, 256
    for bits in (3, 5, 6):
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
        packed, sc = intb_pack_jnp(jnp.asarray(w), bits)
        os.environ["EXL3TPU_INTB_A8"] = "1"
        try:
            for m in (1, 300):
                x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
                ref = np.asarray(intb_matmul_ref(x, packed, sc, bits))
                got = np.asarray(intb_matmul(x, packed, sc, bits))
                assert got.shape == ref.shape
                err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
                assert err < 0.03, (bits, m, err)
        finally:
            del os.environ["EXL3TPU_INTB_A8"]
