"""Quantizer tests: Viterbi optimality properties, np-vs-jnp agreement,
LDLQ, and the full quantize->reconstruct loop."""
import numpy as np
import jax.numpy as jnp
import pytest

from exllamav3_tpu.quant import (
    CB_3INST,
    CB_MCG,
    CB_MUL1,
    HessianData,
    quantize_exl3_np,
    viterbi_quantize_tiles_np,
    viterbi_quantize_tiles_jnp,
    reconstruct_full_np,
    reconstruct_inner_np,
    pack_trellis_np,
    decode_np,
)
from exllamav3_tpu.quant.hadamard import hadamard_np


def test_hadamard_orthogonal():
    for n in (1, 2, 4, 8, 16, 128, 256):
        h = hadamard_np(n)
        assert np.array_equal(h @ h.T, n * np.eye(n))


def _check_valid_sequence(codes, K):
    """Each code's high 16-K bits must equal the previous code's low 16-K bits
    (tail-biting: position 0 wraps to 255)."""
    mask = (1 << (16 - K)) - 1
    for t in range(256):
        prev = codes[(t - 1) % 256]
        assert (codes[t] >> K) == (prev & mask), (t, K)


@pytest.mark.parametrize("K", [2, 3, 4])
def test_viterbi_np_produces_valid_sequences(K):
    rng = np.random.default_rng(3)
    tiles = rng.standard_normal((2, 256)).astype(np.float32)
    vals, codes = viterbi_quantize_tiles_np(tiles, K, CB_3INST)
    for i in range(tiles.shape[0]):
        _check_valid_sequence(codes[i].astype(np.int64), K)
    # decoded values must match the codebook decode of the codes
    dec = decode_np(codes.astype(np.uint32), CB_3INST).astype(np.float32)
    assert np.array_equal(dec, vals)
    # error should be much smaller than signal for K=4
    mse = float(np.mean((vals - tiles) ** 2))
    assert mse < 1.0


@pytest.mark.parametrize("cb", [CB_3INST, CB_MCG, CB_MUL1])
def test_viterbi_jnp_matches_np(cb):
    K = 3
    rng = np.random.default_rng(4)
    tiles = (rng.standard_normal((3, 256)) * 1.1).astype(np.float32)
    vn, cn = viterbi_quantize_tiles_np(tiles, K, cb)
    vj, cj = viterbi_quantize_tiles_jnp(jnp.asarray(tiles), K, cb)
    vj, cj = np.asarray(vj), np.asarray(cj)
    # Cost metric must agree even if tie-broken paths differ
    mse_n = np.mean((vn - tiles) ** 2, axis=1)
    mse_j = np.mean((vj - tiles) ** 2, axis=1)
    np.testing.assert_allclose(mse_n, mse_j, rtol=1e-5)
    # And in practice paths should be identical
    assert np.array_equal(cn.astype(np.int64), cj.astype(np.int64))


def test_quantize_reconstruct_roundtrip():
    """Full pipeline: quantize a random matrix at K=4 and verify the packed
    tensors reconstruct to the LDLQ output, and NMSE is sane."""
    rng = np.random.default_rng(5)
    k, n = 128, 128
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05

    hd = HessianData(k=k)
    x = rng.standard_normal((512, k)).astype(np.float32)
    hd.accumulate(x)

    out, proxy_err, wq = quantize_exl3_np(w, hd, K=4, seed=7, return_weight_q=True)
    assert out["trellis"].shape == (k // 16, n // 16, 64)
    assert out["suh"].shape == (k,)
    assert out["svh"].shape == (n,)

    # reconstruct from packed tensors and compare with returned weight_q
    w_rec = reconstruct_full_np(out["trellis"], out["suh"], out["svh"], K=4)
    # suh/svh are stored fp16; reconstruction uses them, weight_q used f32 —
    # allow small tolerance
    np.testing.assert_allclose(w_rec, wq, rtol=0, atol=2e-3)

    nmse = float(np.mean((wq - w) ** 2) / np.mean(w ** 2))
    assert nmse < 0.05, nmse
    assert 0 <= proxy_err < 0.1, proxy_err


def test_quantize_no_hessian_fallback():
    rng = np.random.default_rng(6)
    k, n = 128, 128
    w = rng.standard_normal((k, n)).astype(np.float32)
    out, proxy_err, wq = quantize_exl3_np(w, None, K=4, seed=1, return_weight_q=True)
    nmse = float(np.mean((wq - w) ** 2) / np.mean(w ** 2))
    assert nmse < 0.05, nmse


def test_sharded_viterbi_matches_single():
    """Tile batches shard over all (virtual) devices — results must equal
    the single-device jnp backend exactly (each tile's DP is independent)."""
    import jax
    import jax.numpy as jnp
    from exllamav3_tpu.quant.quantize import (
        quantize_tiles, viterbi_quantize_tiles_jnp)

    assert jax.device_count() >= 8  # conftest forces 8 virtual CPU devices
    rng = np.random.default_rng(9)
    T = 8 * 8 + 8  # forces the sharded path (batch=8*ndev) + a padded tail
    tiles = rng.standard_normal((T, 256)).astype(np.float32)
    vals, codes = quantize_tiles(tiles, K=2, batch=8)
    v_ref, c_ref = viterbi_quantize_tiles_jnp(jnp.asarray(tiles), 2)
    np.testing.assert_array_equal(codes, np.asarray(c_ref).astype(np.uint16))
    np.testing.assert_allclose(vals, np.asarray(v_ref), rtol=1e-6, atol=1e-6)
