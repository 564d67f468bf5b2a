"""On-device LDLQ scan (one dispatch per column chunk) vs the host block
loop (VERDICT r3 item 2). Reference semantics: ldlq, quantize.py:488."""
import numpy as np

from exllamav3_tpu.quant.quantize import (
    HessianData,
    block_ldl_np,
    ldlq_device_np,
    ldlq_np,
)


def _host_ldlq(weight, L, K):
    # force the host path via backend="np"
    return ldlq_np(weight, L, K, backend="np")


def test_no_feedback_bit_identical():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    wq_d, codes_d = ldlq_device_np(w, None, K=3)
    wq_h, codes_h = _host_ldlq(w, None, K=3)
    np.testing.assert_array_equal(codes_d, codes_h)
    np.testing.assert_allclose(wq_d, wq_h, rtol=1e-6, atol=1e-6)


def test_with_feedback_quality_parity():
    """With L, the device comp matmul need not be bit-identical to numpy's,
    so codes may differ on near-ties — but the Hessian-weighted error must
    match the host loop's within noise."""
    rng = np.random.default_rng(1)
    k, n = 128, 64
    x = rng.standard_normal((512, k)).astype(np.float32)
    H = (x.T @ x / 512).astype(np.float64)
    H[np.diag_indices(k)] += 0.025 * np.trace(H) / k
    L = block_ldl_np(H, 16)
    L[np.diag_indices(k)] = 0.0
    w = rng.standard_normal((k, n)).astype(np.float32)

    wq_d, codes_d = ldlq_device_np(w, L, K=2)
    wq_h, codes_h = _host_ldlq(w, L, K=2)
    assert codes_d.shape == codes_h.shape == (k // 16, n // 16, 256)

    def proxy(wq):
        E = (w - wq).astype(np.float64)
        return float(np.einsum("ik,ij,jk->", E, H, E))

    pd, ph = proxy(wq_d), proxy(wq_h)
    assert pd <= ph * 1.05 + 1e-12, (pd, ph)


def test_column_chunking_consistent():
    """Chunked dispatch must equal a single-chunk dispatch (columns are
    independent under LDLQ)."""
    rng = np.random.default_rng(2)
    k, n = 64, 96
    w = rng.standard_normal((k, n)).astype(np.float32)
    H = np.eye(k) + 0.05
    L = block_ldl_np(H, 16)
    L[np.diag_indices(k)] = 0.0

    full_q, full_c = ldlq_device_np(w, L, K=8)  # K=8 -> huge t_max, 1 chunk
    parts_q = np.concatenate(
        [ldlq_device_np(w[:, i : i + 32], L, K=8)[0] for i in range(0, n, 32)],
        axis=1,
    )
    np.testing.assert_allclose(full_q, parts_q, rtol=1e-6, atol=1e-6)


def test_quantize_exl3_roundtrip_auto_backend():
    """quantize_exl3_np with backend auto (device LDLQ) still reconstructs
    within the trellis noise floor."""
    from exllamav3_tpu.quant.quantize import quantize_exl3_np

    rng = np.random.default_rng(3)
    w = rng.standard_normal((128, 128)).astype(np.float32)
    hd = HessianData(k=128)
    hd.accumulate(rng.standard_normal((256, 128)).astype(np.float32))
    out, proxy_err, wq = quantize_exl3_np(w, hd, K=4, seed=0, return_weight_q=True)
    assert out["trellis"].shape == (8, 8, 64)
    nmse = float(np.mean((wq - w) ** 2) / np.mean(w**2))
    assert nmse < 0.05, nmse
    assert proxy_err < 0.05, proxy_err
