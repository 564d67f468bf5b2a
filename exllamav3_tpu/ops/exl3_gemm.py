"""Fused trellis-decode matmul (Pallas). Placeholder delegating to the
reconstruct reference until the Pallas kernel lands (ops/exl3_gemm_pallas)."""
from ..quant.reconstruct import exl3_matmul_ref_jnp


def exl3_matmul(x, trellis, suh, svh, K, cb, bias=None, out_dtype=None):
    return exl3_matmul_ref_jnp(x, trellis, suh, svh, K, cb, bias=bias, out_dtype=out_dtype)
