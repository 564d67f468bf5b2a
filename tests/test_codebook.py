"""Codebook decode: numpy golden vs a direct bit-level reimplementation, and
jnp vs numpy equality over the full 16-bit code space."""
import pytest

pytestmark = pytest.mark.fast
import numpy as np
import jax.numpy as jnp

from exllamav3_tpu.quant.codebook import (
    decode_np,
    decode_jnp,
    decode_table_np,
    CB_3INST,
    CB_MCG,
    CB_MUL1,
)


def _decode_scalar_python(code: int, cb: int) -> np.float16:
    """Independent scalar reimplementation straight from the format spec."""
    M = 1 << 32
    if cb == CB_3INST:
        x = (code * 89226354 + 64248484) % M
    elif cb == CB_MCG:
        x = (code * 0xCBAC1FED) % M
    else:
        x = (code * 0x83DCD12D) % M
        s = (x & 0xFF) + ((x >> 8) & 0xFF) + ((x >> 16) & 0xFF) + ((x >> 24) & 0xFF)
        h = np.uint16(0x6400 + s).view(np.float16)
        k = np.uint16(0x1EEE).view(np.float16)
        b = np.uint16(0xC931).view(np.float16)
        return np.float16(float(h) * float(k) + float(b))
    m = (x & 0x8FFF8FFF) ^ 0x3B603B60
    lo = np.uint16(m & 0xFFFF).view(np.float16)
    hi = np.uint16(m >> 16).view(np.float16)
    return lo + hi


def test_scalar_vs_vector():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 65536, size=512).astype(np.uint32)
    for cb in (CB_3INST, CB_MCG, CB_MUL1):
        vec = decode_np(codes, cb)
        for c, v in zip(codes, vec):
            s = _decode_scalar_python(int(c), cb)
            assert s == v or (np.isnan(s) and np.isnan(v)), (cb, c, s, v)


def test_jnp_matches_np_full_space():
    codes = np.arange(65536, dtype=np.uint32)
    for cb in (CB_3INST, CB_MCG, CB_MUL1):
        ref = decode_np(codes, cb).astype(np.float32)
        got = np.asarray(decode_jnp(jnp.asarray(codes), cb, dtype=jnp.float32))
        both_nan = np.isnan(ref) & np.isnan(got)
        assert np.array_equal(ref[~both_nan], got[~both_nan]), cb


def test_table_statistics():
    # the 3INST codebook should look roughly standard-normal-ish * scale
    t = decode_table_np(CB_3INST)
    finite = t[np.isfinite(t)]
    assert finite.size > 65000
    assert abs(float(np.mean(finite))) < 0.2
    assert 0.8 < float(np.std(finite)) < 2.0
