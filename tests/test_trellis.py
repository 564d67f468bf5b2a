"""Trellis pack/unpack round-trips and the tile permutation."""
import numpy as np
import jax.numpy as jnp

from exllamav3_tpu.quant.trellis import (
    tile_perm,
    tile_perm_inverse,
    pack_trellis_np,
    unpack_trellis_np,
    unpack_trellis_jnp,
)


def _reference_perm():
    """Reference derivation (quantize.py:22-44 behavior), written independently."""
    perm_a = [0] * 256
    for t in range(32):
        r0 = (t % 4) * 2
        r1, r2, r3 = r0 + 1, r0 + 8, r0 + 9
        c0 = t // 4
        c1 = c0 + 8
        vals = [r0 * 16 + c0, r1 * 16 + c0, r2 * 16 + c0, r3 * 16 + c0,
                r0 * 16 + c1, r1 * 16 + c1, r2 * 16 + c1, r3 * 16 + c1]
        for i, v in enumerate(vals):
            perm_a[t * 8 + i] = v
    return np.array(perm_a)


def test_tile_perm_matches_reference():
    assert np.array_equal(tile_perm(), _reference_perm())
    p = tile_perm()
    pi = tile_perm_inverse()
    assert np.array_equal(p[pi], np.arange(256))


def _random_valid_codes(rng, shape, K):
    """Generate valid tail-biting sequences: draw a random 256K-bit stream and
    derive the 16-bit windows."""
    nbits = 256 * K
    bits = rng.integers(0, 2, size=shape + (nbits,)).astype(np.uint64)
    codes = np.zeros(shape + (256,), dtype=np.uint16)
    for t in range(256):
        code = np.zeros(shape, dtype=np.uint64)
        for b in range(16):
            bit_idx = ((t + 1) * K - 16 + b) % nbits
            code = (code << np.uint64(1)) | bits[..., bit_idx]
        codes[..., t] = code.astype(np.uint16)
    return codes


def test_pack_unpack_roundtrip_np():
    rng = np.random.default_rng(1)
    for K in range(1, 9):
        codes = _random_valid_codes(rng, (2, 3), K)
        packed = pack_trellis_np(codes, K)
        assert packed.shape == (2, 3, 16 * K)
        assert packed.dtype == np.int16
        codes2 = unpack_trellis_np(packed, K)
        assert np.array_equal(codes, codes2), K


def test_unpack_jnp_matches_np():
    rng = np.random.default_rng(2)
    for K in (1, 2, 3, 4, 5, 6, 7, 8):
        codes = _random_valid_codes(rng, (4,), K)
        packed = pack_trellis_np(codes, K)
        got = np.asarray(unpack_trellis_jnp(jnp.asarray(packed), K))
        assert np.array_equal(got, codes.astype(np.int32)), K
