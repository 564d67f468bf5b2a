"""Generate the vendored EXL3 reference-format parity fixture.

The reference's pack/unpack/sign kernels are CUDA-only
(/root/reference/exllamav3/exllamav3_ext/quant/pack.cu), so with no CUDA
device the strongest available checkpoint-compatibility proof is an
INDEPENDENT scalar transliteration of the wire format — straight-line Python
loops written from the kernel semantics, with none of the repo's vectorized
production code on the generation path — whose outputs are checked in as
data (tests/fixtures/reference_format.npz). tests/test_reference_format_
parity.py then asserts the production numpy/jnp implementations are
bit-exact against the fixture, so format drift cannot pass CI silently.

Scalar spec sources (semantics, not code):
  * pack_trellis / unpack_trellis: pack.cu:9-175 — per tile, 16 spans of 16
    weights; K new bits per weight, MSB-first through a 32-bit staging
    buffer into 16-bit halfwords; adjacent halfword PAIRS swapped so a
    little-endian uint32 read yields stream order (SWAP16 on the u32 view).
  * code windows: exl3_dq.cuh:15-50 — weight t's 16-bit code is the circular
    (tail-biting) stream window ending at bit (t+1)*K mod 256K.
  * pack_signs: pack.cu:177-201 — fp16 sign bit of element i lands at BIT i
    of the int16 word (bit set = negative).
  * codebook decode: codebook.cuh:57-84 + quantize.py:15-19 — 3INST
    (mult 89226354, add 64248484, mask 0x8FFF8FFF ^ 0x3B603B60, sum of fp16
    halves), MCG 0xCBAC1FED (same fp16 trick), MUL1 0x83DCD12D (byte-sum,
    affine fp16 map 0x1EEE * (0x6400 + s) + 0xC931).
  * tile order: quantize.py:22-44 tensor-core permutation.
  * reconstruct: W = diag(suh) . H128blk . W_inner . H128blk . diag(svh),
    Hadamards scaled 1/sqrt(128) (reconstruct.cu + quantize.py:15).

Run from the repo root:  python tools/make_reference_fixture.py
"""
from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "reference_format.npz")


# -- scalar wire-format spec --------------------------------------------------


def spec_pack_trellis(codes: np.ndarray, K: int) -> np.ndarray:
    """(tiles, 256) uint16 sequence-order codes -> (tiles, 16K) int16 file
    halfwords. Scalar transliteration of pack.cu:9-57."""
    n_tiles = codes.shape[0]
    out = np.zeros((n_tiles, 16 * K), dtype=np.uint16)
    for ti in range(n_tiles):
        s_packed = np.zeros(16 * K, dtype=np.uint16)
        for t in range(16):  # 16 spans of 16 weights
            i = 16 * t
            j = K * t
            k = 32
            buf = 0
            for _ in range(16):
                v = int(codes[ti, i]) & ((1 << K) - 1)
                k -= K
                buf |= v << k
                if k <= 16:
                    s_packed[j] = (buf >> 16) & 0xFFFF
                    buf = (buf << 16) & 0xFFFFFFFF
                    k += 16
                    j += 1
                i += 1
        # SWAP16 on the uint32 view: adjacent halfword pairs swap
        for j in range(0, 16 * K, 2):
            out[ti, j] = s_packed[j + 1]
            out[ti, j + 1] = s_packed[j]
    return out.view(np.int16)


def spec_unpack_trellis(packed: np.ndarray, K: int) -> np.ndarray:
    """(tiles, 16K) int16 -> (tiles, 256) uint16 full 16-bit code windows.
    Builds the circular bit stream and slices per exl3_dq.cuh:15-50."""
    n_tiles = packed.shape[0]
    u16 = packed.view(np.uint16)
    out = np.zeros((n_tiles, 256), dtype=np.uint16)
    nbits = 256 * K
    for ti in range(n_tiles):
        # undo SWAP16, then concatenate halfwords MSB-first
        bits = []
        for j in range(0, 16 * K, 2):
            for w in (u16[ti, j + 1], u16[ti, j]):
                bits.append(format(int(w), "016b"))
        stream = "".join(bits)
        assert len(stream) == nbits
        for t in range(256):
            end = ((t + 1) * K) % nbits
            start = (end - 16) % nbits
            if start < end:
                win = stream[start:end]
            else:
                win = stream[start:] + stream[:end]
            out[ti, t] = int(win, 2)
    return out


def spec_pack_signs(signs: np.ndarray) -> np.ndarray:
    """(16*n,) fp16 signs -> (n,) int16; element i's sign bit -> bit i
    (pack.cu:177-201)."""
    s = signs.astype(np.float16)
    n = s.shape[0] // 16
    out = np.zeros(n, dtype=np.uint16)
    for c in range(n):
        word = 0
        for i in range(16):
            neg = int(s[16 * c + i].view(np.uint16)) & 0x8000
            word >>= 1
            word |= neg
        out[c] = word
    return out.view(np.int16)


def spec_decode(code: int, cb: str) -> np.float16:
    """Scalar codebook decode (codebook.cuh:57-84)."""
    M = 1 << 32
    if cb == "3inst":
        x = (code * 89226354 + 64248484) % M
    elif cb == "mcg":
        x = (code * 0xCBAC1FED) % M
    elif cb == "mul1":
        x = (code * 0x83DCD12D) % M
        s = (x & 0xFF) + ((x >> 8) & 0xFF) + ((x >> 16) & 0xFF) + ((x >> 24) & 0xFF)
        h = np.uint16(0x6400 + s).view(np.float16)
        kk = np.uint16(0x1EEE).view(np.float16)
        b = np.uint16(0xC931).view(np.float16)
        # __hfma: fused multiply-add, single rounding — compute exactly in
        # f64 (11-bit significands: h*kk is exact, the sum fits) and round once
        return np.float16(float(h) * float(kk) + float(b))
    else:
        raise ValueError(cb)
    m = (x & 0x8FFF8FFF) ^ 0x3B603B60
    lo = np.uint16(m & 0xFFFF).view(np.float16)
    hi = np.uint16(m >> 16).view(np.float16)
    return np.float16(lo + hi)


def spec_tile_perm() -> np.ndarray:
    """Sequence position -> row-major element (quantize.py:22-44)."""
    perm = np.zeros(256, dtype=np.int32)
    for t in range(32):
        r0 = (t % 4) * 2
        c0 = t // 4
        rows = (r0, r0 + 1, r0 + 8, r0 + 9)
        for ci, c in enumerate((c0, c0 + 8)):
            for ri, r in enumerate(rows):
                perm[t * 8 + ci * 4 + ri] = r * 16 + c
    return perm


def spec_sylvester(n: int) -> np.ndarray:
    h = np.ones((1, 1))
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def spec_reconstruct(trellis: np.ndarray, suh: np.ndarray, svh: np.ndarray,
                     K: int, cb: str) -> np.ndarray:
    """Full-precision (k, n) weight, f64 accumulation (the test compares the
    production f32 path against this within float tolerance; W_inner is
    compared bit-exactly separately)."""
    tk, tn, _ = trellis.shape
    perm = spec_tile_perm()
    w_inner = np.zeros((tk * 16, tn * 16), dtype=np.float64)
    for a in range(tk):
        for b in range(tn):
            codes = spec_unpack_trellis(trellis[a, b][None], K)[0]
            for t in range(256):
                rm = perm[t]
                r, c = rm // 16, rm % 16
                w_inner[a * 16 + r, b * 16 + c] = float(
                    spec_decode(int(codes[t]), cb))
    h = spec_sylvester(128) / np.sqrt(128.0)
    k, n = w_inner.shape
    w = (h @ w_inner.reshape(k // 128, 128, n)).reshape(k, n)
    w = w * suh.astype(np.float64)[:, None]
    w = (w.reshape(k, n // 128, 128) @ h).reshape(k, n)
    w = w * svh.astype(np.float64)[None, :]
    return w, w_inner


def random_stream_codes(rng, n_tiles: int, K: int) -> np.ndarray:
    """Valid tail-biting code sequences: derive the 256 windows from a random
    circular 256K-bit stream (overlapping window bits are then consistent)."""
    out = np.zeros((n_tiles, 256), dtype=np.uint16)
    nbits = 256 * K
    for ti in range(n_tiles):
        stream = "".join(rng.choice(("0", "1")) for _ in range(nbits))
        for t in range(256):
            end = ((t + 1) * K) % nbits
            start = (end - 16) % nbits
            win = (stream[start:end] if start < end
                   else stream[start:] + stream[:end])
            out[ti, t] = int(win, 2)
    return out


def main():
    import random

    rng = random.Random(1234)
    np_rng = np.random.default_rng(1234)
    data = {}

    # 1. pack/unpack round trips, every K
    for K in range(1, 9):
        codes = random_stream_codes(rng, 4, K)
        packed = spec_pack_trellis(codes, K)
        data[f"codes_K{K}"] = codes
        data[f"packed_K{K}"] = packed
        back = spec_unpack_trellis(packed, K)
        assert np.array_equal(back, codes), f"spec self-check failed K={K}"

    # 2. sign packing
    signs = np.where(np_rng.standard_normal(256) < 0, -1.0, 1.0).astype(np.float16)
    data["signs_f16"] = signs
    data["signs_packed"] = spec_pack_signs(signs)

    # 3. full codebook decode tables (the exact fp16 value of every code)
    codes_all = np.arange(65536)
    for cb in ("3inst", "mcg", "mul1"):
        data[f"codebook_{cb}"] = np.array(
            [spec_decode(int(c), cb) for c in codes_all], dtype=np.float16)

    # 4. tile permutation
    data["tile_perm"] = spec_tile_perm()

    # 5. end-to-end reconstruct, K=4, each codebook, 256x256
    for cb in ("3inst", "mcg", "mul1"):
        codes = random_stream_codes(rng, 256, 4).reshape(16, 16, 256)
        trellis = spec_pack_trellis(codes.reshape(256, 256), 4).reshape(16, 16, 64)
        suh = np.where(np_rng.standard_normal(256) < 0, -1.0, 1.0).astype(np.float16)
        svh = np.where(np_rng.standard_normal(256) < 0, -1.0, 1.0).astype(np.float16)
        w, w_inner = spec_reconstruct(trellis, suh, svh, 4, cb)
        data[f"rc_trellis_{cb}"] = trellis
        data[f"rc_suh_{cb}"] = suh
        data[f"rc_svh_{cb}"] = svh
        data[f"rc_w_inner_{cb}"] = w_inner.astype(np.float32)
        data[f"rc_w_{cb}"] = w.astype(np.float32)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, {len(data)} arrays)")


if __name__ == "__main__":
    main()
