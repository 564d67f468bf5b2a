"""EXL3 procedural codebooks, TPU-native implementation.

The EXL3 format maps a 16-bit trellis code to an fp16 weight value through one of
three procedural codebooks (no stored tables):

  * cb=0 ("3INST", default): x = code * 89226354 + 64248484 (mod 2^32);
        y = fp16(lo16(m)) + fp16(hi16(m)) where m = (x & 0x8FFF8FFF) ^ 0x3B603B60
  * cb=1 ("MCG"):   same bit trick with x = code * 0xCBAC1FED (no additive term)
  * cb=2 ("MUL1"):  x = code * 0x83DCD12D; s = sum of the 4 bytes of x;
        y = fp16_fma(fp16(0x6400 + s), 0.0067672729..., -10.3828125)
        (0x6400+s is the fp16 bit pattern of 1024.0 + s for s in [0, 1020])

Behavioral reference: /root/reference/exllamav3/exllamav3_ext/quant/codebook.cuh:56-123
(the `lop3.b32 ... 0x6a` instruction there computes (a & b) ^ c) and
/root/reference/exllamav3/modules/quant/exl3_lib/quantize.py:16-19 (constants).

Numerics: the canonical decoded value is an IEEE fp16 number. The reference
computes it with fp16 hardware ops; we compute in f32/f64 and round once to
fp16, which is exact:
  - fp16 add computed in f32 then rounded to fp16 is correctly rounded
    (f32 has 24 >= 2*11+2 significand bits, so double rounding is innocuous);
  - the MUL1 fma operands make h*k exact in f32 (11+11 <= 24 bits) and the
    final sum fits f32 exactly enough that one rounding to fp16 matches __hfma.

Both a numpy golden implementation (used by tests and the quantizer's table
builder) and a jnp implementation (traceable, runs on TPU) are provided.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Codebook ids
CB_3INST = 0
CB_MCG = 1
CB_MUL1 = 2

MULT_3INST = np.uint32(89226354)
ADD_3INST = np.uint32(64248484)
MULT_MCG = np.uint32(0xCBAC1FED)
MULT_MUL1 = np.uint32(0x83DCD12D)

MASK_AND = np.uint32(0x8FFF8FFF)
MASK_XOR = np.uint32(0x3B603B60)

# fp16 constants of the MUL1 affine map (bit patterns 0x1EEE and 0xC931).
MUL1_SCALE = np.uint16(0x1EEE)  # ~= 0.0067672729 = 1/147.7
MUL1_BIAS = np.uint16(0xC931)  # ~= -10.3828125

# Scale the quantizer normalizes weights by before trellis search
# (/root/reference/exllamav3/modules/quant/exl3_lib/quantize.py:16)
CODEBOOK_SCALE = 1.24371088


def _np_f16(bits: np.ndarray) -> np.ndarray:
    return bits.astype(np.uint16).view(np.float16)


def decode_np(codes: np.ndarray, cb: int = CB_3INST) -> np.ndarray:
    """Decode uint16/uint32 trellis codes to fp16 values (numpy golden path)."""
    x = codes.astype(np.uint32)
    if cb == CB_3INST:
        x = x * MULT_3INST + ADD_3INST
    elif cb == CB_MCG:
        x = x * MULT_MCG
    elif cb == CB_MUL1:
        x = x * MULT_MUL1
        s = (
            (x & 0xFF)
            + ((x >> 8) & 0xFF)
            + ((x >> 16) & 0xFF)
            + ((x >> 24) & 0xFF)
            + np.uint32(0x6400)
        )
        h = _np_f16(s).astype(np.float64)
        k = float(_np_f16(np.array(MUL1_SCALE)))
        b = float(_np_f16(np.array(MUL1_BIAS)))
        # Exact fma in f64, single rounding to fp16 (matches __hfma)
        return (h * k + b).astype(np.float16)
    else:
        raise ValueError(f"unknown codebook {cb}")
    m = (x & MASK_AND) ^ MASK_XOR
    lo = _np_f16(m & 0xFFFF)
    hi = _np_f16(m >> np.uint32(16))
    return lo + hi  # correctly-rounded fp16 add in numpy


def decode_table_np(cb: int = CB_3INST) -> np.ndarray:
    """All 65536 decoded values as float32 (for quantizer DP / tests)."""
    return decode_np(np.arange(65536, dtype=np.uint32), cb).astype(np.float32)


def decode_jnp(codes: jnp.ndarray, cb: int = CB_3INST, dtype=jnp.float32) -> jnp.ndarray:
    """Decode trellis codes inside a jax trace. `codes` any uint/int type.

    Returns the canonical fp16 value cast to `dtype`. All integer math runs as
    uint32 on the VPU; the fp16 rounding happens via astype(float16).
    """
    x = codes.astype(jnp.uint32)
    if cb == CB_3INST:
        x = x * jnp.uint32(MULT_3INST) + jnp.uint32(ADD_3INST)
    elif cb == CB_MCG:
        x = x * jnp.uint32(MULT_MCG)
    elif cb == CB_MUL1:
        x = x * jnp.uint32(MULT_MUL1)
        s = (
            (x & 0xFF)
            + ((x >> 8) & 0xFF)
            + ((x >> 16) & 0xFF)
            + ((x >> 24) & 0xFF)
            + jnp.uint32(0x6400)
        )
        h = jax_bits_to_f16(s.astype(jnp.uint16)).astype(jnp.float32)
        k = np.float32(_np_f16(np.array(MUL1_SCALE)))
        b = np.float32(_np_f16(np.array(MUL1_BIAS)))
        # h*k exact in f32; one more f32 round + fp16 round is innocuous
        return (h * k + b).astype(jnp.float16).astype(dtype)
    else:
        raise ValueError(f"unknown codebook {cb}")
    m = (x & jnp.uint32(MASK_AND)) ^ jnp.uint32(MASK_XOR)
    lo = jax_bits_to_f16((m & 0xFFFF).astype(jnp.uint16)).astype(jnp.float32)
    hi = jax_bits_to_f16((m >> 16).astype(jnp.uint16)).astype(jnp.float32)
    return (lo + hi).astype(jnp.float16).astype(dtype)


def jax_bits_to_f16(bits_u16: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.bitcast_convert_type(bits_u16, jnp.float16)
