"""Small shared op helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def einsum_f32(subscripts: str, *operands):
    """einsum with f32 accumulation. On TPU the operands stay bf16 feeding
    the MXU with preferred_element_type=f32; on CPU the operands are upcast
    first (XLA:CPU's DotThunk lacks some bf16 x bf16 = f32 kernels)."""
    if jax.default_backend() == "cpu":
        operands = [o.astype(jnp.float32) for o in operands]
        return jnp.einsum(subscripts, *operands)
    return jnp.einsum(subscripts, *operands,
                      preferred_element_type=jnp.float32)
