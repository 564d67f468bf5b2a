from .codebook import (
    CB_3INST,
    CB_MCG,
    CB_MUL1,
    CODEBOOK_SCALE,
    decode_np,
    decode_jnp,
    decode_table_np,
)
from .trellis import (
    tile_perm,
    tile_perm_inverse,
    pack_trellis_np,
    unpack_trellis_np,
    unpack_trellis_jnp,
)
from .hadamard import hadamard_np, had_right_jnp, HAD_K, HAD_N
from .reconstruct import (
    codebook_id,
    reconstruct_inner_np,
    reconstruct_full_np,
    reconstruct_inner_jnp,
    reconstruct_full_jnp,
    exl3_matmul_ref_jnp,
)
from .quantize import (
    HessianData,
    quantize_exl3_np,
    viterbi_quantize_tiles_np,
    viterbi_quantize_tiles_jnp,
    quantize_tiles,
    ldlq_np,
    block_ldl_np,
    regularize_np,
    finalize_hessian,
)
