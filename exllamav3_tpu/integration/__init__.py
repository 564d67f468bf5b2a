from .transformers import (
    Exl3HfQuantizer,
    Exl3HfQuantizationConfig,
    load_exl3_state_dict,
    load_exl3_transformers,
    patch_transformers,
)
