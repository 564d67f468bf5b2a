from .module import Module, ForwardCtx
from .linear import Linear
from .embedding import Embedding
from .norms import RMSNorm, LayerNorm
from .mlp import GatedMLP, MLP
from .attn import Attention
from .mla_attn import MLAttention
from .transformer import TransformerBlock
