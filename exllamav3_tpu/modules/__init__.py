from .module import Module, ForwardCtx
from .linear import Linear
from .embedding import Embedding
from .norms import RMSNorm, LayerNorm, GatedRMSNorm
from .mlp import GatedMLP, MLP
from .attn import Attention
from .mla_attn import MLAttention
from .gated_delta_net import GatedDeltaNet
from .mamba2 import Mamba2
from .short_conv import ShortConv
from .block_sparse_mlp import BlockSparseMLP
from .value_embeddings import ValueEmbeddings
from .hyperconnections import ExpandStreams, HyperConnection, HyperHead
from .transformer import TransformerBlock
