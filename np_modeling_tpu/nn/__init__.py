"""Neural-net modules: functional init/apply over explicit param pytrees."""

from np_modeling_tpu.nn.attention import MultiHeadAttention
from np_modeling_tpu.nn.conv import Conv2D
from np_modeling_tpu.nn.embedding import Embedding
from np_modeling_tpu.nn.linear import (Activation, Dense, Dropout,
                                       LayerNorm, Linear, ReLU, RMSNorm,
                                       Softmax)
from np_modeling_tpu.nn.module import Module, Sequential, rng_for, split_rngs
from np_modeling_tpu.nn.moe import MOE_RULES, MoE
from np_modeling_tpu.nn import initializers
from np_modeling_tpu.nn.transformer import (TransformerDecoder,
                                            TransformerDecoderBlock,
                                            TransformerEncoder,
                                            TransformerEncoderBlock)

__all__ = [
    "Activation", "Conv2D", "Dense", "Dropout", "Embedding",
    "LayerNorm", "Linear", "ReLU", "Softmax",
    "MOE_RULES", "MoE", "Module", "MultiHeadAttention", "RMSNorm",
    "Sequential",
    "TransformerDecoder", "TransformerDecoderBlock", "TransformerEncoder",
    "TransformerEncoderBlock",
    "initializers", "rng_for", "split_rngs",
]
