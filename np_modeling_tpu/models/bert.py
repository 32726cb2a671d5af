"""BERT-style bidirectional encoder (BASELINE.json config #4 shape)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from np_modeling_tpu.nn import Dropout, Embedding, LayerNorm, Linear
from np_modeling_tpu.nn.module import Module, split_rngs
from np_modeling_tpu.nn.transformer import TransformerEncoderBlock


@dataclasses.dataclass
class BertConfig:
    vocab_size: int = 30522
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 4
    hidden_units: int = 2048
    max_len: int = 512
    drop_rate: float = 0.0
    norm_first: bool = False    # classic BERT is post-norm
    num_classes: int = 2


@dataclasses.dataclass
class BertEncoder(Module):
    """Token+position embeddings -> encoder stack -> [CLS] pooler -> classifier."""

    config: BertConfig

    def __post_init__(self):
        c = self.config
        self.embed = Embedding(c.vocab_size, c.d_model)
        self.pos_embed = Embedding(c.max_len, c.d_model)
        self.embed_norm = LayerNorm()
        self.block = TransformerEncoderBlock(
            c.num_heads, c.hidden_units, c.norm_first, c.drop_rate)
        self.pooler = Linear(c.d_model)
        self.classifier = Linear(c.num_classes)
        self.drop = Dropout(c.drop_rate)

    def init(self, key, tokens):
        c = self.config
        ks = jax.random.split(key, c.num_layers + 5)
        x = jnp.zeros((*tokens.shape, c.d_model), jnp.float32)
        params = {
            "embedding": self.embed.init(ks[0]),
            "pos_embedding": self.pos_embed.init(ks[1]),
            "embed_norm": self.embed_norm.init(ks[2], x),
        }
        for i in range(c.num_layers):
            params[f"layer_{i}"] = self.block.init(ks[3 + i], x)
        pooled = jnp.zeros((tokens.shape[0], c.d_model), jnp.float32)
        params["pooler"] = self.pooler.init(ks[-2], pooled)
        params["classifier"] = self.classifier.init(ks[-1], pooled)
        return params

    def encode(self, params, tokens, mask=None, training=False, rngs=None,
               attention_mask=None):
        """``attention_mask``: [b, s] (1 = real token, 0 = padding) — the
        standard padded-batch surface. Routed through the flash kernels'
        segment-id machinery (O(s) operands, not an O(s^2) boolean mask):
        padding tokens form their own segment so real tokens never attend
        to them. ``mask`` remains for arbitrary [b|1, h|1, s, s] masks."""
        c = self.config
        segment_ids = None
        if attention_mask is not None:
            assert attention_mask.shape == tokens.shape
            segment_ids = attention_mask.astype(jnp.int32)
        positions = jnp.arange(tokens.shape[-1])
        x = (self.embed.apply(params["embedding"], tokens)
             + self.pos_embed.apply(params["pos_embedding"], positions))
        x = self.embed_norm.apply(params["embed_norm"], x)
        x = self.drop.apply({}, x, training, rngs, salt=1000)
        for i in range(c.num_layers):
            x = self.block.apply(params[f"layer_{i}"], x, mask=mask,
                                 segment_ids=segment_ids,
                                 training=training, rngs=split_rngs(rngs, i))
        return x

    def apply(self, params, tokens, mask=None, training=False, rngs=None,
              attention_mask=None):
        x = self.encode(params, tokens, mask, training, rngs,
                        attention_mask=attention_mask)
        pooled = jnp.tanh(self.pooler.apply(params["pooler"], x[:, 0]))
        return self.classifier.apply(params["classifier"], pooled)
