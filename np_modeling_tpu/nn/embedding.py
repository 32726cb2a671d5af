"""Token / positional embedding modules."""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from np_modeling_tpu.nn import initializers
from np_modeling_tpu.nn.module import Module
from np_modeling_tpu.ops.embedding import embedding_lookup


@dataclasses.dataclass
class Embedding(Module):
    vocab_size: int
    features: int
    embedding_init: Callable = initializers.normal

    def init(self, key, ids=None):
        return {"table": self.embedding_init(
            key, (self.vocab_size, self.features))}

    def apply(self, params, ids, training=False, rngs=None):
        del training, rngs
        return embedding_lookup(params["table"], ids)

    def attend(self, params, x):
        """Tied-weights logits: x @ tableᵀ (for LM heads)."""
        return jnp.einsum("...d,vd->...v", x, params["table"],
                          preferred_element_type=jnp.float32).astype(x.dtype)
