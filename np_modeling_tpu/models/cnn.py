"""CNN classifier (reference train_test.py:48-81 workload shape)."""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax

from np_modeling_tpu.nn import Conv2D, Dense, Linear
from np_modeling_tpu.nn.module import Module, split_rngs
from np_modeling_tpu.ops import softmax


@dataclasses.dataclass
class CNNClassifier(Module):
    """Conv2D stack -> flatten -> Dense -> Linear -> softmax probabilities.

    Mirrors the reference's 5-layer CNN smoke workload (conv+ReLU stack with
    CrossEntropy on softmax probs; train_test.py:48-81, BASELINE.json config 2).
    """

    conv_channels: Sequence[int] = (8, 16)
    kernel_size: int = 3
    hidden: int = 64
    num_classes: int = 10
    output_probs: bool = True   # reference CE loss consumes probabilities

    def __post_init__(self):
        self.convs = [Conv2D(c, self.kernel_size) for c in self.conv_channels]
        self.dense = Dense(self.hidden)
        self.head = Linear(self.num_classes)

    def init(self, key, x):
        params = {}
        for i, conv in enumerate(self.convs):
            params[f"conv_{i}"] = conv.init(jax.random.fold_in(key, i), x)
            x = conv.apply(params[f"conv_{i}"], x)
        x = x.reshape(x.shape[0], -1)
        params["dense"] = self.dense.init(jax.random.fold_in(key, 100), x)
        x = self.dense.apply(params["dense"], x)
        params["head"] = self.head.init(jax.random.fold_in(key, 101), x)
        return params

    def apply(self, params, x, training=False, rngs=None):
        for i, conv in enumerate(self.convs):
            x = conv.apply(params[f"conv_{i}"], x, training=training,
                           rngs=split_rngs(rngs, i))
        x = x.reshape(x.shape[0], -1)
        x = self.dense.apply(params["dense"], x)
        logits = self.head.apply(params["head"], x)
        return softmax(logits) if self.output_probs else logits
