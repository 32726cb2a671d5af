"""Conv2D module (reference layers/conv.py:11-71 capabilities)."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax

from np_modeling_tpu import ops
from np_modeling_tpu.nn import initializers
from np_modeling_tpu.nn.module import Module


@dataclasses.dataclass
class Conv2D(Module):
    """NHWC conv, HWIO filters, fused activation.

    Defaults (SAME padding, stride 1, ReLU) match the reference
    (conv.py:17-32); strides and VALID padding are a generalization the
    reference asserts away (conv.py:27-29). Params:
    ``{'w': [K,K,Cin,Cout], 'b': [Cout]}``.
    """

    channels: int
    kernel_size: int
    strides: tuple = (1, 1)
    padding: str = "SAME"
    activation: Any = "relu"
    kernel_init: Callable = initializers.lecun_normal
    bias_init: Callable = initializers.zeros

    def __post_init__(self):
        self._act = ops.get_activation(self.activation)

    def init(self, key, x):
        kw, kb = jax.random.split(key)
        k, cin = self.kernel_size, x.shape[-1]
        return {"w": self.kernel_init(kw, (k, k, cin, self.channels)),
                "b": self.bias_init(kb, (self.channels,))}

    def apply(self, params, x, training=False, rngs=None):
        del training, rngs
        return self._act(ops.conv2d(x, params["w"], params["b"],
                                    self.strides, self.padding))
