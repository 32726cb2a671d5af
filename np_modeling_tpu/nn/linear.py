"""Linear / Dense modules (reference layers/mlp.py:11-82 capabilities).

Unlike the reference Linear (2-D inputs only, mlp.py:33), these accept any
leading batch dims. Params: ``{'w': [in, out], 'b': [out]}`` — same layout as
the reference (mlp.py:18-19) and as Flax's Dense kernel/bias.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax

from np_modeling_tpu import ops
from np_modeling_tpu.nn import initializers
from np_modeling_tpu.nn.module import Module, maybe_cast


@dataclasses.dataclass
class Linear(Module):
    """Affine layer. ``dtype`` is the compute dtype (mixed precision):
    params stay fp32, inputs/weights are cast for the matmul, grads flow
    back to fp32 through the cast's VJP."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = initializers.lecun_normal
    bias_init: Callable = initializers.zeros
    dtype: Optional[Any] = None

    def init(self, key, x):
        kw, kb = jax.random.split(key)
        params = {"w": self.kernel_init(kw, (x.shape[-1], self.features))}
        if self.use_bias:
            params["b"] = self.bias_init(kb, (self.features,))
        return params

    def apply(self, params, x, training=False, rngs=None):
        del training, rngs
        w = params["w"]
        if isinstance(w, dict) and "int8" in w:
            # Weight-only int8 leaf (ops.quantize_params_int8, serving):
            # fused dequant-in-VMEM matmul — the weight's HBM traffic is
            # the int8 bytes, no materialized bf16 temp.
            return ops.int8_matmul(maybe_cast(x, self.dtype), w["int8"],
                                   w["scale"], params.get("b"),
                                   out_dtype=self.dtype or x.dtype)
        return ops.linear(maybe_cast(x, self.dtype),
                          maybe_cast(w, self.dtype),
                          maybe_cast(params.get("b"), self.dtype))


@dataclasses.dataclass
class Dense(Module):
    """Linear + activation (default ReLU, matching reference mlp.py:53-63)."""

    features: int
    activation: Any = "relu"
    use_bias: bool = True
    kernel_init: Callable = initializers.lecun_normal
    bias_init: Callable = initializers.zeros
    dtype: Optional[Any] = None

    def __post_init__(self):
        self._linear = Linear(self.features, self.use_bias, self.kernel_init,
                              self.bias_init, self.dtype)
        self._act = ops.get_activation(self.activation)

    def init(self, key, x):
        return {"linear": self._linear.init(key, x)}

    def apply(self, params, x, training=False, rngs=None):
        y = self._linear.apply(params["linear"], x)
        return self._act(y)


@dataclasses.dataclass
class Activation(Module):
    """Parameter-free activation as a standalone composable layer.

    The reference composes ``Softmax`` / ``ReLU`` as layers in sequential
    stacks (/root/reference/layers/activations.py:12-45, used in
    train_test.py's CNN); this is the Sequential-compatible equivalent.
    ``fn`` is an activation name (ops.get_activation) or a callable.
    """

    fn: Any = "relu"

    def __post_init__(self):
        self._act = ops.get_activation(self.fn)

    def init(self, key, x=None):
        return {}

    def apply(self, params, x, training=False, rngs=None):
        del params, training, rngs
        return self._act(x)


def Softmax() -> Activation:
    """Softmax-over-last-axis layer (reference activations.py:22-45; the
    fused y*(dy - sum(dy*y)) VJP, not the reference's O(S^3) Jacobian)."""
    return Activation("softmax")


def ReLU() -> Activation:
    """ReLU layer (reference activations.py:12-19 ``>=0`` convention)."""
    return Activation("relu")


@dataclasses.dataclass
class Dropout(Module):
    """Config wrapper over ops.dropout (reference normalizations.py:9-30)."""

    rate: float
    rng_name: str = "dropout"

    def init(self, key, x=None):
        return {}

    def apply(self, params, x, training=False, rngs=None, salt: int = 0):
        del params
        if not training or self.rate == 0.0:
            return x
        if rngs is None or self.rng_name not in rngs:
            raise ValueError(
                f"Dropout needs rngs={{'{self.rng_name}': key}} in training")
        key = jax.random.fold_in(rngs[self.rng_name], salt)
        return ops.dropout(x, key, self.rate, training=True)


@dataclasses.dataclass
class LayerNorm(Module):
    """Last-axis LayerNorm (reference normalizations.py:33-75).

    ``reference_init=True`` reproduces the reference's quirk of initializing
    gamma/beta from the clipped normal rather than ones/zeros
    (normalizations.py:40-41). Default: ones/zeros (the sane choice).
    """

    epsilon: float = 1e-3  # reference default (normalizations.py:34)
    reference_init: bool = False

    def init(self, key, x):
        n = x.shape[-1]
        if self.reference_init:
            kg, kb = jax.random.split(key)
            return {"gamma": initializers.clipped_normal(kg, (n,)),
                    "beta": initializers.clipped_normal(kb, (n,))}
        return {"gamma": initializers.ones(key, (n,)),
                "beta": initializers.zeros(key, (n,))}

    def apply(self, params, x, training=False, rngs=None):
        del training, rngs
        return ops.layer_norm(x, params["gamma"], params["beta"], self.epsilon)


@dataclasses.dataclass
class RMSNorm(Module):
    epsilon: float = 1e-6
    offset: bool = False   # Gemma-style: scale by (1 + w), w zero-init

    def init(self, key, x):
        init = initializers.zeros if self.offset else initializers.ones
        return {"gamma": init(key, (x.shape[-1],))}

    def apply(self, params, x, training=False, rngs=None):
        del training, rngs
        g = params["gamma"] + 1.0 if self.offset else params["gamma"]
        return ops.rms_norm(x, g, self.epsilon)
