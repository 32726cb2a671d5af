"""Functional module core: explicit param pytrees, init/apply protocol.

TPU-native replacement for the reference's stateful ``Layer`` ABC
(/root/reference/layers/layer.py:11-49), which lazily allocates weights on
first ``__call__`` and caches activations on ``self`` for backward. Here:

- ``init(key, *example_inputs) -> params`` does the same lazy shape inference
  (weight shapes come from example inputs) but returns an explicit pytree.
- ``apply(params, *inputs, training=..., rngs=...)`` is pure; gradients come
  from ``jax.grad`` flowing through the ops' hand-written VJPs, so there is
  no per-layer backward method to thread an optimizer through (the reference
  fuses optimizer updates into backward, layer.py:37-43 + mlp.py:38-39 — we
  split grads and updates, the functional equivalent).
"""

from __future__ import annotations

import abc
from typing import Any, Optional

import jax

Params = Any  # nested dict pytree
Rngs = Optional[dict]


class Module(abc.ABC):
    """Stateless module: configuration object + init/apply pure functions."""

    @abc.abstractmethod
    def init(self, key: jax.Array, *args, **kwargs) -> Params:
        """Create the parameter pytree from example inputs (lazy shapes)."""

    @abc.abstractmethod
    def apply(self, params: Params, *args, training: bool = False,
              rngs: Rngs = None, **kwargs):
        """Pure forward pass."""

    def __call__(self, params: Params, *args, **kwargs):
        return self.apply(params, *args, **kwargs)


def maybe_cast(x, dtype):
    """Cast to a compute dtype (mixed precision); None = keep as-is."""
    if x is None or dtype is None:
        return x
    return x.astype(dtype)


def rng_for(rngs: Rngs, name: str, salt: int = 0) -> jax.Array | None:
    """Derive a sub-key for a named stochastic site (deterministic per salt)."""
    if rngs is None or name not in rngs:
        return None
    key = rngs[name]
    return jax.random.fold_in(key, salt)


def split_rngs(rngs: Rngs, salt: int) -> Rngs:
    """Fold a salt into every rng stream (for per-layer decorrelation)."""
    if rngs is None:
        return None
    return {k: jax.random.fold_in(v, salt) for k, v in rngs.items()}


class Sequential(Module):
    """Sequence of single-input modules; params keyed ``'0', '1', ...``.

    Functional analogue of the reference Trainer's layer list
    (/root/reference/train.py:27-30).
    """

    def __init__(self, layers):
        self.layers = list(layers)

    def init(self, key, x, **kwargs):
        params = {}
        for i, layer in enumerate(self.layers):
            sub = jax.random.fold_in(key, i)
            p = layer.init(sub, x)
            params[str(i)] = p
            x = layer.apply(p, x)
        return params

    def apply(self, params, x, training=False, rngs=None, **kwargs):
        for i, layer in enumerate(self.layers):
            x = layer.apply(params[str(i)], x, training=training,
                            rngs=split_rngs(rngs, i))
        return x
