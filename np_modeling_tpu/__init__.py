"""np_modeling_tpu: a TPU-native ML framework.

A from-scratch rebuild of the capabilities of `levendlee/np-modeling`
(an educational NumPy framework where every layer ships a hand-derived
forward AND backward pass), redesigned TPU-first:

- Every op is a pure function with a *hand-written* VJP registered via
  ``jax.custom_vjp`` — ``jax.grad`` of a model built from these ops uses our
  manual gradients, never autodiff of the forward. (TPU-native analogue of the
  reference's explicit ``backward()`` methods, e.g. /root/reference/layers/mlp.py:27-40.)
- The hot ops (matmul/attention/layernorm) have Pallas TPU kernels sized to
  MXU/VMEM tiles, with pure-jnp fallbacks used off-TPU and as test oracles.
- Parameters are explicit pytrees; optimizers are pure
  ``(grads, state, params) -> (updates, state)`` functions; the train step is
  a single ``jax.jit`` that shards over a ``jax.sharding.Mesh``.
"""

from np_modeling_tpu import (models, nn, ops, parallel, serving, training,
                             utils)

__version__ = "0.1.0"

__all__ = ["models", "nn", "ops", "parallel", "serving", "training", "utils",
           "__version__"]
