"""Weight initializers.

``clipped_normal`` reproduces the reference's ``RandomInitializer``:
``clip(N(0,1), -1, 1)`` as float32 (/root/reference/layers/layer.py:57-60).
Practical defaults (lecun/glorot) are also provided — the reference's
unit-scale init is usable only for its tiny teaching workloads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clipped_normal(key, shape, dtype=jnp.float32):
    return jnp.clip(jax.random.normal(key, shape, dtype), -1.0, 1.0)


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)


lecun_normal = jax.nn.initializers.lecun_normal()
glorot_uniform = jax.nn.initializers.glorot_uniform()
normal = jax.nn.initializers.normal(stddev=0.02)
