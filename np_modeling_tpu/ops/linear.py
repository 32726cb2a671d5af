"""Linear (affine) op with hand-written VJP.

Reference parity: /root/reference/layers/mlp.py:11-50 — fwd ``y = x@W + b``;
bwd ``db = Σ dy``, ``dw = xᵀ@dy``, ``dx = dy@Wᵀ``. The reference supports only
2-D inputs (assert at mlp.py:33; workaround at transformer.py:44-45); we
generalize to arbitrary leading batch dims by flattening to 2-D around the
MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from np_modeling_tpu.ops.matmul import matmul


@jax.custom_vjp
def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """``y = x @ w (+ b)`` over the last axis; leading dims are batch."""
    return _linear_impl(x, w, b)


def _linear_impl(x, w, b):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y2 = matmul(x2, w, b, out_dtype=x.dtype)
    return y2.reshape(*lead, w.shape[-1])


def _linear_fwd(x, w, b):
    return _linear_impl(x, w, b), (x, w, b is not None)


def _linear_bwd(res, dy):
    x, w, has_b = res
    x2 = x.reshape(-1, x.shape[-1])
    dy2 = dy.reshape(-1, dy.shape[-1])
    # Hand-derived grads (reference mlp.py:34-36), as MXU matmuls with the
    # transposes folded into the kernel's index maps:
    db = jnp.sum(dy2, axis=0).astype(w.dtype) if has_b else None
    dw = matmul(x2, dy2, trans_a=True, out_dtype=w.dtype)   # xᵀ @ dy
    dx2 = matmul(dy2, w, trans_b=True, out_dtype=x.dtype)   # dy @ wᵀ
    return dx2.reshape(x.shape), dw, db


linear.defvjp(_linear_fwd, _linear_bwd)
