"""Normalization ops: layer_norm, rms_norm, dropout — hand-written VJPs.

Reference parity:
- LayerNormalization fwd/bwd: /root/reference/layers/normalizations.py:33-75.
  The reference backward materializes a per-sample [n, n] Jacobian combining
  dmean/dx and dvar/dx terms (normalizations.py:59-71). We use the fused
  two-reduction form:
      dx = rstd * (dyhat − mean(dyhat) − yhat * mean(dyhat * yhat))
  which is algebraically identical and maps to two VPU reductions.
- DropOut: inverted dropout, /root/reference/layers/normalizations.py:9-30.
  TPU-native version is functional: the mask comes from an explicit PRNG key
  (no hidden state), and the same mask is used in fwd and bwd by construction
  of the VJP residuals (the reference caches ``self._mask``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from np_modeling_tpu.ops import dispatch


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               eps: float = 1e-3) -> jax.Array:
    """Last-axis layer norm with learned scale/offset.

    Default eps matches the reference (normalizations.py:34: 1e-3).
    """
    return _layer_norm_impl(x, gamma, beta, eps)[0]


def _layer_norm_impl(x, gamma, beta, eps):
    # Statistics always in fp32 (bf16 mean/var is numerically unusable).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    yhat = (xf - mean) * rstd
    out = gamma.astype(jnp.float32) * yhat + beta.astype(jnp.float32)
    return out.astype(x.dtype), yhat, rstd


def _use_ln_kernel():
    f = dispatch.forced()
    return f if f is not None else False  # XLA fuses LN well; kernel opt-in


def _layer_norm_fwd(x, gamma, beta, eps):
    # Residual is (x, gamma): stats are recomputed in backward (cheaper in
    # HBM than saving yhat+rstd, and keeps pallas/jnp paths interchangeable).
    if _use_ln_kernel():
        from np_modeling_tpu.ops import fused
        out = fused.layer_norm_fwd_pallas(x, gamma, beta, eps)
    else:
        out, _, _ = _layer_norm_impl(x, gamma, beta, eps)
    return out, (x, gamma)


def _layer_norm_bwd(eps, res, dz):
    x, gamma = res
    if _use_ln_kernel():
        from np_modeling_tpu.ops import fused
        return fused.layer_norm_bwd_pallas(x, gamma, dz, eps)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    yhat = (xf - mean) * rstd
    dzf = dz.astype(jnp.float32)
    batch_axes = tuple(range(dz.ndim - 1))
    dbeta = jnp.sum(dzf, axis=batch_axes).astype(gamma.dtype)
    dgamma = jnp.sum(dzf * yhat, axis=batch_axes).astype(gamma.dtype)
    dyhat = dzf * gamma.astype(jnp.float32)
    # Fused form of the reference's Jacobian (normalizations.py:65-71):
    # dx = rstd * (dyhat - mean(dyhat) - yhat * mean(dyhat * yhat))
    m1 = jnp.mean(dyhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
    dx = (rstd * (dyhat - m1 - yhat * m2)).astype(dz.dtype)
    return dx, dgamma, dbeta


layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm(x: jax.Array, gamma: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm (extension op — no mean subtraction, no offset)."""
    return _rms_norm_impl(x, gamma, eps)[0]


def _rms_norm_impl(x, gamma, eps):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(ms + eps)
    yhat = x * rstd
    return gamma * yhat, yhat, rstd


def _rms_norm_fwd(x, gamma, eps):
    out, yhat, rstd = _rms_norm_impl(x, gamma, eps)
    return out, (yhat, rstd, gamma)


def _rms_norm_bwd(eps, res, dz):
    yhat, rstd, gamma = res
    del eps
    batch_axes = tuple(range(dz.ndim - 1))
    dgamma = jnp.sum(dz * yhat, axis=batch_axes)
    dyhat = dz * gamma
    # dx = rstd * (dyhat - yhat * mean(dyhat * yhat))
    m2 = jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
    dx = rstd * (dyhat - yhat * m2)
    return dx, dgamma


rms_norm.defvjp(_rms_norm_fwd, _rms_norm_bwd)


def make_dropout_mask(key: jax.Array, shape, rate: float) -> jax.Array:
    """Bernoulli keep-mask (True = keep) with keep prob 1-rate."""
    return jax.random.bernoulli(key, 1.0 - rate, shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dropout_with_mask(x: jax.Array, mask: jax.Array, rate: float) -> jax.Array:
    """Inverted dropout given an explicit keep-mask.

    Matches reference semantics (normalizations.py:16-30): kept units scaled
    by 1/keep_prob; backward reuses the identical mask.
    """
    keep = 1.0 - rate
    return jnp.where(mask, x / keep, 0.0)


def _dropout_fwd(x, mask, rate):
    keep = 1.0 - rate
    return jnp.where(mask, x / keep, 0.0), mask


def _dropout_bwd(rate, mask, dy):
    keep = 1.0 - rate
    return jnp.where(mask, dy / keep, 0.0), None


dropout_with_mask.defvjp(_dropout_fwd, _dropout_bwd)


def dropout(x: jax.Array, key: jax.Array | None, rate: float,
            training: bool = True) -> jax.Array:
    """Functional inverted dropout.

    ``training=False`` or ``rate == 0`` is the identity (the reference's
    Trainer never set eval mode — a documented gap we close; train.py:41-46).
    """
    if not training or rate == 0.0:
        return x
    if key is None:
        raise ValueError("dropout(training=True, rate>0) requires a PRNG key")
    from np_modeling_tpu.ops import dispatch
    if (dispatch.on_tpu() and not dispatch.interpret_mode()
            and dispatch.forced() is not False):
        # In-kernel PRNG: the mask is regenerated in the backward kernel
        # from the seed — zero HBM residual for the mask (ops/fused.py).
        # TPU-only: interpret mode stubs the TPU PRNG to zeros.
        from np_modeling_tpu.ops.fused import dropout_prng, seed_from_key
        return dropout_prng(x, seed_from_key(key), rate)
    mask = make_dropout_mask(key, x.shape, rate)
    return dropout_with_mask(x, mask, rate)
