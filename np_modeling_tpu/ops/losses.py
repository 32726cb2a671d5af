"""Loss ops with hand-written VJPs.

Reference parity:
- MSELoss: /root/reference/loss.py:20-29 — fwd ``Σ(y−t)²/y.size``, bwd
  ``2(y−t)/y.size``.
- CrossEntropyLoss: /root/reference/loss.py:32-39 — operates on
  *probabilities* (expects a prior softmax), unnormalized sum ``−Σ t·log y``,
  bwd ``−t/y``. Kept as-is for parity (`cross_entropy_probs`).
- Fused softmax+CE: the composition the reference tests at
  /root/reference/loss_test.py:49-66 (Softmax layer + CrossEntropyLoss vs
  optax.softmax_cross_entropy). Here it's a single fused op on logits whose
  manual gradient is ``softmax(logits) − labels`` — the numerically stable
  form that never materializes probabilities' log.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def mse(y: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.sum(jnp.square(y - targets)) / y.size


def _mse_fwd(y, targets):
    return jnp.sum(jnp.square(y - targets)) / y.size, (y, targets)


def _mse_bwd(res, g):
    y, targets = res
    d = (2.0 / y.size) * (y - targets) * g
    return d, -d


mse.defvjp(_mse_fwd, _mse_bwd)


@jax.custom_vjp
def cross_entropy_probs(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """−Σ t·log(p) on probabilities (unnormalized sum, reference loss.py:33-36)."""
    return -jnp.sum(targets * jnp.log(probs))


def _cep_fwd(probs, targets):
    return -jnp.sum(targets * jnp.log(probs)), (probs, targets)


def _cep_bwd(res, g):
    probs, targets = res
    # Reference bwd: −t/y (loss.py:38-39).
    return (-targets / probs * g, -jnp.log(probs) * g)


cross_entropy_probs.defvjp(_cep_fwd, _cep_bwd)


@jax.custom_vjp
def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-example CE from logits: ``logsumexp(logits) − Σ labels·logits``.

    Returns shape ``logits.shape[:-1]``. Manual VJP: ``softmax(logits) − labels``.
    Reduce outside (sum/mean) as desired.
    """
    return _sxe_impl(logits, labels)[0]


def _sxe_impl(logits, labels):
    m = jnp.max(logits, axis=-1, keepdims=True)
    shifted = logits - jax.lax.stop_gradient(m)
    e = jnp.exp(shifted)
    sum_e = jnp.sum(e, axis=-1, keepdims=True)
    log_z = jnp.log(sum_e) + m
    ce = jnp.squeeze(log_z, -1) - jnp.sum(labels * logits, axis=-1)
    probs = e / sum_e
    return ce, probs


def _sxe_fwd(logits, labels):
    ce, probs = _sxe_impl(logits, labels)
    return ce, (probs, labels, logits)


def _sxe_bwd(res, g):
    probs, labels, logits = res
    g = g[..., None]
    dlogits = (probs - labels) * g
    dlabels = -logits * g
    return dlogits, dlabels


softmax_cross_entropy.defvjp(_sxe_fwd, _sxe_bwd)


def softmax_cross_entropy_with_integer_labels(logits: jax.Array,
                                              labels: jax.Array) -> jax.Array:
    """CE from logits with int class labels (one-hot-free convenience)."""
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    return softmax_cross_entropy(logits, onehot)
