"""Selective state-space scan (Mamba's core recurrence) as a parallel op.

The recurrence ``h_t = a_t * h_{t-1} + b_t`` (h_0 = 0, everything
elementwise over [batch, L, ...]) is the hot loop of selective SSMs
(Mamba's CUDA ``selective_scan_fn``). The TPU-native formulation is a
PARALLEL PREFIX: ``jax.lax.associative_scan`` over the time axis — the
first-order linear recurrence composes as ``(a2, b2) ∘ (a1, b1) =
(a2·a1, a2·b1 + b2)`` — which XLA lowers to a log-depth tree of fused
elementwise ops (no sequential loop, full VPU occupancy) instead of a
hand-written sequential kernel.

Hand-written VJP (repo invariant: no autodiffed backwards): the adjoint
of a linear recurrence is the SAME recurrence run in reverse time with
the coefficients shifted one step — ``λ_t = g_t + a_{t+1}·λ_{t+1}`` —
so the backward is one more associative scan (flip, shift, scan, flip)
plus two elementwise products: ``db_t = λ_t``, ``da_t = λ_t · h_{t-1}``.
Verified against ``jax.grad`` of an independent ``lax.scan`` oracle in
tests/test_ssm.py.

Reference lineage: the reference has no SSMs; this extends the ops tier
(SURVEY.md §2.1) the same way flash attention extended its attention
test-kernel (layers/attentions_test.py:158-265) — a first-class fused
op with a manual backward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a2 * a1, a2 * b1 + b2


def _scan(a, b):
    return jax.lax.associative_scan(_combine, (a, b), axis=1)[1]


@jax.custom_vjp
def selective_scan(a: jax.Array, b: jax.Array) -> jax.Array:
    """All states of ``h_t = a_t * h_{t-1} + b_t`` with ``h_0 = 0``.

    ``a``/``b``: [batch, L, ...] (elementwise; trailing dims are typically
    Mamba's [d_inner, d_state]). Returns h, same shape. fp32 recommended:
    the products telescope, so low precision compounds over L.
    """
    return _scan(a, b)


def _fwd(a, b):
    h = _scan(a, b)
    return h, (a, h)


def _bwd(res, g):
    a, h = res
    # λ_t = g_t + a_{t+1} λ_{t+1}: reverse-time recurrence; reuse the
    # forward scan on flipped arrays with the coefficient shifted left
    # (the first reverse step's coefficient is unused — padded with 1).
    a_next = jnp.concatenate([a[:, 1:], jnp.ones_like(a[:, :1])], axis=1)
    lam = jnp.flip(_scan(jnp.flip(a_next, axis=1), jnp.flip(g, axis=1)),
                   axis=1)
    h_prev = jnp.concatenate([jnp.zeros_like(h[:, :1]), h[:, :-1]], axis=1)
    return lam * h_prev, lam


selective_scan.defvjp(_fwd, _bwd)


def selective_scan_step(ssm_state, a_t, b_t):
    """One decode step: ``h_t = a_t * h + b_t`` ([batch, ...], no L axis)."""
    return a_t * ssm_state + b_t
