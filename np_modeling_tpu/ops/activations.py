"""Activation ops with hand-written VJPs.

Reference parity (capabilities, not code):
- ReLU fwd/bwd: /root/reference/layers/activations.py:12-19. The reference
  passes gradient at x == 0 (uses ``>=``); we keep that convention and
  document it (SURVEY.md §7 "behavioral-compat decisions").
- Softmax fwd: max-shifted, /root/reference/layers/activations.py:26-31.
  The reference backward materializes the full Jacobian y_i(δ_ij − y_j)
  per batch element (O(n²) memory per row, activations.py:33-45). We use the
  algebraically identical fused form ``dx = y * (dy − Σ_j dy_j·y_j)`` which is
  one reduction + one multiply — the form a TPU VPU wants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def relu(x: jax.Array) -> jax.Array:
    """max(x, 0). Manual VJP: pass-through where x >= 0."""
    return jnp.maximum(x, 0.0)


def _relu_fwd(x):
    return jnp.maximum(x, 0.0), x


def _relu_bwd(x, dy):
    # Reference convention: gradient flows at x == 0 (activations.py:19).
    return (jnp.where(x >= 0.0, dy, 0.0),)


relu.defvjp(_relu_fwd, _relu_bwd)


@jax.custom_vjp
def softmax(x: jax.Array) -> jax.Array:
    """Numerically stable softmax over the last axis. Manual VJP (fused form)."""
    return _softmax_fwd_impl(x)


def _softmax_fwd_impl(x):
    x_max = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - x_max)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _softmax_fwd(x):
    y = _softmax_fwd_impl(x)
    return y, y


def _softmax_bwd(y, dy):
    # d/dx_j = y_j (dy_j − Σ_i dy_i y_i): the contracted Jacobian
    # y_i(δ_ij − y_j) without materializing it (cf. reference activations.py:42-45,
    # which builds the [.., n, n] Jacobian explicitly).
    inner = jnp.sum(dy * y, axis=-1, keepdims=True)
    return (y * (dy - inner),)


softmax.defvjp(_softmax_fwd, _softmax_bwd)


@jax.custom_vjp
def gelu(x: jax.Array) -> jax.Array:
    """Tanh-approximation GELU with a hand-written VJP (extension op)."""
    return _gelu_impl(x)


_GELU_C = 0.7978845608028654  # sqrt(2/pi)


def _gelu_impl(x):
    inner = _GELU_C * (x + 0.044715 * x**3)
    return 0.5 * x * (1.0 + jnp.tanh(inner))


def _gelu_fwd(x):
    return _gelu_impl(x), x


def _gelu_bwd(x, dy):
    inner = _GELU_C * (x + 0.044715 * x**3)
    t = jnp.tanh(inner)
    sech2 = 1.0 - t * t
    dinner = _GELU_C * (1.0 + 3 * 0.044715 * x * x)
    return (dy * (0.5 * (1.0 + t) + 0.5 * x * sech2 * dinner),)


gelu.defvjp(_gelu_fwd, _gelu_bwd)


@jax.custom_vjp
def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU: x * Phi(x). HF ``hidden_act="gelu"`` —
    GPT-NeoX/Pythia use this form; ``gelu`` above is the tanh
    approximation (HF ``gelu_new``)."""
    return _gelu_exact_impl(x)


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _gelu_exact_impl(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x * _INV_SQRT2))


def _gelu_exact_fwd(x):
    return _gelu_exact_impl(x), x


def _gelu_exact_bwd(x, dy):
    # d/dx [x Phi(x)] = Phi(x) + x phi(x).
    phi_cdf = 0.5 * (1.0 + jax.lax.erf(x * _INV_SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)
    return (dy * (phi_cdf + x * pdf),)


gelu_exact.defvjp(_gelu_exact_fwd, _gelu_exact_bwd)


@jax.custom_vjp
def silu(x: jax.Array) -> jax.Array:
    """x * sigmoid(x) with a hand-written VJP (extension op)."""
    return x * jax.nn.sigmoid(x)


def _silu_fwd(x):
    return x * jax.nn.sigmoid(x), x


def _silu_bwd(x, dy):
    s = jax.nn.sigmoid(x)
    return (dy * (s * (1.0 + x * (1.0 - s))),)


silu.defvjp(_silu_fwd, _silu_bwd)


@jax.custom_vjp
def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — CLIP's sigmoid GELU approximation (HF
    ``hidden_act="quick_gelu"``; the LLaVA vision tower uses it)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _quick_gelu_fwd(x):
    return x * jax.nn.sigmoid(1.702 * x), x


def _quick_gelu_bwd(x, dy):
    s = jax.nn.sigmoid(1.702 * x)
    return (dy * (s * (1.0 + 1.702 * x * (1.0 - s))),)


quick_gelu.defvjp(_quick_gelu_fwd, _quick_gelu_bwd)


ACTIVATIONS = {
    "relu": relu,
    "softmax": softmax,
    "gelu": gelu,
    "gelu_exact": gelu_exact,
    "silu": silu,
    "quick_gelu": quick_gelu,
    "linear": lambda x: x,
    None: lambda x: x,
}


def get_activation(name):
    """Resolve an activation by name (or pass a callable through)."""
    if callable(name):
        return name
    if name not in ACTIVATIONS:
        raise ValueError(f"Unknown activation: {name!r}")
    return ACTIVATIONS[name]
