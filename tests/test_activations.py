"""Activation ops vs trusted oracles (jax.nn) and manual VJPs vs jax.grad.

Oracle pattern mirrors the reference's tests (layers/activations_test.py):
forward equality vs an independent implementation, backward equality of our
hand-written VJP vs autodiff of a plain-jnp composition.
"""

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import ops
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(0)


def _check_grad(our_op, plain_fn, x, tol=1e-6):
    """Compare d(sum(op(x)²))/dx between our custom VJP and autodiff."""
    loss_ours = lambda x: jnp.sum(our_op(x) ** 2)
    loss_ref = lambda x: jnp.sum(plain_fn(x) ** 2)
    g_ours = jax.grad(loss_ours)(x)
    g_ref = jax.grad(loss_ref)(x)
    assert_allclose(g_ours, g_ref, rtol=tol, atol=tol)


class TestReLU:
    def test_forward(self):
        x = jnp.asarray(rand(4, 7, rng=rng))
        assert_allclose(ops.relu(x), jnp.maximum(x, 0.0), rtol=0, atol=0)

    def test_backward_vs_autodiff(self):
        x = jnp.asarray(rand(4, 7, rng=rng))
        _check_grad(ops.relu, jax.nn.relu, x)

    def test_grad_at_zero_matches_reference_convention(self):
        # Reference passes gradient at x == 0 (activations.py:19 uses >=).
        x = jnp.zeros((3,))
        g = jax.grad(lambda x: jnp.sum(ops.relu(x)))(x)
        assert_allclose(g, jnp.ones(3), rtol=0, atol=0)


class TestSoftmax:
    def test_forward_vs_jax(self):
        x = jnp.asarray(rand(2, 3, 9, rng=rng))
        assert_allclose(ops.softmax(x), jax.nn.softmax(x, axis=-1))

    def test_backward_vs_autodiff(self):
        x = jnp.asarray(rand(2, 5, 9, rng=rng))
        _check_grad(ops.softmax, lambda x: jax.nn.softmax(x, axis=-1), x)

    def test_backward_vs_explicit_jacobian(self):
        # Oracle: the reference's materialized Jacobian y_i(δ_ij − y_j)
        # contraction (activations.py:42-45).
        x = jnp.asarray(rand(4, 6, rng=rng))
        dy = jnp.asarray(rand(4, 6, rng=rng))
        y, vjp = jax.vjp(ops.softmax, x)
        (dx,) = vjp(dy)
        n = y.shape[-1]
        j = jnp.eye(n)[None] - y[:, None, :]
        j = j * y[..., None]
        dx_ref = jnp.einsum("...a,...ba->...b", dy, j)
        assert_allclose(dx, dx_ref, rtol=1e-5, atol=1e-6)


class TestGeluSilu:
    def test_gelu(self):
        x = jnp.asarray(rand(5, 8, rng=rng))
        assert_allclose(ops.gelu(x), jax.nn.gelu(x, approximate=True),
                        rtol=1e-5, atol=1e-5)
        _check_grad(ops.gelu, lambda x: jax.nn.gelu(x, approximate=True), x,
                    tol=1e-5)

    def test_silu(self):
        x = jnp.asarray(rand(5, 8, rng=rng))
        assert_allclose(ops.silu(x), jax.nn.silu(x), rtol=1e-6, atol=1e-6)
        _check_grad(ops.silu, jax.nn.silu, x, tol=1e-5)

    def test_quick_gelu(self):
        # CLIP's sigmoid GELU (LLaVA vision tower).
        x = jnp.asarray(rand(5, 8, rng=rng))
        plain = lambda x: x * jax.nn.sigmoid(1.702 * x)
        assert_allclose(ops.quick_gelu(x), plain(x), rtol=1e-6, atol=1e-6)
        _check_grad(ops.quick_gelu, plain, x, tol=1e-5)
