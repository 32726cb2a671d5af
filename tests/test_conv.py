"""Conv2D vs jax.lax.conv oracle (reference conv_test.py strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import nn, ops
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(42)


def _ref_conv(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b if b is not None else y


@pytest.mark.parametrize("k", [1, 3, 5])
def test_forward_vs_lax(k):
    x = jnp.asarray(rand(2, 8, 8, 3, rng=rng))
    w = jnp.asarray(rand(k, k, 3, 5, rng=rng))
    b = jnp.asarray(rand(5, rng=rng))
    assert_allclose(ops.conv2d(x, w, b), _ref_conv(x, w, b), rtol=1e-5,
                    atol=1e-5)


def test_backward_vs_autodiff():
    x = jnp.asarray(rand(2, 6, 6, 3, rng=rng))
    w = jnp.asarray(rand(3, 3, 3, 4, rng=rng))
    b = jnp.asarray(rand(4, rng=rng))
    t = jnp.asarray(rand(2, 6, 6, 4, rng=rng))

    loss_ours = lambda x, w, b: ops.mse(ops.conv2d(x, w, b), t)
    loss_ref = lambda x, w, b: jnp.sum((_ref_conv(x, w, b) - t) ** 2) / t.size
    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g_ours, g_ref):
        assert_allclose(a, bb, rtol=1e-5, atol=2e-5)


def test_transpose_is_grad_x():
    # dx of conv == transposed conv with flipped/IO-swapped filters
    # (reference conv.py:110-153).
    x = jnp.asarray(rand(1, 5, 5, 2, rng=rng))
    w = jnp.asarray(rand(3, 3, 2, 3, rng=rng))
    dy = jnp.asarray(rand(1, 5, 5, 3, rng=rng))
    _, vjp = jax.vjp(lambda x: ops.conv2d(x, w), x)
    (dx,) = vjp(dy)
    assert_allclose(ops.conv2d_transpose(dy, w), dx, rtol=1e-5, atol=1e-5)


def test_module_fused_relu():
    # Reference Conv2D fuses ReLU by default (conv.py:32,48).
    x = jnp.asarray(rand(2, 6, 6, 3, rng=rng))
    mod = nn.Conv2D(channels=4, kernel_size=3)
    p = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(p, x)
    ref = jnp.maximum(_ref_conv(x, p["w"], p["b"]), 0.0)
    assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert (np.asarray(out) >= 0).all()


class TestGeneralizedConv:
    """Strides/VALID support — beyond the reference's asserts (conv.py:27-29).

    Oracle: jax.grad through a plain lax.conv composition.
    """

    @pytest.mark.parametrize("strides", [(1, 1), (2, 2), (2, 1)])
    @pytest.mark.parametrize("padding", ["SAME", "VALID"])
    @pytest.mark.parametrize("k", [2, 3])
    def test_forward_and_backward(self, strides, padding, k):
        x = jnp.asarray(rand(2, 9, 11, 3, rng=rng))
        w = jnp.asarray(rand(k, k, 3, 5, rng=rng))
        b = jnp.asarray(rand(5, rng=rng))

        def ref(x, w, b):
            y = jax.lax.conv_general_dilated(
                x, w, strides, padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + b

        out = ops.conv2d(x, w, b, strides, padding)
        assert_allclose(out, ref(x, w, b), rtol=1e-5, atol=1e-5)

        loss_ours = lambda x, w, b: jnp.sum(
            ops.conv2d(x, w, b, strides, padding) ** 2)
        loss_ref = lambda x, w, b: jnp.sum(ref(x, w, b) ** 2)
        g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(x, w, b)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
        for a, bb in zip(g_ours, g_ref):
            assert_allclose(a, bb, rtol=1e-4, atol=1e-4)

    def test_strided_module(self):
        mod = nn.Conv2D(channels=8, kernel_size=3, strides=(2, 2))
        x = jnp.asarray(rand(2, 8, 8, 3, rng=rng))
        p = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(p, x)
        assert out.shape == (2, 4, 4, 8)
