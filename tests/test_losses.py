"""Losses vs optax oracles; manual VJPs vs jax.grad (reference loss_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from np_modeling_tpu import ops
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(202402)


class TestMSE:
    def test_forward(self):
        y = jnp.asarray(rand(8, 5, rng=rng))
        t = jnp.asarray(rand(8, 5, rng=rng))
        assert_allclose(ops.mse(y, t), jnp.mean((y - t) ** 2), rtol=1e-6,
                        atol=1e-6)

    def test_backward(self):
        y = jnp.asarray(rand(8, 5, rng=rng))
        t = jnp.asarray(rand(8, 5, rng=rng))
        g = jax.grad(ops.mse)(y, t)
        # Reference bwd: 2(y−t)/size (loss.py:27-29).
        assert_allclose(g, 2 * (y - t) / y.size, rtol=1e-6, atol=1e-6)


class TestCrossEntropyProbs:
    def test_matches_reference_semantics(self):
        # Unnormalized sum on probabilities (loss.py:33-36).
        logits = jnp.asarray(rand(6, 10, rng=rng))
        probs = jax.nn.softmax(logits)
        t = jax.nn.one_hot(jnp.arange(6) % 10, 10)
        ours = ops.cross_entropy_probs(probs, t)
        ref = -jnp.sum(t * jnp.log(probs))
        assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
        g = jax.grad(ops.cross_entropy_probs)(probs, t)
        assert_allclose(g, -t / probs, rtol=1e-6, atol=1e-6)  # loss.py:38-39

    def test_softmax_composition_matches_optax(self):
        # The composition the reference verifies at loss_test.py:49-66.
        logits = jnp.asarray(rand(6, 10, rng=rng))
        t = jax.nn.one_hot(jnp.arange(6) % 10, 10)
        composed = ops.cross_entropy_probs(ops.softmax(logits), t)
        ref = jnp.sum(optax.softmax_cross_entropy(logits, t))
        assert_allclose(composed, ref)
        g_ours = jax.grad(
            lambda l: ops.cross_entropy_probs(ops.softmax(l), t))(logits)
        g_ref = jax.grad(
            lambda l: jnp.sum(optax.softmax_cross_entropy(l, t)))(logits)
        assert_allclose(g_ours, g_ref, rtol=1e-5, atol=2e-5)


class TestFusedSoftmaxCrossEntropy:
    def test_forward_vs_optax(self):
        logits = jnp.asarray(rand(6, 10, rng=rng))
        t = jax.nn.one_hot(jnp.arange(6) % 10, 10)
        assert_allclose(ops.softmax_cross_entropy(logits, t),
                        optax.softmax_cross_entropy(logits, t))

    def test_backward_is_probs_minus_labels(self):
        logits = jnp.asarray(rand(6, 10, rng=rng))
        t = jax.nn.one_hot(jnp.arange(6) % 10, 10)
        g = jax.grad(lambda l: jnp.sum(ops.softmax_cross_entropy(l, t)))(logits)
        assert_allclose(g, jax.nn.softmax(logits) - t, rtol=1e-5, atol=2e-5)
        g_ref = jax.grad(
            lambda l: jnp.sum(optax.softmax_cross_entropy(l, t)))(logits)
        assert_allclose(g, g_ref, rtol=1e-5, atol=2e-5)

    def test_integer_labels(self):
        logits = jnp.asarray(rand(6, 10, rng=rng))
        labels = jnp.arange(6) % 10
        assert_allclose(
            ops.softmax_cross_entropy_with_integer_labels(logits, labels),
            optax.softmax_cross_entropy_with_integer_labels(logits, labels))
