"""LayerNorm / RMSNorm / Dropout: Flax-oracle forwards, jax.grad backwards.

Mirrors the reference's normalizations_test.py strategy: forward vs
flax.linen.LayerNorm, manual-VJP grads vs autodiff, dropout mask identity
between fwd and bwd (normalizations_test.py:24-30).
"""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import nn, ops
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(2024)


class TestLayerNorm:
    def test_forward_vs_flax(self):
        x = jnp.asarray(rand(4, 6, 16, rng=rng))
        gamma = jnp.asarray(rand(16, rng=rng))
        beta = jnp.asarray(rand(16, rng=rng))
        ours = ops.layer_norm(x, gamma, beta, 1e-3)
        ln = fnn.LayerNorm(epsilon=1e-3, use_fast_variance=False)
        ref = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
        assert_allclose(ours, ref)

    def test_backward_vs_autodiff(self):
        x = jnp.asarray(rand(8, 16, rng=rng))
        gamma = jnp.asarray(rand(16, rng=rng))
        beta = jnp.asarray(rand(16, rng=rng))
        t = jnp.asarray(rand(8, 16, rng=rng))

        def plain(x, gamma, beta):
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
            return gamma * (x - mean) / jnp.sqrt(var + 1e-3) + beta

        loss_ours = lambda *a: jnp.sum((ops.layer_norm(*a, 1e-3) - t) ** 2)
        loss_ref = lambda *a: jnp.sum((plain(*a) - t) ** 2)
        g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(x, gamma, beta)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b in zip(g_ours, g_ref):
            assert_allclose(a, b, rtol=1e-5, atol=2e-5)

    def test_module_reference_init(self):
        x = jnp.asarray(rand(3, 8, rng=rng))
        mod = nn.LayerNorm(reference_init=True)
        p = mod.init(jax.random.PRNGKey(0), x)
        # Reference initializes gamma/beta from clipped normal, NOT ones/zeros
        # (normalizations.py:40-41).
        assert not np.allclose(np.asarray(p["gamma"]), 1.0)
        out = mod.apply(p, x)
        assert out.shape == x.shape


class TestRMSNorm:
    def test_forward_and_grad(self):
        x = jnp.asarray(rand(4, 16, rng=rng))
        gamma = jnp.asarray(rand(16, rng=rng))

        def plain(x, gamma):
            ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
            return gamma * x / jnp.sqrt(ms + 1e-6)

        assert_allclose(ops.rms_norm(x, gamma), plain(x, gamma))
        g_ours = jax.grad(lambda *a: jnp.sum(ops.rms_norm(*a) ** 2),
                          argnums=(0, 1))(x, gamma)
        g_ref = jax.grad(lambda *a: jnp.sum(plain(*a) ** 2),
                         argnums=(0, 1))(x, gamma)
        for a, b in zip(g_ours, g_ref):
            assert_allclose(a, b, rtol=1e-5, atol=2e-5)


class TestDropout:
    def test_eval_identity(self):
        x = jnp.asarray(rand(4, 8, rng=rng))
        assert_allclose(ops.dropout(x, None, 0.5, training=False), x,
                        rtol=0, atol=0)
        assert_allclose(ops.dropout(x, None, 0.0, training=True), x,
                        rtol=0, atol=0)

    def test_inverted_scaling_and_mask(self):
        x = jnp.ones((1000,))
        key = jax.random.PRNGKey(0)
        y = ops.dropout(x, key, 0.3, training=True)
        vals = np.unique(np.asarray(y).round(6))
        # Kept units scaled by 1/keep (reference normalizations.py:23).
        assert set(vals.tolist()) <= {0.0, np.float32(1 / 0.7).round(6)}
        keep_frac = float(np.mean(np.asarray(y) != 0))
        assert 0.6 < keep_frac < 0.8

    def test_backward_uses_same_mask(self):
        # Reference contract: bwd reuses the cached fwd mask
        # (normalizations.py:25-30).
        x = jnp.asarray(rand(64, 64, rng=rng))
        mask = ops.make_dropout_mask(jax.random.PRNGKey(1), x.shape, 0.5)
        y, vjp = jax.vjp(lambda x: ops.dropout_with_mask(x, mask, 0.5), x)
        dy = jnp.asarray(rand(64, 64, rng=rng))
        (dx,) = vjp(dy)
        assert_allclose(dx, jnp.where(mask, dy / 0.5, 0.0), rtol=0, atol=0)
        # fwd zeros exactly where bwd zeros
        np.testing.assert_array_equal(np.asarray(y) == 0, np.asarray(dx) == 0)
