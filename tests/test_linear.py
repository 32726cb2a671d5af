"""Linear op + modules vs Flax Dense; manual VJP vs jax.grad.

Mirrors reference mlp_test.py: forward at 1e-6, backward vs jax.grad of an
MSE loss, and post-SGD-step weight equality (mlp_test.py:69-94).
"""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import nn, ops, training
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(7)


class TestLinearOp:
    def test_forward_vs_flax(self):
        x = jnp.asarray(rand(6, 10, rng=rng))
        w = jnp.asarray(rand(10, 4, rng=rng))
        b = jnp.asarray(rand(4, rng=rng))
        ref = fnn.Dense(4).apply({"params": {"kernel": w, "bias": b}}, x)
        assert_allclose(ops.linear(x, w, b), ref, rtol=1e-6, atol=1e-6)

    def test_batched_leading_dims(self):
        # Generalization the reference lacks (mlp.py:33 asserts 2-D).
        x = jnp.asarray(rand(2, 3, 5, 10, rng=rng))
        w = jnp.asarray(rand(10, 4, rng=rng))
        b = jnp.asarray(rand(4, rng=rng))
        out = ops.linear(x, w, b)
        assert out.shape == (2, 3, 5, 4)
        assert_allclose(out, x @ w + b, rtol=1e-6, atol=1e-6)

    def test_no_bias(self):
        x = jnp.asarray(rand(6, 10, rng=rng))
        w = jnp.asarray(rand(10, 4, rng=rng))
        assert_allclose(ops.linear(x, w), x @ w, rtol=1e-6, atol=1e-6)
        gw = jax.grad(lambda w: jnp.sum(ops.linear(x, w) ** 2))(w)
        gw_ref = jax.grad(lambda w: jnp.sum((x @ w) ** 2))(w)
        assert_allclose(gw, gw_ref, rtol=1e-5, atol=2e-5)

    def test_backward_vs_autodiff(self):
        x = jnp.asarray(rand(6, 10, rng=rng))
        w = jnp.asarray(rand(10, 4, rng=rng))
        b = jnp.asarray(rand(4, rng=rng))
        t = jnp.asarray(rand(6, 4, rng=rng))

        loss_ours = lambda x, w, b: ops.mse(ops.linear(x, w, b), t)
        loss_ref = lambda x, w, b: jnp.sum((x @ w + b - t) ** 2) / t.size
        g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(x, w, b)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
        for a, bb in zip(g_ours, g_ref):
            assert_allclose(a, bb, rtol=1e-5, atol=2e-5)

    def test_sgd_step_matches_reference_semantics(self):
        # Reference: backward applies w -= lr·dw in place (mlp.py:38,
        # optimizer.py:30-33). Functional equivalent: grad + sgd update.
        x = jnp.asarray(rand(6, 10, rng=rng))
        w = jnp.asarray(rand(10, 4, rng=rng))
        b = jnp.asarray(rand(4, rng=rng))
        t = jnp.asarray(rand(6, 4, rng=rng))
        lr = 0.1
        grads = jax.grad(
            lambda p: ops.mse(ops.linear(x, p["w"], p["b"]), t))({"w": w, "b": b})
        opt = training.sgd(lr)
        updates, _ = opt.update(grads, opt.init(None))
        new = training.apply_updates({"w": w, "b": b}, updates)
        gw_ref = jax.grad(
            lambda w: jnp.sum((x @ w + b - t) ** 2) / t.size)(w)
        assert_allclose(new["w"], w - lr * gw_ref, rtol=1e-5, atol=2e-5)


class TestModules:
    def test_dense_module_relu_default(self):
        # Reference Dense is Linear + ReLU by default (mlp.py:53-63).
        x = jnp.asarray(rand(6, 10, rng=rng))
        mod = nn.Dense(4)
        p = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(p, x)
        ref = jnp.maximum(x @ p["linear"]["w"] + p["linear"]["b"], 0.0)
        assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_sequential(self):
        x = jnp.asarray(rand(6, 10, rng=rng))
        model = nn.Sequential([nn.Dense(8), nn.Dense(8), nn.Linear(2)])
        p = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(p, x)
        assert out.shape == (6, 2)

    def test_reference_initializer(self):
        # clip(N(0,1), -1, 1) — reference layers/layer.py:57-60.
        vals = nn.initializers.clipped_normal(jax.random.PRNGKey(0), (2000,))
        v = np.asarray(vals)
        assert v.min() >= -1.0 and v.max() <= 1.0
        assert (np.abs(v) == 1.0).sum() > 0  # clipping actually engaged
