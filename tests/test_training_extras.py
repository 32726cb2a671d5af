"""Schedules, gradient accumulation, data pipeline, debugging utils."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from np_modeling_tpu import models, training
from np_modeling_tpu.training import data, schedules
from np_modeling_tpu.utils import debugging
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(0)


class TestSchedules:
    def test_warmup_cosine_matches_optax(self):
        ours = schedules.warmup_cosine(peak=1e-3, warmup_steps=10,
                                       total_steps=100)
        ref = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=1e-3, warmup_steps=10,
            decay_steps=100, end_value=0.0)
        for step in [0, 5, 10, 50, 99, 150]:
            np.testing.assert_allclose(float(ours(jnp.asarray(step))),
                                       float(ref(step)), rtol=1e-5, atol=1e-9)

    def test_scheduled_adam_changes_lr(self):
        sched = schedules.linear_warmup(peak=1.0, warmup_steps=4)
        opt = training.adam(sched)
        params = {"w": jnp.ones(3)}
        state = opt.init(params)
        g = {"w": jnp.ones(3)}
        u1, state = opt.update(g, state, params)       # step 0: lr 0
        u2, state = opt.update(g, state, params)       # step 1: lr 0.25
        assert float(jnp.abs(u1["w"]).max()) == 0.0
        assert float(jnp.abs(u2["w"]).max()) > 0.0


class TestGradAccum:
    def test_accumulated_equals_full_batch(self):
        x = jnp.asarray(rand(16, 8, rng=rng))
        t = jnp.asarray(rand(16, 2, rng=rng))
        model = models.MLP([16], 2)
        params = model.init(jax.random.PRNGKey(0), x)
        opt = training.sgd(0.1)

        step1 = training.make_train_step(model.apply, "mse", opt,
                                         donate=False, grad_accum=1)
        step4 = training.make_train_step(model.apply, "mse", opt,
                                         donate=False, grad_accum=4)
        key = jax.random.PRNGKey(1)
        p1, _, l1 = step1(params, opt.init(params), x, t, key)
        p4, _, l4 = step4(params, opt.init(params), x, t, key)
        # MSE over equal-size microbatches averages to the full-batch value.
        assert_allclose(l4, l1, rtol=1e-5, atol=1e-6)
        assert_allclose(p4["0"]["linear"]["w"], p1["0"]["linear"]["w"],
                        rtol=1e-5, atol=1e-6)


class TestDataPipeline:
    def test_batches_cover_epoch(self):
        xs = np.arange(100).reshape(100, 1)
        ys = np.arange(100)
        seen = []
        for bx, by in data.batches([xs, ys], 10, seed=3):
            assert bx.shape == (10, 1)
            np.testing.assert_array_equal(bx[:, 0], by)  # alignment held
            seen.extend(by.tolist())
        assert sorted(seen) == list(range(100))

    def test_prefetch_preserves_order_and_content(self):
        it = data.batches([np.arange(40).reshape(40, 1)], 8, shuffle=False)
        got = [np.asarray(b[0]) for b in data.prefetch_to_device(it, size=2)]
        assert len(got) == 5
        np.testing.assert_array_equal(np.concatenate(got)[:, 0],
                                      np.arange(40))

    def test_epochs_reshuffle(self):
        xs = np.arange(20)
        e = list(data.epochs([xs], 20, 2, seed=0, drop_remainder=False))
        assert len(e) == 2
        assert not np.array_equal(e[0][0], e[1][0])  # different shuffles


class TestDebugging:
    def test_all_finite_and_norm(self):
        tree = {"a": jnp.ones(4), "b": jnp.zeros((2, 2))}
        assert bool(debugging.all_finite(tree))
        np.testing.assert_allclose(float(debugging.tree_norm(tree)), 2.0)
        bad = {"a": jnp.asarray([1.0, jnp.nan])}
        assert not bool(debugging.all_finite(bad))
