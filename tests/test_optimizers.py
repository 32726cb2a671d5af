"""Optimizers vs optax oracles; reference Adam variant semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from np_modeling_tpu import training
from np_modeling_tpu.utils.testing import (assert_allclose,
                                            assert_trees_allclose, rand)

rng = np.random.default_rng(11)


def _params():
    return {"w": jnp.asarray(rand(4, 3, rng=rng)),
            "b": jnp.asarray(rand(3, rng=rng))}


def _grads():
    return {"w": jnp.asarray(rand(4, 3, rng=rng)),
            "b": jnp.asarray(rand(3, rng=rng))}


def _run(opt, params, grads_seq):
    state = opt.init(params)
    for g in grads_seq:
        updates, state = opt.update(g, state, params)
        params = training.apply_updates(params, updates)
    return params


def _run_optax(opt, params, grads_seq):
    state = opt.init(params)
    for g in grads_seq:
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


class TestSGD:
    def test_matches_optax(self):
        params, gs = _params(), [_grads() for _ in range(5)]
        ours = _run(training.sgd(0.05), params, gs)
        ref = _run_optax(optax.sgd(0.05), params, gs)
        assert_trees_allclose(ours, ref, rtol=1e-6, atol=1e-6)


class TestAdam:
    def test_canonical_matches_optax(self):
        params, gs = _params(), [_grads() for _ in range(5)]
        ours = _run(training.adam(1e-2, epsilon=1e-8), params, gs)
        ref = _run_optax(optax.adam(1e-2, eps=1e-8, eps_root=0.0), params, gs)
        assert_trees_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_reference_epsilon_variant(self):
        # Reference Adam: ε inside the sqrt (optimizer.py:62-63), ε=1e-7.
        params = _params()
        g = _grads()
        opt = training.adam(1e-2, epsilon=1e-7, reference_epsilon=True)
        state = opt.init(params)
        updates, _ = opt.update(g, state, params)
        # Replicate reference math for one step by hand.
        for k in params:
            m = 0.1 * g[k]
            v = 0.001 * g[k] ** 2
            mhat = m / (1 - 0.9)
            vhat = v / (1 - 0.999)
            expected = -1e-2 * mhat / jnp.sqrt(vhat + 1e-7)
            np.testing.assert_allclose(np.asarray(updates[k]),
                                       np.asarray(expected), rtol=1e-5)


class TestComposition:
    def test_adamw_decays(self):
        params, gs = _params(), [_grads() for _ in range(3)]
        ours = _run(training.adamw(1e-2, weight_decay=0.1), params, gs)
        ref = _run_optax(optax.adamw(1e-2, eps=1e-8, weight_decay=0.1),
                         params, gs)
        assert_trees_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_clip_chain(self):
        params = _params()
        big = jax.tree_util.tree_map(lambda g: g * 1e3, _grads())
        opt = training.chain(training.clip_by_global_norm(1.0),
                             training.sgd(1.0))
        updates, _ = opt.update(big, opt.init(params), params)
        norm = jnp.sqrt(sum(jnp.sum(u ** 2)
                            for u in jax.tree_util.tree_leaves(updates)))
        np.testing.assert_allclose(float(norm), 1.0, rtol=1e-5)


class TestAdafactor:
    def _tree(self):
        r = np.random.default_rng(0)
        return {
            "w2d": jnp.asarray(r.normal(size=(200, 160)), jnp.float32),
            "w3d": jnp.asarray(r.normal(size=(160, 8, 130)), jnp.float32),
            "b": jnp.asarray(r.normal(size=(160,)), jnp.float32),
        }

    def test_matches_optax_trajectory(self):
        import optax
        params = self._tree()
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                np.random.default_rng(1).normal(size=p.shape),
                jnp.float32) * 0.1, params)
        ours = training.adafactor(1e-2)
        ref = optax.adafactor(1e-2)
        so, sr = ours.init(params), ref.init(params)
        p1 = p2 = params
        for _ in range(5):
            u1, so = ours.update(grads, so, p1)
            p1 = training.apply_updates(p1, u1)
            u2, sr = ref.update(grads, sr, p2)
            p2 = optax.apply_updates(p2, u2)
        for k in params:
            assert_allclose(p1[k], p2[k], rtol=1e-5, atol=1e-6)

    def test_factored_state_is_small(self):
        params = self._tree()
        state = training.adafactor(1e-2).init(params)
        n_state = sum(x.size for x in jax.tree_util.tree_leaves(state))
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        # Factored EMAs are O(m+n) per matrix (vs O(m*n) for Adam's 2x).
        assert n_state < 0.1 * n_params

    def test_trains_gpt(self):
        from np_modeling_tpu import models
        r = np.random.default_rng(0)
        tokens = jnp.asarray(r.integers(0, 50, (4, 12)))
        cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                               num_layers=2, hidden_units=64, max_len=16)
        gpt = models.GPT(cfg)
        params = gpt.init(jax.random.PRNGKey(0), tokens)
        opt = training.adafactor(3e-2, min_dim_size_to_factor=8)
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            loss, g = jax.value_and_grad(lambda p: gpt.loss(p, tokens))(p)
            u, s = opt.update(g, s, p)
            return training.apply_updates(p, u), s, loss

        losses = []
        for _ in range(15):
            params, state, loss = step(params, state)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


def test_skip_nonfinite_guards_updates_and_state():
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    good = {"w": jnp.full((4,), 0.5), "b": jnp.full((2,), 0.5)}
    bad = {"w": jnp.asarray([0.1, jnp.nan, 0.1, 0.1]),
           "b": jnp.full((2,), 0.5)}
    opt = training.skip_nonfinite(training.adam(1e-1))
    state = opt.init(params)

    u, state = opt.update(good, state, params)
    p1 = training.apply_updates(params, u)
    assert int(state[0]) == 0
    assert not np.allclose(np.asarray(p1["w"]), np.asarray(params["w"]))

    u, state = opt.update(bad, state, p1)           # must be a no-op
    p2 = training.apply_updates(p1, u)
    assert int(state[0]) == 1
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(p1["w"]))
    for a, b in zip(jax.tree_util.tree_leaves(state[1].mu),
                    jax.tree_util.tree_leaves(state[1].mu)):
        assert np.isfinite(np.asarray(a)).all()

    # Trajectory with the bad step skipped == trajectory without it.
    opt2 = training.skip_nonfinite(training.adam(1e-1))
    s2 = opt2.init(params)
    u, s2 = opt2.update(good, s2, params)
    q1 = training.apply_updates(params, u)
    u, s2 = opt2.update(good, s2, q1)
    q2 = training.apply_updates(q1, u)
    u, state = opt.update(good, state, p2)
    p3 = training.apply_updates(p2, u)
    np.testing.assert_allclose(np.asarray(p3["w"]), np.asarray(q2["w"]),
                               rtol=1e-6)


def test_ema_params_tracks_and_debiases():
    init, update, value = training.ema_params(decay=0.9)
    params = {"w": jnp.ones((3,))}
    state = init(params)
    # After 1 update of constant params, the debiased EMA equals them.
    state = update(state, params)
    np.testing.assert_allclose(np.asarray(value(state)["w"]),
                               np.ones(3), rtol=1e-6)
    # Converges to a moved value.
    params2 = {"w": jnp.full((3,), 2.0)}
    for _ in range(60):
        state = update(state, params2)
    np.testing.assert_allclose(np.asarray(value(state)["w"]),
                               np.full(3, 2.0), rtol=1e-2)
    # Matches the closed-form debiased EMA for a simple sequence.
    init2, update2, value2 = training.ema_params(decay=0.5)
    s2 = init2({"x": jnp.zeros(())})
    vals = [1.0, 2.0, 3.0]
    for v in vals:
        s2 = update2(s2, {"x": jnp.asarray(v)})
    num = sum(0.5 ** (len(vals) - 1 - i) * 0.5 * v
              for i, v in enumerate(vals))
    np.testing.assert_allclose(float(value2(s2)["x"]),
                               num / (1 - 0.5 ** 3), rtol=1e-6)
