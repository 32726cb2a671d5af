"""Optimizers vs optax oracles; reference Adam variant semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from np_modeling_tpu import training
from np_modeling_tpu.utils.testing import assert_trees_allclose, rand

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
