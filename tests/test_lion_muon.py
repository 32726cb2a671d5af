"""Lion vs the optax oracle; Muon vs an independent NumPy implementation."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, training
from np_modeling_tpu.utils.testing import assert_trees_allclose, rand

rng = np.random.default_rng(21)


def _params():
    return {"w": jnp.asarray(rand(8, 4, rng=rng)),
            "b": jnp.asarray(rand(4, rng=rng))}


def _grads():
    return {"w": jnp.asarray(rand(8, 4, rng=rng)),
            "b": jnp.asarray(rand(4, rng=rng))}


class TestLion:
    def _run(self, opt, apply, params, gs):
        state = opt.init(params)
        for g in gs:
            updates, state = opt.update(g, state, params)
            params = apply(params, updates)
        return params

    def test_matches_optax(self):
        params, gs = _params(), [_grads() for _ in range(6)]
        ours = self._run(training.lion(1e-2, weight_decay=0.1),
                         training.apply_updates, params, gs)
        ref = self._run(optax.lion(1e-2, weight_decay=0.1),
                        optax.apply_updates, params, gs)
        assert_trees_allclose(ours, ref, rtol=1e-6, atol=1e-6)

    def test_no_decay_matches_optax(self):
        params, gs = _params(), [_grads() for _ in range(4)]
        ours = self._run(training.lion(3e-3), training.apply_updates,
                         params, gs)
        ref = self._run(optax.lion(3e-3, weight_decay=0.0),
                        optax.apply_updates, params, gs)
        assert_trees_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def _np_newton_schulz(m, steps=5):
    a, b, c = 3.4445, -4.7750, 2.0315
    x = np.asarray(m, np.float32)
    t = x.shape[0] > x.shape[1]
    if t:
        x = x.T
    x = x / (np.linalg.norm(x) + 1e-7)
    for _ in range(steps):
        xxt = x @ x.T
        x = a * x + (b * xxt + c * (xxt @ xxt)) @ x
    return x.T if t else x


class TestMuon:
    def test_orthogonalizes(self):
        m = rand(64, 32, rng=rng)
        from np_modeling_tpu.training.optimizers import _newton_schulz
        o = np.asarray(_newton_schulz(jnp.asarray(m)))
        sv = np.linalg.svd(o, compute_uv=False)
        # NS5 drives singular values loosely into ~[0.7, 1.3].
        assert sv.max() < 1.5 and sv.min() > 0.3, (sv.min(), sv.max())
        np.testing.assert_allclose(o, _np_newton_schulz(m), rtol=2e-4,
                                   atol=2e-4)

    def test_matrix_update_matches_numpy_reference(self):
        """One muon step: matrix leaf == NumPy muon; vector leaf == Adam."""
        params, g = _params(), _grads()
        lr, beta = 1e-2, 0.95
        opt = training.muon(lr, beta=beta)
        state = opt.init(params)
        updates, state = opt.update(g, state, params)
        # Matrix leaf: momentum after 1 step is g; nesterov eff = (1+beta)g.
        eff = (1 + beta) * np.asarray(g["w"])
        want = -lr * max(1.0, np.sqrt(8 / 4)) * _np_newton_schulz(eff)
        np.testing.assert_allclose(np.asarray(updates["w"]), want,
                                   rtol=2e-4, atol=2e-4)
        # Vector leaf: exactly Adam's first step.
        adam = training.adam(lr)
        au, _ = adam.update(g, adam.init(params), params)
        np.testing.assert_allclose(np.asarray(updates["b"]),
                                   np.asarray(au["b"]), rtol=1e-6)

    def test_second_step_momentum(self):
        params = _params()
        g1, g2 = _grads(), _grads()
        lr, beta = 5e-3, 0.9
        opt = training.muon(lr, beta=beta)
        state = opt.init(params)
        _, state = opt.update(g1, state, params)
        updates, _ = opt.update(g2, state, params)
        m2 = beta * np.asarray(g1["w"]) + np.asarray(g2["w"])
        eff = beta * m2 + np.asarray(g2["w"])
        want = -lr * np.sqrt(2.0) * _np_newton_schulz(eff)
        np.testing.assert_allclose(np.asarray(updates["w"]), want,
                                   rtol=2e-4, atol=2e-4)

    def test_trains_gpt(self):
        cfg = models.GPTConfig(vocab_size=61, d_model=32, num_heads=4,
                               num_layers=2, hidden_units=64, max_len=32)
        gpt = models.GPT(cfg)
        toks = jax.random.randint(jax.random.PRNGKey(0), (4, 16), 0, 61)
        params = gpt.init(jax.random.PRNGKey(1), toks)
        opt = training.muon(2e-2, adam_lr=2e-3)
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            loss, grads = jax.value_and_grad(
                lambda p: gpt.loss(p, toks))(p)
            u, s = opt.update(grads, s, p)
            return training.apply_updates(p, u), s, loss

        losses = []
        for _ in range(20):
            params, state, loss = step(params, state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] - 0.5
        assert np.isfinite(losses).all()


class TestMuonPartitioning:
    def test_embeddings_excluded_and_state_partitioned(self):
        """Embedding/LM-head tables run Adam (reference Muon excludes them)
        and carry Adam state; matrix leaves carry only a scalar nu
        placeholder (no full second-moment tree)."""
        params = {"embedding": {"table": jnp.asarray(rand(50, 8, rng=rng))},
                  "layer_0": {"w": jnp.asarray(rand(8, 8, rng=rng))}}
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        opt = training.muon(1e-2, adam_lr=1e-3)
        state = opt.init(params)
        _, mu, nu = state
        assert nu["embedding"]["table"].shape == (50, 8)   # adam leaf
        assert nu["layer_0"]["w"].shape == ()              # muon leaf
        updates, _ = opt.update(g, state, params)
        # Embedding update == plain Adam's first step at adam_lr.
        adam = training.adam(1e-3)
        au, _ = adam.update(g, adam.init(params), params)
        np.testing.assert_allclose(np.asarray(updates["embedding"]["table"]),
                                   np.asarray(au["embedding"]["table"]),
                                   rtol=1e-6)
        # Matrix leaf is NOT an Adam update (orthogonalized instead).
        assert not np.allclose(np.asarray(updates["layer_0"]["w"]),
                               np.asarray(au["layer_0"]["w"]))
