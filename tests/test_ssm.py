"""selective_scan op: associative-scan forward vs a sequential lax.scan
oracle, and the hand-written reverse-scan VJP vs jax.grad of the oracle
(the repo's oracle pattern, SURVEY.md §4)."""

import numpy as np

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops

rng = np.random.default_rng(13)


def _oracle(a, b):
    """h_t = a_t h_{t-1} + b_t via a sequential scan (independent impl)."""
    def step(h, ab):
        at, bt = ab
        h = at * h + bt
        return h, h
    a_t = jnp.moveaxis(a, 1, 0)
    b_t = jnp.moveaxis(b, 1, 0)
    _, hs = jax.lax.scan(step, jnp.zeros_like(a[:, 0]), (a_t, b_t))
    return jnp.moveaxis(hs, 0, 1)


def _rand(*shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def test_forward_matches_sequential():
    a = jnp.asarray(rng.uniform(0.3, 0.99, (2, 33, 5, 4))
                    .astype(np.float32))
    b = _rand(2, 33, 5, 4)
    np.testing.assert_allclose(np.asarray(ops.selective_scan(a, b)),
                               np.asarray(_oracle(a, b)),
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_autodiff_of_oracle():
    a = jnp.asarray(rng.uniform(0.3, 0.99, (2, 17, 3)).astype(np.float32))
    b = _rand(2, 17, 3)
    w = _rand(2, 17, 3)                         # random cotangent weights

    loss_ours = lambda a, b: jnp.sum(w * ops.selective_scan(a, b))
    loss_ref = lambda a, b: jnp.sum(w * _oracle(a, b))
    ga_o, gb_o = jax.grad(loss_ours, argnums=(0, 1))(a, b)
    ga_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga_o), np.asarray(ga_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_o), np.asarray(gb_r),
                               rtol=1e-4, atol=1e-5)


def test_step_matches_scan_suffix():
    a = jnp.asarray(rng.uniform(0.3, 0.99, (2, 9, 4)).astype(np.float32))
    b = _rand(2, 9, 4)
    h = ops.selective_scan(a, b)
    h8 = h[:, -2]
    got = ops.selective_scan_step(h8, a[:, -1], b[:, -1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(h[:, -1]),
                               rtol=1e-6)


def test_length_one_and_jit():
    a, b = _rand(3, 1, 2), _rand(3, 1, 2)
    np.testing.assert_allclose(
        np.asarray(jax.jit(ops.selective_scan)(a, b)), np.asarray(b),
        rtol=1e-6)
