"""Pipeline parallelism: pipelined stages == sequential application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import parallel
from np_modeling_tpu.parallel.pipeline import make_pipeline
from np_modeling_tpu.utils.testing import assert_allclose, rand

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")
rng = np.random.default_rng(0)

S, D = 4, 16


def _stage_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _stacked_params():
    return {"w": jnp.asarray(rand(S, D, D, rng=rng)) * 0.5,
            "b": jnp.asarray(rand(S, D, rng=rng)) * 0.1}


def _sequential(params, x):
    for i in range(S):
        x = _stage_fn(jax.tree_util.tree_map(lambda a: a[i], params), x)
    return x


@pytest.mark.parametrize("num_microbatches", [1, 2, 4])
def test_pipeline_matches_sequential(num_microbatches):
    mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
    params = _stacked_params()
    x = jnp.asarray(rand(8, D, rng=rng))
    pipe = make_pipeline(mesh, _stage_fn, "pp", num_microbatches)
    assert_allclose(jax.jit(pipe)(params, x), _sequential(params, x),
                    rtol=1e-5, atol=1e-5)


def test_pipeline_backward_matches_sequential():
    mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
    params = _stacked_params()
    x = jnp.asarray(rand(8, D, rng=rng))
    t = jnp.asarray(rand(8, D, rng=rng))
    pipe = make_pipeline(mesh, _stage_fn, "pp", num_microbatches=4)

    g_pipe = jax.jit(jax.grad(
        lambda p: jnp.sum((pipe(p, x) - t) ** 2)))(params)
    g_seq = jax.grad(lambda p: jnp.sum((_sequential(p, x) - t) ** 2))(params)
    assert_allclose(g_pipe["w"], g_seq["w"], rtol=1e-4, atol=1e-5)
    assert_allclose(g_pipe["b"], g_seq["b"], rtol=1e-4, atol=1e-5)


def test_pipeline_training_loop():
    mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
    params = _stacked_params()
    x = jnp.asarray(rand(8, D, rng=rng))
    t = jnp.asarray(rand(8, D, rng=rng))
    pipe = make_pipeline(mesh, _stage_fn, "pp", num_microbatches=2)

    @jax.jit
    def step(p):
        loss, g = jax.value_and_grad(
            lambda p: jnp.mean((pipe(p, x) - t) ** 2))(p)
        return jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, g), loss

    losses = []
    for _ in range(10):
        params, loss = step(params)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
