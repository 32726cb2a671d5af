"""Ring / gather context-parallel attention vs full attention oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import ops, parallel
from np_modeling_tpu.parallel import context
from np_modeling_tpu.utils.testing import assert_allclose, rand

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")
rng = np.random.default_rng(0)


def _qkv(b=2, h=4, s=64, d=16):
    return (jnp.asarray(rand(b, h, s, d, rng=rng)),
            jnp.asarray(rand(b, h, s, d, rng=rng)),
            jnp.asarray(rand(b, h, s, d, rng=rng)))


@pytest.mark.parametrize("impl", ["ring", "gather"])
@pytest.mark.parametrize("causal", [False, True])
def test_matches_full_attention(impl, causal):
    mesh = parallel.make_mesh({"sp": 8})
    q, k, v = _qkv()
    fn = context.make_context_parallel_attention(mesh, "sp", impl, causal)
    out = jax.jit(fn)(q, k, v)
    ref = ops.attention_reference(q, k, v, causal=causal)
    assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", ["ring", "gather"])
def test_grads_match_oracle(impl):
    mesh = parallel.make_mesh({"sp": 8})
    q, k, v = _qkv(b=1, h=2, s=32, d=8)
    fn = context.make_context_parallel_attention(mesh, "sp", impl,
                                                 causal=True)
    g_ours = jax.jit(jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v) ** 2),
                              argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(
            ops.attention_reference(q, k, v, causal=True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ours, g_ref):
        assert_allclose(a, b, rtol=2e-4, atol=2e-4)
