"""MoE layer: routing correctness vs a per-token loop oracle; EP sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import parallel
from np_modeling_tpu.nn.moe import MoE
from np_modeling_tpu.parallel.sharding import shard_params
from np_modeling_tpu.utils.testing import assert_allclose, rand
from jax.sharding import PartitionSpec as P

rng = np.random.default_rng(0)


def _moe(e=4, ff=32, cf=8.0):
    # Huge capacity factor -> no token dropping -> loop oracle is exact.
    return MoE(num_experts=e, hidden_units=ff, capacity_factor=cf)


def _oracle(moe, params, x):
    """Per-token python-loop top-2 routing (no capacity)."""
    xt = np.asarray(x.reshape(-1, x.shape[-1]))
    gates = np.asarray(jax.nn.softmax(x.reshape(-1, x.shape[-1])
                                      @ params["router"], axis=-1))
    out = np.zeros_like(xt)
    for t in range(xt.shape[0]):
        top2 = np.argsort(gates[t])[::-1][:2]
        w = gates[t][top2]
        w = w / w.sum()
        for ei, wi in zip(top2, w):
            h = np.maximum(xt[t] @ np.asarray(params["w1"][ei])
                           + np.asarray(params["b1"][ei]), 0.0)
            y = h @ np.asarray(params["w2"][ei]) + np.asarray(params["b2"][ei])
            out[t] += wi * y
    return out.reshape(x.shape)


def test_matches_loop_oracle():
    moe = _moe()
    x = jnp.asarray(rand(3, 10, 16, rng=rng))
    params = moe.init(jax.random.PRNGKey(0), x)
    out = moe.apply(params, x)
    ref = _oracle(moe, params, x)
    assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_grads_finite_and_nonzero():
    moe = _moe()
    x = jnp.asarray(rand(2, 8, 16, rng=rng))
    params = moe.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: jnp.sum(moe.apply(p, x) ** 2))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    assert float(jnp.sum(jnp.abs(g["router"]))) > 0
    assert float(jnp.sum(jnp.abs(g["w1"]))) > 0


def test_capacity_drops_tokens():
    # Tiny capacity: overflowing tokens contribute nothing (partially or
    # fully dropped), so outputs differ from the uncapped oracle.
    moe = MoE(num_experts=2, hidden_units=8, capacity_factor=0.1)
    x = jnp.asarray(rand(1, 64, 8, rng=rng))
    params = moe.init(jax.random.PRNGKey(0), x)
    out = moe.apply(params, x)
    assert np.isfinite(np.asarray(out)).all()
    ref = _oracle(moe, params, x)
    assert not np.allclose(np.asarray(out), ref, atol=1e-3)


def test_load_balancing_loss():
    moe = _moe()
    x = jnp.asarray(rand(2, 16, 16, rng=rng))
    params = moe.init(jax.random.PRNGKey(0), x)
    aux = moe.load_balancing_loss(params, x)
    assert float(aux) >= 1.0 - 1e-5  # minimum at perfect balance is 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_expert_parallel_sharding_matches():
    moe = _moe(e=8)
    x = jnp.asarray(rand(2, 16, 16, rng=rng))
    params = moe.init(jax.random.PRNGKey(0), x)
    ref = moe.apply(params, x)

    mesh = parallel.make_mesh({"ep": 8})
    rules = ((r".*/w[12]$", P("ep", None, None)),
             (r".*/b[12]$", P("ep", None)))
    sharded = shard_params(params, mesh, rules)
    out = jax.jit(moe.apply)(sharded, x)
    assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_moe_gpt_trains():
    from np_modeling_tpu import models, training
    cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=16,
                           moe_experts=4)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 50, (4, 12)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    assert "moe" in params["layer_0"]
    opt = training.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda p: gpt.loss(p, tokens))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss

    losses = []
    for _ in range(12):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # Router grads flow (aux loss is wired in).
    g = jax.grad(lambda p: gpt.loss(p, tokens))(params)
    assert float(jnp.sum(jnp.abs(g["layer_0"]["moe"]["router"]))) > 0


class TestSwitchRouting:
    def test_top1_routes_each_token_to_one_expert(self):
        from np_modeling_tpu.nn.moe import MoE
        moe = MoE(num_experts=4, hidden_units=32, router_top_k=1,
                  capacity_factor=4.0)
        x = jnp.asarray(rand(2, 16, 16, rng=rng))
        params = moe.init(jax.random.PRNGKey(0), x)
        out, aux = moe.apply_with_aux(params, x)
        assert out.shape == x.shape and float(aux) > 0
        # With huge capacity, every token's output is its top-1 expert's
        # FFN output weighted by the raw softmax gate.
        xt = x.reshape(-1, 16)
        gates = jax.nn.softmax(xt @ params["router"], axis=-1)
        idx = jnp.argmax(gates, axis=-1)
        ref = []
        for t in range(xt.shape[0]):
            e = int(idx[t])
            h = jax.nn.relu(xt[t] @ params["w1"][e] + params["b1"][e])
            ref.append((h @ params["w2"][e] + params["b2"][e])
                       * gates[t, e])
        assert_allclose(out.reshape(-1, 16), jnp.stack(ref),
                        rtol=1e-5, atol=1e-5)

    def test_switch_gpt_trains(self):
        from np_modeling_tpu import models, training
        tokens = jnp.asarray(rng.integers(0, 50, (4, 12)))
        cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                               num_layers=2, hidden_units=64, max_len=16,
                               moe_experts=4, moe_top_k=1)
        gpt = models.GPT(cfg)
        params = gpt.init(jax.random.PRNGKey(0), tokens)
        opt = training.adam(1e-3)
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            loss, g = jax.value_and_grad(lambda p: gpt.loss(p, tokens))(p)
            u, s = opt.update(g, s, p)
            return training.apply_updates(p, u), s, loss

        losses = []
        for _ in range(12):
            params, state, loss = step(params, state)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
