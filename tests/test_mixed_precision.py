"""Mixed precision: bf16 compute, fp32 params/grads/loss."""

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import models, training

rng = np.random.default_rng(0)


def _gpt(dtype):
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=16,
                           dtype=dtype)
    return models.GPT(cfg)


def test_bf16_forward_close_to_fp32():
    tokens = jnp.asarray(rng.integers(0, 64, (2, 12)))
    gpt32, gpt16 = _gpt(None), _gpt(jnp.bfloat16)
    params = gpt32.init(jax.random.PRNGKey(0), tokens)
    l32 = gpt32.apply(params, tokens)
    l16 = gpt16.apply(params, tokens)
    assert l16.dtype == jnp.float32  # logits always fp32
    np.testing.assert_allclose(np.asarray(l32), np.asarray(l16),
                               rtol=0.1, atol=0.1)


def test_bf16_grads_are_fp32_and_training_works():
    tokens = jnp.asarray(rng.integers(0, 64, (4, 12)))
    gpt = _gpt(jnp.bfloat16)
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    grads = jax.grad(lambda p: gpt.loss(p, tokens))(params)
    # Params are fp32 masters; the cast VJP must return fp32 grads.
    for g in jax.tree_util.tree_leaves(grads):
        assert g.dtype == jnp.float32
    opt = training.adam(1e-3)
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
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
