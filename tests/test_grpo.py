"""GRPO: group advantages and the clipped objective vs numpy oracles;
end-to-end RL on the flagship GPT (rewarded tokens gain probability,
KL to the reference stays bounded)."""

import numpy as np

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, training

rng = np.random.default_rng(23)


def test_group_advantages_matches_manual():
    r = rng.normal(size=(12,)).astype(np.float32)
    got = np.asarray(training.group_advantages(jnp.asarray(r), 4))
    g = r.reshape(3, 4)
    want = ((g - g.mean(-1, keepdims=True))
            / (g.std(-1, keepdims=True) + 1e-4)).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # Constant-reward group -> zero advantage (no division blowup).
    z = np.asarray(training.group_advantages(jnp.ones((4,)), 4))
    np.testing.assert_array_equal(z, np.zeros(4))


def test_grpo_loss_matches_manual():
    b, s = 6, 5
    pol = rng.normal(size=(b, s)).astype(np.float32) - 2.0
    old = pol + 0.3 * rng.normal(size=(b, s)).astype(np.float32)
    ref = pol + 0.2 * rng.normal(size=(b, s)).astype(np.float32)
    adv = rng.normal(size=(b,)).astype(np.float32)
    mask = rng.integers(0, 2, (b, s)).astype(np.float32)
    mask[:, 0] = 1.0
    eps, beta = 0.2, 0.05

    loss, aux = training.grpo_loss(
        jnp.asarray(pol), jnp.asarray(old), jnp.asarray(ref),
        jnp.asarray(adv), jnp.asarray(mask), clip_eps=eps, kl_beta=beta)

    ratio = np.exp(pol - old)
    gain = np.minimum(ratio * adv[:, None],
                      np.clip(ratio, 1 - eps, 1 + eps) * adv[:, None])
    d = ref - pol
    kl = np.exp(d) - d - 1
    per = -(gain - beta * kl) * mask
    want = np.mean(per.sum(-1) / np.maximum(mask.sum(-1), 1))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    assert float(aux["kl"]) >= 0.0
    want_clip = (np.abs(ratio - 1) > eps) * mask
    np.testing.assert_allclose(float(aux["clip_frac"]),
                               want_clip.sum() / mask.sum(), rtol=1e-5)


def test_grpo_training_shifts_policy_toward_reward():
    """Reward = fraction of response tokens < 16: after GRPO steps the
    policy's probability mass on tokens < 16 must grow."""
    cfg = models.GPTConfig(vocab_size=32, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=16)
    gpt = models.GPT(cfg)
    local = np.random.default_rng(41)      # independent of test order
    P, G, s = 2, 4, 10
    prompts = np.repeat(local.integers(0, 32, (P, 3)), G, axis=0)
    responses = local.integers(0, 32, (P * G, s - 3))
    tokens = jnp.asarray(np.concatenate([prompts, responses], 1), jnp.int32)
    mask = jnp.asarray(np.concatenate(
        [np.zeros((P * G, 3)), np.ones((P * G, s - 3))], 1), jnp.int32)
    rewards = jnp.asarray((responses < 16).mean(-1), jnp.float32)

    params = gpt.init(jax.random.PRNGKey(0), tokens)
    ref_params = params
    opt = training.adam(1e-3)
    st = opt.init(params)

    def mass_lt16(p):
        probs = jax.nn.softmax(gpt.apply(p, tokens[:, :-1]), axis=-1)
        return float(jnp.mean(probs[..., :16].sum(-1)))

    before = mass_lt16(params)

    @jax.jit
    def step(p, st):
        (loss, aux), g = jax.value_and_grad(
            lambda q: training.gpt_grpo_loss(
                gpt, q, ref_params, tokens, rewards, mask, group_size=G),
            has_aux=True)(p)
        u, st = opt.update(g, st, p)
        return training.apply_updates(p, u), st, loss, aux

    p, s_ = params, st
    for _ in range(40):
        p, s_, loss, aux = step(p, s_)
    after = mass_lt16(p)
    assert after > before + 0.02, (before, after)
    assert float(aux["kl"]) < 2.0            # reference keeps it bounded