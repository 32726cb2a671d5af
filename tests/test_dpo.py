"""DPO/IPO preference losses: formula vs a numpy oracle, sequence
logprobs vs log_softmax gather, and end-to-end preference training on the
flagship GPT (margin grows, accuracy reaches 1)."""

import numpy as np

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, training

rng = np.random.default_rng(7)


def _log_sigmoid(x):
    return -np.log1p(np.exp(-x))


def test_dpo_loss_matches_manual():
    pc, pr, rc, rr = (rng.normal(size=(6,)).astype(np.float32)
                      for _ in range(4))
    beta = 0.17
    loss, (cw, rw) = training.dpo_loss(
        jnp.asarray(pc), jnp.asarray(pr), jnp.asarray(rc), jnp.asarray(rr),
        beta=beta)
    h = (pc - rc) - (pr - rr)
    np.testing.assert_allclose(float(loss),
                               np.mean(-_log_sigmoid(beta * h)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cw), beta * (pc - rc), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rw), beta * (pr - rr), rtol=1e-6)

    # Label smoothing mixes in the flipped term.
    loss_ls, _ = training.dpo_loss(
        jnp.asarray(pc), jnp.asarray(pr), jnp.asarray(rc), jnp.asarray(rr),
        beta=beta, label_smoothing=0.1)
    want = np.mean(-0.9 * _log_sigmoid(beta * h)
                   - 0.1 * _log_sigmoid(-beta * h))
    np.testing.assert_allclose(float(loss_ls), want, rtol=1e-6)

    # IPO: squared distance to the 1/(2beta) margin.
    loss_ipo, _ = training.dpo_loss(
        jnp.asarray(pc), jnp.asarray(pr), jnp.asarray(rc), jnp.asarray(rr),
        beta=beta, variant="ipo")
    np.testing.assert_allclose(float(loss_ipo),
                               np.mean((h - 1 / (2 * beta)) ** 2), rtol=1e-6)


def test_sequence_logprobs_matches_log_softmax():
    cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=32)
    gpt = models.GPT(cfg)
    toks = jnp.asarray(rng.integers(0, 50, (3, 10)), jnp.int32)
    params = gpt.init(jax.random.PRNGKey(0), toks)
    mask = jnp.asarray(rng.integers(0, 2, (3, 10)), jnp.int32)

    got = training.sequence_logprobs(gpt, params, toks, mask)
    logp = jax.nn.log_softmax(gpt.apply(params, toks[:, :-1]), axis=-1)
    per_tok = np.take_along_axis(np.asarray(logp),
                                 np.asarray(toks[:, 1:])[..., None],
                                 axis=-1)[..., 0]
    want = (per_tok * np.asarray(mask)[:, 1:]).sum(-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_dpo_training_grows_margin():
    cfg = models.GPTConfig(vocab_size=32, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=16)
    gpt = models.GPT(cfg)
    b, s = 4, 10
    prompt = rng.integers(0, 32, (b, 3))
    chosen = jnp.asarray(np.concatenate(
        [prompt, rng.integers(0, 16, (b, s - 3))], axis=1), jnp.int32)
    rejected = jnp.asarray(np.concatenate(
        [prompt, rng.integers(16, 32, (b, s - 3))], axis=1), jnp.int32)
    resp_mask = jnp.asarray(
        np.concatenate([np.zeros((b, 3)), np.ones((b, s - 3))], 1),
        jnp.int32)

    params = gpt.init(jax.random.PRNGKey(1), chosen)
    ref_params = params
    opt = training.adam(5e-4)
    state = opt.init(params)

    @jax.jit
    def step(p, st):
        (loss, aux), g = jax.value_and_grad(
            lambda q: training.gpt_dpo_loss(
                gpt, q, ref_params, chosen, rejected,
                chosen_mask=resp_mask, rejected_mask=resp_mask),
            has_aux=True)(p)
        u, st = opt.update(g, st, p)
        return training.apply_updates(p, u), st, loss, aux

    losses, margins = [], []
    p, st = params, state
    for _ in range(25):
        p, st, loss, aux = step(p, st)
        losses.append(float(loss))
        margins.append(float(jnp.mean(aux["chosen_rewards"]
                                      - aux["rejected_rewards"])))
    assert losses[-1] < losses[0], losses
    assert abs(margins[0]) < 1e-5        # ref == policy at step 0
    assert margins[-1] > 0.05, margins
    assert float(aux["accuracy"]) == 1.0