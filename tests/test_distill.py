"""Knowledge distillation: KL op vs autodiff oracle; distilling a draft
raises its speculative-decoding acceptance rate (the production use)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, ops, training
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(17)


class TestKLOp:
    def test_matches_jnp_oracle(self):
        s = jnp.asarray(rand(4, 7, rng=rng))
        t = jnp.asarray(rand(4, 7, rng=rng))

        def oracle(s, t):
            p = jax.nn.softmax(t, -1)
            return jnp.sum(p * (jax.nn.log_softmax(t, -1)
                                - jax.nn.log_softmax(s, -1)), -1)

        assert_allclose(ops.kl_divergence_from_logits(s, t), oracle(s, t))

    def test_manual_grads_match_autodiff(self):
        s = jnp.asarray(rand(3, 9, rng=rng))
        t = jnp.asarray(rand(3, 9, rng=rng))
        w = jnp.asarray(rand(3, rng=rng))

        def ours(s, t):
            return jnp.sum(ops.kl_divergence_from_logits(s, t) * w)

        def oracle(s, t):
            p = jax.nn.softmax(t, -1)
            kl = jnp.sum(p * (jax.nn.log_softmax(t, -1)
                              - jax.nn.log_softmax(s, -1)), -1)
            return jnp.sum(kl * w)

        gs, gt = jax.grad(ours, argnums=(0, 1))(s, t)
        ws, wt = jax.grad(oracle, argnums=(0, 1))(s, t)
        assert_allclose(gs, ws)
        assert_allclose(gt, wt)

    def test_zero_when_identical(self):
        s = jnp.asarray(rand(5, 11, rng=rng))
        kl = ops.kl_divergence_from_logits(s, s)
        np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


class TestDistillDraft:
    def test_distilled_draft_raises_acceptance(self):
        """Distill a small draft toward a 'teacher' GPT, then measure the
        speculative acceptance rate with the draft — it must rise."""
        vocab = 37
        tcfg = models.GPTConfig(vocab_size=vocab, d_model=32, num_heads=4,
                                num_layers=2, hidden_units=64, max_len=64)
        teacher = models.GPT(tcfg)
        # A LEARNABLE rule (next = cur + 1 mod vocab): the teacher becomes
        # sharply deterministic, so a successfully distilled draft can
        # match its argmax and acceptance has headroom to rise.
        starts = jax.random.randint(jax.random.PRNGKey(0), (8, 1), 0, vocab)
        data = (starts + jnp.arange(24)) % vocab
        tparams = teacher.init(jax.random.PRNGKey(1), data)
        opt = training.adam(5e-3)
        st = opt.init(tparams)

        @jax.jit
        def tstep(p, s):
            loss, g = jax.value_and_grad(
                lambda p: teacher.loss(p, data))(p)
            u, s = opt.update(g, s, p)
            return training.apply_updates(p, u), s, loss

        for _ in range(60):
            tparams, st, _ = tstep(tparams, st)

        dcfg = models.GPTConfig(vocab_size=vocab, d_model=16, num_heads=2,
                                num_layers=1, hidden_units=32, max_len=64)
        draft = models.GPT(dcfg)
        dparams = draft.init(jax.random.PRNGKey(2), data)

        prompt = data[:1, :6]

        def acceptance(dp):
            _, (acc, rounds) = models.speculative_generate(
                teacher, tparams, draft, dp, prompt, steps=16, gamma=4,
                return_stats=True)
            return float(acc) / (float(rounds) * 4)

        before = acceptance(dparams)

        dopt = training.adam(5e-3)
        ds = dopt.init(dparams)

        @jax.jit
        def dstep(dp, s):
            loss, g = jax.value_and_grad(
                lambda dp: training.distill_gpt_loss(
                    draft, dp, teacher, tparams, data))(dp)
            u, s = dopt.update(g, s, dp)
            return training.apply_updates(dp, u), s, loss

        losses = []
        for _ in range(80):
            dparams, ds, loss = dstep(dparams, ds)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        after = acceptance(dparams)
        assert after > before + 0.3, (before, after)

    def test_hard_label_mixing(self):
        s = jnp.asarray(rand(2, 5, 9, rng=rng))
        t = jnp.asarray(rand(2, 5, 9, rng=rng))
        labels = jnp.asarray(rng.integers(0, 9, (2, 5)))
        pure_kd = training.distill_loss(s, t, alpha=1.0)
        pure_ce = training.distill_loss(s, t, alpha=0.0, labels=labels)
        mixed = training.distill_loss(s, t, alpha=0.3, labels=labels)
        want_ce = float(jnp.mean(
            ops.softmax_cross_entropy_with_integer_labels(s, labels)))
        assert abs(float(pure_ce) - want_ce) < 1e-5
        assert abs(float(mixed) - (0.3 * float(pure_kd)
                                   + 0.7 * want_ce)) < 1e-5

    def test_temperature_scaling(self):
        s = jnp.asarray(rand(4, 8, rng=rng))
        t = jnp.asarray(rand(4, 8, rng=rng))
        # T^2 * KL(s/T, t/T) with T -> large goes to ~0 slope region but
        # must stay finite and nonnegative.
        for T in (0.5, 1.0, 4.0):
            v = float(training.distill_loss(s, t, temperature=T))
            assert np.isfinite(v) and v >= 0

    def test_teacher_gets_no_gradient(self):
        s = jnp.asarray(rand(3, 7, rng=rng))
        t = jnp.asarray(rand(3, 7, rng=rng))
        gt = jax.grad(lambda t: training.distill_loss(s, t))(t)
        np.testing.assert_allclose(np.asarray(gt), 0.0, atol=1e-9)
