"""Encoder-decoder model: training decreases loss; cached decode == uncached."""

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import models, training
from np_modeling_tpu.utils.testing import assert_allclose

rng = np.random.default_rng(0)


def _model():
    cfg = models.Seq2SeqConfig(vocab_size=50, d_model=32, num_heads=4,
                               num_encoder_layers=2, num_decoder_layers=2,
                               hidden_units=64, max_len=24)
    return models.Seq2SeqTransformer(cfg)


def test_train_step_decreases_loss():
    m = _model()
    src = jnp.asarray(rng.integers(0, 50, (4, 10)))
    tgt = jnp.asarray(rng.integers(0, 50, (4, 12)))
    params = m.init(jax.random.PRNGKey(0), src, tgt[..., :-1])
    opt = training.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda p: m.loss(p, src, tgt))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss

    losses = []
    for _ in range(12):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_cached_greedy_decode_matches_uncached():
    m = _model()
    src = jnp.asarray(rng.integers(0, 50, (2, 8)))
    tgt0 = jnp.asarray(rng.integers(0, 50, (2, 1)))
    params = m.init(jax.random.PRNGKey(1), src, tgt0)

    steps = 6
    bos = 1
    cached = m.greedy_decode(params, src, bos, steps)

    # Uncached greedy: re-run the full decoder each step.
    tok = jnp.full((2, 1), bos, jnp.int32)
    seq = tok
    outs = []
    for _ in range(steps):
        logits = m.apply(params, src, seq)
        nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        outs.append(nxt)
        seq = jnp.concatenate([seq, nxt], axis=1)
    uncached = jnp.concatenate(outs, axis=1)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(uncached))


def test_decoder_causality():
    m = _model()
    src = jnp.asarray(rng.integers(0, 50, (1, 8)))
    tgt = jnp.asarray(rng.integers(0, 50, (1, 10)))
    params = m.init(jax.random.PRNGKey(2), src, tgt)
    l1 = m.apply(params, src, tgt)
    tgt2 = tgt.at[0, -1].set((tgt[0, -1] + 3) % 50)
    l2 = m.apply(params, src, tgt2)
    assert_allclose(l1[:, :-1], l2[:, :-1], rtol=0, atol=0)


class TestPaddedSource:
    def test_src_valid_isolates_padding(self):
        """Padded source batches (src_valid) must produce the same logits
        and greedy decode as the unpadded source."""
        from np_modeling_tpu import models
        cfg = models.Seq2SeqConfig(vocab_size=40, d_model=32, num_heads=4,
                                   num_encoder_layers=1,
                                   num_decoder_layers=1, hidden_units=32,
                                   max_len=16)
        s2s = models.Seq2SeqTransformer(cfg)
        src = jnp.asarray(rng.integers(0, 40, (1, 6)))
        tgt = jnp.asarray(rng.integers(0, 40, (1, 5)))
        params = s2s.init(jax.random.PRNGKey(0), src, tgt)
        ref = s2s.apply(params, src, tgt)
        ref_dec = s2s.greedy_decode(params, src, bos_token=1, steps=4)

        padded = jnp.concatenate([src, jnp.full((1, 4), 7, jnp.int32)], 1)
        valid = jnp.asarray([[1] * 6 + [0] * 4], jnp.int32)
        out = s2s.apply(params, padded, tgt, src_valid=valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        dec = s2s.greedy_decode(params, padded, bos_token=1, steps=4,
                                src_valid=valid)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(ref_dec))
        # Junk tokens must not influence anything.
        padded2 = padded.at[:, 6:].set(21)
        out2 = s2s.apply(params, padded2, tgt, src_valid=valid)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
