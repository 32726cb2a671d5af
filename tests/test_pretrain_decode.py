"""BERT masked-LM pretraining head/objective + seq2seq beam decoding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, training

rng = np.random.default_rng(0)


# ---------------------------------------------------------------------------
# BERT MLM
# ---------------------------------------------------------------------------

MASK = 59


def _bert():
    cfg = models.BertConfig(vocab_size=60, d_model=32, num_heads=4,
                            num_layers=2, hidden_units=64, max_len=24,
                            mlm_head=True)
    return models.BertEncoder(cfg)


def test_mlm_mask_tokens_statistics():
    key = jax.random.PRNGKey(0)
    tokens = jnp.asarray(rng.integers(0, 58, (64, 128)))
    inputs, labels, weights = models.mlm_mask_tokens(
        key, tokens, vocab_size=60, mask_token=MASK, mask_rate=0.15,
        special_tokens=(0,))
    inputs, labels, weights = map(np.asarray, (inputs, labels, weights))
    np.testing.assert_array_equal(labels, np.asarray(tokens))
    # Unselected positions pass through untouched.
    np.testing.assert_array_equal(inputs[weights == 0],
                                  np.asarray(tokens)[weights == 0])
    rate = weights.mean()
    assert 0.12 < rate < 0.18
    sel_inputs = inputs[weights == 1]
    frac_mask = (sel_inputs == MASK).mean()
    assert 0.75 < frac_mask < 0.85          # ~80% become [MASK]
    # Special token (0) is never selected.
    assert (np.asarray(tokens)[weights == 1] != 0).all()


def test_mlm_training_decreases_loss_and_predicts():
    bert = _bert()
    tokens = jnp.asarray(rng.integers(1, 58, (8, 16)))
    params = bert.init(jax.random.PRNGKey(1), tokens)
    inputs, labels, weights = models.mlm_mask_tokens(
        jax.random.PRNGKey(2), tokens, 60, MASK)
    opt = training.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda p: bert.mlm_loss(p, inputs, labels, weights))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss

    losses = []
    for _ in range(40):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 1.0, (losses[0], losses[-1])
    # After overfitting this tiny batch, masked positions are recovered.
    preds = np.asarray(jnp.argmax(bert.mlm_logits(params, inputs), -1))
    w = np.asarray(weights)
    acc = (preds[w == 1] == np.asarray(labels)[w == 1]).mean()
    assert acc > 0.5


def test_mlm_loss_only_counts_masked_positions():
    bert = _bert()
    tokens = jnp.asarray(rng.integers(1, 58, (2, 8)))
    params = bert.init(jax.random.PRNGKey(3), tokens)
    w1 = jnp.zeros((2, 8), jnp.int32).at[:, 0].set(1)
    l1 = bert.mlm_loss(params, tokens, tokens, w1)
    # Changing labels at UNWEIGHTED positions must not change the loss.
    other = (tokens + 7) % 58
    labels2 = tokens.at[:, 1:].set(other[:, 1:])
    l2 = bert.mlm_loss(params, tokens, labels2, w1)
    assert abs(float(l1) - float(l2)) < 1e-6


# ---------------------------------------------------------------------------
# Seq2seq beam decode
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def s2s():
    cfg = models.Seq2SeqConfig(vocab_size=40, d_model=32, num_heads=4,
                               num_encoder_layers=1, num_decoder_layers=2,
                               hidden_units=64, max_len=24)
    m = models.Seq2SeqTransformer(cfg)
    src = jnp.asarray(rng.integers(0, 40, (2, 8)))
    params = m.init(jax.random.PRNGKey(4), src, src[:, :1])
    return m, params, src


def test_beam1_equals_greedy(s2s):
    m, params, src = s2s
    want = np.asarray(m.greedy_decode(params, src, bos_token=1, steps=6))
    seqs, _ = m.beam_decode(params, src, bos_token=1, steps=6, beam_size=1)
    np.testing.assert_array_equal(np.asarray(seqs)[:, 0], want)


def test_beam_scores_are_true_logprobs(s2s):
    m, params, src = s2s
    steps, beam = 4, 3
    seqs, scores = m.beam_decode(params, src, bos_token=1, steps=steps,
                                 beam_size=beam)
    seqs, scores = np.asarray(seqs), np.asarray(scores)
    for b in range(2):
        for j in range(beam):
            tgt_in = np.concatenate([[1], seqs[b, j]])[None]  # bos + cont
            logits = m.apply(params, src[b:b + 1],
                             jnp.asarray(tgt_in, jnp.int32))
            logp = jax.nn.log_softmax(logits, axis=-1)
            tot = sum(float(logp[0, i, seqs[b, j, i]])
                      for i in range(steps))
            assert abs(scores[b, j] - tot) < 1e-4
        assert (np.diff(scores[b]) <= 1e-6).all()


def test_beam_decode_respects_src_padding(s2s):
    """Padded source + src_valid gives the same beams as the unpadded src."""
    m, params, src = s2s
    pad = jnp.full((2, 4), 7, jnp.int32)       # arbitrary junk ids
    src_padded = jnp.concatenate([src, pad], axis=1)
    valid = jnp.concatenate([jnp.ones_like(src),
                             jnp.zeros_like(pad)], axis=1)
    s_ref, sc_ref = m.beam_decode(params, src, 1, steps=5, beam_size=3)
    s_pad, sc_pad = m.beam_decode(params, src_padded, 1, steps=5,
                                  beam_size=3, src_valid=valid)
    np.testing.assert_array_equal(np.asarray(s_pad), np.asarray(s_ref))
    np.testing.assert_allclose(np.asarray(sc_pad), np.asarray(sc_ref),
                               rtol=1e-4, atol=1e-5)
