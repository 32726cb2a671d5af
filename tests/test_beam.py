"""Beam search vs an exhaustive-search oracle.

With beam width >= vocab**(steps-1), beam search keeps every prefix alive
and IS exhaustive search — so its best hypothesis must equal the argmax
over all vocab**steps continuations scored by the full forward pass."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models

V = 5


@pytest.fixture(scope="module")
def tiny():
    cfg = models.GPTConfig(vocab_size=V, d_model=16, num_heads=2,
                           num_layers=1, hidden_units=32, max_len=32)
    gpt = models.GPT(cfg)
    toks = jnp.zeros((1, 4), jnp.int32)
    params = gpt.init(jax.random.PRNGKey(0), toks)
    return gpt, params


def _exhaustive_best(gpt, params, prompt, steps):
    """Brute force: score every continuation with one batched forward."""
    conts = np.array(list(itertools.product(range(V), repeat=steps)))
    full = np.concatenate(
        [np.repeat(np.asarray(prompt), len(conts), 0), conts], axis=1)
    logits = np.asarray(gpt.apply(params, jnp.asarray(full)))
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    plen = prompt.shape[1]
    total = np.zeros(len(conts))
    for i in range(steps):
        total += np.asarray(logp)[np.arange(len(conts)), plen - 1 + i,
                                  conts[:, i]]
    best = np.argmax(total)
    return conts[best], total[best]


def test_beam_equals_exhaustive(tiny):
    gpt, params = tiny
    prompt = jnp.asarray([[1, 3, 0, 2]], jnp.int32)
    steps = 3
    want_seq, want_score = _exhaustive_best(gpt, params, prompt, steps)
    # beam >= V**(steps-1) = 25 makes beam search exhaustive.
    seqs, scores = models.beam_search(gpt, params, prompt, steps,
                                      beam_size=V ** (steps - 1))
    np.testing.assert_array_equal(np.asarray(seqs)[0, 0], want_seq)
    np.testing.assert_allclose(float(scores[0, 0]), want_score, rtol=1e-4)


def test_beam1_equals_greedy(tiny):
    gpt, params = tiny
    prompt = jnp.asarray([[2, 0, 1]], jnp.int32)
    want = np.asarray(gpt.generate(params, prompt, steps=6))
    seqs, _ = models.beam_search(gpt, params, prompt, steps=6, beam_size=1)
    np.testing.assert_array_equal(np.asarray(seqs)[0, 0], want[0])


def test_beam_scores_are_true_logprobs(tiny):
    """Each returned score equals the full forward pass's sum log-prob."""
    gpt, params = tiny
    prompt = jnp.asarray([[0, 4, 2, 2]], jnp.int32)
    steps, beam = 4, 3
    seqs, scores = models.beam_search(gpt, params, prompt, steps, beam)
    for j in range(beam):
        cont = np.asarray(seqs)[0, j]
        full = jnp.concatenate([prompt, jnp.asarray(cont)[None]], axis=1)
        logp = jax.nn.log_softmax(gpt.apply(params, full), axis=-1)
        tot = sum(float(logp[0, prompt.shape[1] - 1 + i, cont[i]])
                  for i in range(steps))
        assert abs(float(scores[0, j]) - tot) < 1e-4
    # Sorted best-first.
    s = np.asarray(scores)[0]
    assert (np.diff(s) <= 1e-6).all()


def test_batched_beam_matches_single(tiny):
    gpt, params = tiny
    p1 = jnp.asarray([[1, 2, 3]], jnp.int32)
    p2 = jnp.asarray([[4, 0, 0]], jnp.int32)
    both = jnp.concatenate([p1, p2], axis=0)
    sb, scb = models.beam_search(gpt, params, both, steps=3, beam_size=4)
    s1, sc1 = models.beam_search(gpt, params, p1, steps=3, beam_size=4)
    s2, sc2 = models.beam_search(gpt, params, p2, steps=3, beam_size=4)
    np.testing.assert_array_equal(np.asarray(sb)[0], np.asarray(s1)[0])
    np.testing.assert_array_equal(np.asarray(sb)[1], np.asarray(s2)[0])
    np.testing.assert_allclose(np.asarray(scb),
                               np.concatenate([sc1, sc2]), rtol=1e-5)


def test_eos_freezes_hypothesis(tiny):
    gpt, params = tiny
    prompt = jnp.asarray([[1, 1, 2]], jnp.int32)
    eos = 3
    seqs, scores = models.beam_search(gpt, params, prompt, steps=6,
                                      beam_size=4, eos_id=eos, alpha=0.6)
    seqs = np.asarray(seqs)[0]
    for row in seqs:
        hit = np.where(row == eos)[0]
        if hit.size:  # after the first EOS, only EOS (frozen hypothesis)
            assert (row[hit[0]:] == eos).all()
    assert np.isfinite(np.asarray(scores)).all()


def test_scan_layers_beam_matches_loop_layout():
    """Stacked (scan_layers) caches tile/gather on axis 1: results equal
    the same weights run through the loop-layout model."""
    cfg = models.GPTConfig(vocab_size=V, d_model=16, num_heads=2,
                           num_layers=2, hidden_units=32, max_len=32)
    gpt = models.GPT(cfg)
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    params = gpt.init(jax.random.PRNGKey(0), prompt)
    want_s, want_sc = models.beam_search(gpt, params, prompt, steps=4,
                                         beam_size=3)

    scfg = models.GPTConfig(vocab_size=V, d_model=16, num_heads=2,
                            num_layers=2, hidden_units=32, max_len=32,
                            scan_layers=True)
    sgpt = models.GPT(scfg)
    # Stack the loop-layout params into the scan layout.
    stacked = dict(params)
    stacked["layers"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[params[f"layer_{i}"] for i in range(2)])
    del stacked["layer_0"], stacked["layer_1"]
    got_s, got_sc = models.beam_search(sgpt, stacked, prompt, steps=4,
                                       beam_size=3)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))
    np.testing.assert_allclose(np.asarray(got_sc), np.asarray(want_sc),
                               rtol=1e-5, atol=1e-6)
