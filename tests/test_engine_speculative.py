"""Speculative decoding in the continuous-batching engine.

Correctness bar: step_speculative's emitted stream is TOKEN-EXACT vs the
plain greedy engine (and vs gpt.generate), for any draft — the verification
pass is entirely target-side, so draft quality only moves the acceptance
rate, never the tokens."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models
from np_modeling_tpu.serving import GenerationEngine

rng = np.random.default_rng(7)


def _models(vocab=64, kv_heads=2):
    cfg = models.GPTConfig(vocab_size=vocab, d_model=32, num_heads=4,
                           num_kv_heads=kv_heads, num_layers=2,
                           hidden_units=64, max_len=96)
    gpt = models.GPT(cfg)
    toks = jnp.zeros((1, 8), jnp.int32)
    params = gpt.init(jax.random.PRNGKey(0), toks)
    dcfg = models.GPTConfig(vocab_size=vocab, d_model=16, num_heads=2,
                            num_layers=1, hidden_units=32, max_len=96)
    draft = models.GPT(dcfg)
    dparams = draft.init(jax.random.PRNGKey(9), toks)
    return gpt, params, draft, dparams


def _collect(d, out, seq_id):
    out.setdefault(seq_id, []).extend(d.get(seq_id, []))


@pytest.fixture(scope="module")
def stack():
    return _models()


def test_speculative_token_exact_vs_plain_engine(stack):
    gpt, params, draft, dparams = stack
    prompt = rng.integers(0, 64, 10)

    plain = GenerationEngine(gpt, params, total_pages=64, page_size=8)
    t0 = plain.add_request(0, prompt)
    want = [t0]
    for _ in range(18):
        want.append(plain.step()[0])

    spec = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                            draft_gpt=draft, draft_params=dparams)
    s0 = spec.add_request(0, prompt)
    got = [s0]
    while len(got) < len(want):
        got.extend(spec.step_speculative(gamma=3)[0])
    assert got[:len(want)] == want


def test_self_draft_accepts_everything(stack):
    gpt, params, _, _ = stack
    prompt = rng.integers(0, 64, 6)
    spec = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                            draft_gpt=gpt, draft_params=params)
    spec.add_request(0, prompt)
    out = spec.step_speculative(gamma=4)
    # Identical draft: every proposal verifies -> gamma+1 tokens committed.
    assert len(out[0]) == 5
    # And they equal the plain engine's stream.
    plain = GenerationEngine(gpt, params, total_pages=64, page_size=8)
    plain.add_request(0, prompt)
    want = [plain.step()[0] for _ in range(5)]
    assert out[0] == want


def test_continuous_batching_speculative_isolated(stack):
    gpt, params, draft, dparams = stack
    p1 = rng.integers(0, 64, 9)
    p2 = rng.integers(0, 64, 5)

    # Solo references.
    ref = {}
    for sid, p in ((0, p1), (1, p2)):
        e = GenerationEngine(gpt, params, total_pages=64, page_size=8)
        ref[sid] = [e.add_request(sid, p)]
        for _ in range(12):
            ref[sid].append(e.step()[sid])

    spec = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                            max_seqs=4, draft_gpt=draft,
                            draft_params=dparams)
    got = {0: [spec.add_request(0, p1)]}
    _collect(spec.step_speculative(2), got, 0)
    got[1] = [spec.add_request(1, p2)]          # join mid-stream
    for _ in range(10):
        d = spec.step_speculative(3)
        _collect(d, got, 0)
        _collect(d, got, 1)
    for sid in (0, 1):
        n = min(len(got[sid]), len(ref[sid]))
        assert n >= 10
        assert got[sid][:n] == ref[sid][:n], sid


def test_mixing_plain_and_speculative_steps_stays_exact(stack):
    """step() between speculative calls desyncs the draft cache (documented:
    acceptance drops) but the emitted stream must stay token-exact."""
    gpt, params, draft, dparams = stack
    prompt = rng.integers(0, 64, 7)
    plain = GenerationEngine(gpt, params, total_pages=64, page_size=8)
    want = [plain.add_request(0, prompt)]
    for _ in range(14):
        want.append(plain.step()[0])

    spec = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                            draft_gpt=draft, draft_params=dparams)
    got = [spec.add_request(0, prompt)]
    got.extend(spec.step_speculative(2)[0])
    got.append(spec.step()[0])                   # plain step in between
    while len(got) < len(want):
        got.extend(spec.step_speculative(3)[0])
    assert got[:len(want)] == want


def test_finish_reclaims_both_lanes(stack):
    gpt, params, draft, dparams = stack
    spec = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                            draft_gpt=draft, draft_params=dparams)
    f0, d0 = spec.free_pages, len(spec._dfree)
    spec.add_request(0, rng.integers(0, 64, 9))
    spec.step_speculative(3)
    assert spec.free_pages < f0 and len(spec._dfree) < d0
    spec.finish(0)
    assert spec.free_pages == f0 and len(spec._dfree) == d0


def test_rope_model_speculative(ignore=None):
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=96,
                           positional="rope")
    gpt = models.GPT(cfg)
    toks = jnp.zeros((1, 8), jnp.int32)
    params = gpt.init(jax.random.PRNGKey(1), toks)
    dcfg = models.GPTConfig(vocab_size=64, d_model=16, num_heads=2,
                            num_layers=1, hidden_units=32, max_len=96,
                            positional="rope")
    draft = models.GPT(dcfg)
    dparams = draft.init(jax.random.PRNGKey(2), toks)
    prompt = rng.integers(0, 64, 8)

    plain = GenerationEngine(gpt, params, total_pages=64, page_size=8)
    want = [plain.add_request(0, prompt)]
    for _ in range(10):
        want.append(plain.step()[0])
    spec = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                            draft_gpt=draft, draft_params=dparams)
    got = [spec.add_request(0, prompt)]
    while len(got) < len(want):
        got.extend(spec.step_speculative(3)[0])
    assert got[:len(want)] == want


def test_step_speculative_many_matches_stepwise(stack):
    gpt, params, draft, dparams = stack
    prompt = rng.integers(0, 64, 8)

    a = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                         draft_gpt=draft, draft_params=dparams)
    got_a = [a.add_request(0, prompt)]
    for _ in range(5):
        got_a.extend(a.step_speculative(3)[0])

    b = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                         draft_gpt=draft, draft_params=dparams)
    got_b = [b.add_request(0, prompt)]
    got_b.extend(b.step_speculative_many(5, gamma=3)[0])
    assert got_a == got_b
    assert b._host_len[0] == len(prompt) + len(got_b) - 1


def test_sampling_self_draft_accepts_everything(stack):
    gpt, params, _, _ = stack
    prompt = rng.integers(0, 64, 6)
    spec = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                            draft_gpt=gpt, draft_params=params,
                            temperature=1.0, seed=3)
    spec.add_request(0, prompt)
    # p_t == p_d -> accept probability 1 -> gamma+1 tokens every round.
    for _ in range(3):
        assert len(spec.step_speculative(gamma=3)[0]) == 4


def test_sampling_distribution_matches_target():
    """Engine speculative sampling reproduces the target's next-token
    distribution (frequency check over repeated fresh rounds)."""
    cfg = models.GPTConfig(vocab_size=13, d_model=16, num_heads=2,
                           num_layers=1, hidden_units=32, max_len=32)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(11), jnp.zeros((1, 4), jnp.int32))
    dcfg = models.GPTConfig(vocab_size=13, d_model=8, num_heads=2,
                            num_layers=1, hidden_units=16, max_len=32)
    draft = models.GPT(dcfg)
    dparams = draft.init(jax.random.PRNGKey(12), jnp.zeros((1, 4),
                                                           jnp.int32))
    prompt = jnp.asarray([1, 2, 3], jnp.int32)

    # True next-token distribution after the FIRST generated token t0
    # (t0 itself is sampled at prefill; condition on the argmax prompt
    # continuation by measuring the distribution of the SECOND token given
    # a fixed first token is fiddly — instead measure the first token
    # emitted by step_speculative, whose context is prompt + t0 where t0
    # varies per trial; so compare against the MIXTURE by simulating the
    # same two-stage process with the dense model).
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8,
                           max_seqs=2, draft_gpt=draft,
                           draft_params=dparams, temperature=1.0, seed=0)
    n = 500
    draws = []
    for i in range(n):
        t0 = eng.add_request(0, prompt)
        tok = eng.step_speculative(gamma=2)[0][0]
        draws.append((t0, tok))
        eng.finish(0)

    # Dense-model mixture oracle: P(t1) = sum_t0 P(t0) P(t1 | prompt,t0).
    logits0 = gpt.apply(params, prompt[None])[0, -1]
    p0 = np.asarray(jax.nn.softmax(logits0))
    p1 = np.zeros(13)
    for t0 in range(13):
        ctx = jnp.concatenate([prompt, jnp.asarray([t0], jnp.int32)])[None]
        lg = gpt.apply(params, ctx)[0, -1]
        p1 += p0[t0] * np.asarray(jax.nn.softmax(lg))
    freq = np.bincount([t for _, t in draws], minlength=13) / n
    np.testing.assert_allclose(freq, p1, atol=0.075)  # ~3.3 sigma at n=500


def test_sampling_topk_distribution_matches_filtered_target():
    """Speculative sampling with top_k reproduces the target's FILTERED
    next-token distribution (mixture oracle over the prefill token)."""
    from np_modeling_tpu.models.transformer_lm import filter_logits
    cfg = models.GPTConfig(vocab_size=13, d_model=16, num_heads=2,
                           num_layers=1, hidden_units=32, max_len=32)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(21), jnp.zeros((1, 4), jnp.int32))
    dcfg = models.GPTConfig(vocab_size=13, d_model=8, num_heads=2,
                            num_layers=1, hidden_units=16, max_len=32)
    draft = models.GPT(dcfg)
    dparams = draft.init(jax.random.PRNGKey(22), jnp.zeros((1, 4),
                                                           jnp.int32))
    prompt = jnp.asarray([4, 5, 6], jnp.int32)
    K = 4

    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8,
                           max_seqs=2, draft_gpt=draft,
                           draft_params=dparams, temperature=1.0, top_k=K,
                           seed=0)
    n = 400
    draws = []
    for _ in range(n):
        t0 = eng.add_request(0, prompt)
        tok = eng.step_speculative(gamma=2)[0][0]
        draws.append((t0, tok))
        eng.finish(0)

    def fprobs(logits):
        return np.asarray(jax.nn.softmax(filter_logits(
            jnp.asarray(logits), top_k=K)))

    logits0 = gpt.apply(params, prompt[None])[0, -1]
    p0 = fprobs(logits0)
    p1 = np.zeros(13)
    for t0 in range(13):
        if p0[t0] == 0:
            continue
        ctx = jnp.concatenate([prompt, jnp.asarray([t0], jnp.int32)])[None]
        p1 += p0[t0] * fprobs(gpt.apply(params, ctx)[0, -1])
    freq = np.bincount([t for _, t in draws], minlength=13) / n
    # Tokens outside every reachable top-K set must never appear.
    assert freq[p1 == 0].sum() == 0
    np.testing.assert_allclose(freq, p1, atol=0.085)


def test_sampling_topk_self_draft_accepts(stack):
    gpt, params, _, _ = stack
    prompt = rng.integers(0, 64, 6)
    spec = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                            draft_gpt=gpt, draft_params=params,
                            temperature=0.8, top_k=8, top_p=0.95, seed=2)
    spec.add_request(0, prompt)
    assert len(spec.step_speculative(gamma=3)[0]) == 4  # identical dists
