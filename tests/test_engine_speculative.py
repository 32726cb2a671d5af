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
