"""Prompt-lookup (n-gram) speculative decoding: draft-free speculation
must be TOKEN-EXACT vs plain greedy step() for any proposal quality, and
actually accept >1 token/round when the output repeats its history.

Reference lineage: the reference has no serving tier (SURVEY.md §5);
the scheme is the public "prompt lookup decoding" idea (verify-only
speculation with n-gram proposals from the sequence's own tokens).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models
from np_modeling_tpu.serving import GenerationEngine, SamplingParams

rng = np.random.default_rng(3)


def _gpt():
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_kv_heads=2, num_layers=2, hidden_units=64,
                           max_len=96)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.asarray(rng.integers(0, 64, (1, 8))))
    return gpt, params


def test_lookup_token_exact_vs_step():
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (7,))
    plain = GenerationEngine(gpt, params, total_pages=64, page_size=4)
    want = [plain.add_request(0, jnp.asarray(prompt))]
    want += plain.step_many(14)[0]

    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4)
    got = [eng.add_request(0, jnp.asarray(prompt))]
    rounds = []
    while len(got) < 15:
        r = eng.step_lookup(gamma=4, ngram=3)[0]
        rounds.append(len(r))
        got.extend(r)
    assert got[:15] == want
    # Tiny random GPTs decode into short greedy cycles, so the n-gram
    # proposals MUST start hitting: require at least one multi-token round.
    assert max(rounds) > 1, rounds


def test_lookup_accepts_repeated_prompt_structure():
    """A prompt whose continuation literally repeats earlier prompt text
    (teacher-forced by the verify pass) accepts near-gamma per round."""
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (8,))
    plain = GenerationEngine(gpt, params, total_pages=64, page_size=4)
    want = [plain.add_request(0, jnp.asarray(prompt))]
    want += plain.step_many(9)[0]

    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4)
    got = [eng.add_request(0, jnp.asarray(prompt))]
    total_rounds = 0
    while len(got) < 10:
        got.extend(eng.step_lookup(gamma=5, ngram=2)[0])
        total_rounds += 1
    assert got[:10] == want
    assert total_rounds < 9            # strictly faster than 1 token/round


def test_lookup_continuous_batching():
    gpt, params = _gpt()
    p1 = rng.integers(0, 64, (6,))
    p2 = rng.integers(0, 64, (9,))
    w = {}
    for sid, p in ((0, p1), (1, p2)):
        plain = GenerationEngine(gpt, params, total_pages=64, page_size=4)
        w[sid] = [plain.add_request(0, jnp.asarray(p))]
        w[sid] += plain.step_many(8)[0]

    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=4)
    got = {0: [eng.add_request(0, jnp.asarray(p1))],
           1: [eng.add_request(1, jnp.asarray(p2))]}
    while min(len(v) for v in got.values()) < 9:
        out = eng.step_lookup(gamma=3)
        for sid, toks in out.items():
            got[sid].extend(toks)
    for sid in (0, 1):
        assert got[sid][:9] == w[sid][:9]


def test_lookup_mixes_with_plain_step_and_fork():
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (6,))
    plain = GenerationEngine(gpt, params, total_pages=64, page_size=4)
    want = [plain.add_request(0, jnp.asarray(prompt))]
    want += plain.step_many(10)[0]

    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=4)
    got = [eng.add_request(0, jnp.asarray(prompt))]
    got.append(eng.step()[0])                     # plain
    got.extend(eng.step_lookup(gamma=4)[0])       # lookup
    eng.fork(0, 1)                                # fork mid-stream
    while len(got) < 11:
        out = eng.step_lookup(gamma=4)
        got.extend(out[0])
        assert out[0] == out[1]                   # child tracks parent
    assert got[:11] == want


def test_lookup_rejects_sampling_configs():
    gpt, params = _gpt()
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           temperature=0.7)
    eng.add_request(0, jnp.asarray(rng.integers(0, 64, (4,))))
    with pytest.raises(AssertionError, match="greedy"):
        eng.step_lookup()
    eng2 = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                            sampling=SamplingParams(repetition_penalty=1.2))
    eng2.add_request(0, jnp.asarray(rng.integers(0, 64, (4,))))
    with pytest.raises(AssertionError, match="greedy"):
        eng2.step_lookup()


def test_propose_lookup_mechanics():
    prop = GenerationEngine._propose_lookup
    # rightmost match: [1,2] occurs at 0 and 4; continuation from 4+2=6.
    h = [1, 2, 9, 9, 1, 2, 7, 8, 1, 2]
    np.testing.assert_array_equal(prop(h, 3, 2), [7, 8, 1])
    # no match -> zeros; short history handled.
    np.testing.assert_array_equal(prop([5], 3, 2), [0, 0, 0])
    # gram backoff: ngram=3 has no match, 1-gram does.
    h2 = [4, 6, 3, 6]
    np.testing.assert_array_equal(prop(h2, 2, 3), [3, 6])
