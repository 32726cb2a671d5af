"""Sequence forking (prefix caching): refcounted page sharing."""

import numpy as np

import jax
import jax.numpy as jnp

from np_modeling_tpu import models
from np_modeling_tpu.serving import GenerationEngine

rng = np.random.default_rng(3)


def _gpt():
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=96)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return gpt, params


def test_forked_child_continues_exactly():
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, 11)     # partial tail page (11 % 8 != 0)

    ref = GenerationEngine(gpt, params, total_pages=64, page_size=8)
    want = [ref.add_request(0, prompt)]
    for _ in range(12):
        want.append(ref.step()[0])

    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           max_seqs=4)
    got_parent = [eng.add_request(0, prompt)]
    eng.fork(0, 1)
    # Parent and child decode together; both must reproduce the reference.
    got_child = [got_parent[0]]
    for _ in range(12):
        d = eng.step()
        got_parent.append(d[0])
        got_child.append(d[1])
    assert got_parent == want
    assert got_child == want


def test_fork_at_page_boundary():
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, 16)     # exactly two full pages (ps=8)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           max_seqs=4)
    free0 = eng.free_pages
    t0 = eng.add_request(0, prompt)
    after_prefill = eng.free_pages
    eng.fork(0, 1)
    # Boundary fork shares everything: zero new pages.
    assert eng.free_pages == after_prefill
    d = eng.step()
    assert d[0] == d[1]                  # greedy twins
    eng.finish(0)
    eng.finish(1)
    assert eng.free_pages == free0
    del t0


def test_fork_shares_pages_and_refcounts():
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, 11)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           max_seqs=4)
    free0 = eng.free_pages
    eng.add_request(0, prompt)
    used_prefill = free0 - eng.free_pages            # 2 pages (11 tokens)
    assert used_prefill == 2
    eng.fork(0, 1)
    # Fork costs exactly ONE page (the copied partial tail).
    assert free0 - eng.free_pages == used_prefill + 1
    # Finishing the parent keeps the shared page alive for the child.
    eng.finish(0)
    assert eng.free_pages == free0 - 2   # child holds shared full + its tail
    eng.finish(1)
    assert eng.free_pages == free0


def test_fork_divergence_under_sampling():
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, 9)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           max_seqs=4, temperature=1.0, seed=5)
    eng.add_request(0, prompt)
    eng.fork(0, 1)
    streams = {0: [], 1: []}
    for _ in range(8):
        d = eng.step()
        streams[0].append(d[0])
        streams[1].append(d[1])
    # Same in-graph key per step -> per-slot categorical draws still differ
    # because sampling is vectorized over slots; both streams are valid ids.
    for s in streams.values():
        assert all(0 <= t < 64 for t in s)


def test_fork_with_speculative_lane():
    gpt, params = _gpt()
    dcfg = models.GPTConfig(vocab_size=64, d_model=16, num_heads=2,
                            num_layers=1, hidden_units=32, max_len=96)
    draft = models.GPT(dcfg)
    dparams = draft.init(jax.random.PRNGKey(7), jnp.zeros((1, 8), jnp.int32))
    prompt = rng.integers(0, 64, 10)

    ref = GenerationEngine(gpt, params, total_pages=64, page_size=8)
    want = [ref.add_request(0, prompt)]
    for _ in range(10):
        want.append(ref.step()[0])

    eng = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                           max_seqs=4, draft_gpt=draft,
                           draft_params=dparams)
    first = eng.add_request(0, prompt)
    eng.fork(0, 1)
    got = {0: [first], 1: [first]}
    while len(got[1]) < len(want):
        d = eng.step_speculative(2)
        got[0].extend(d[0])
        got[1].extend(d[1])
    for sid in (0, 1):
        assert got[sid][:len(want)] == want, sid
