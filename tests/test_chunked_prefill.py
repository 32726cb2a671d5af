"""Chunked (paged) prefill: token-exact vs the dense collect_kv prefill."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models
from np_modeling_tpu.serving import GenerationEngine

rng = np.random.default_rng(5)


def _gpt(**kw):
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=128, **kw)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return gpt, params


@pytest.mark.parametrize("plen,chunk", [(13, 8), (16, 8), (21, 32), (7, 4)])
def test_chunked_prefill_token_exact(plen, chunk):
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, plen)
    dense = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                         prefill_chunk_size=None)
    want = [dense.add_request(0, prompt)]
    for _ in range(6):
        want.append(dense.step()[0])

    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           prefill_chunk_size=chunk)
    got = [eng.add_request(0, prompt)]
    for _ in range(6):
        got.append(eng.step()[0])
    assert got == want


def test_chunked_prefill_does_not_disturb_live_sequences():
    """A chunked prefill joining mid-stream must not touch other slots'
    pages (only the new slot is active during the chunk forwards)."""
    gpt, params = _gpt()
    p1 = rng.integers(0, 64, 10)
    p2 = rng.integers(0, 64, 19)

    solo = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                            prefill_chunk_size=None)
    ref1 = [solo.add_request(0, p1)] + [solo.step()[0] for _ in range(8)]

    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           prefill_chunk_size=8)
    got1 = [eng.add_request(0, p1)]
    for _ in range(3):
        got1.append(eng.step()[0])
    eng.add_request(1, p2)              # chunked prefill mid-stream
    for _ in range(5):
        got1.append(eng.step()[0])
    assert got1 == ref1


def test_chunked_prefill_rope_window_gqa():
    gpt, params = _gpt(positional="rope", attention_window=8,
                       num_kv_heads=2)
    prompt = rng.integers(0, 64, 17)
    dense = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                         prefill_chunk_size=None)
    want = [dense.add_request(0, prompt)] + [dense.step()[0]
                                             for _ in range(5)]
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           prefill_chunk_size=8)
    got = [eng.add_request(0, prompt)] + [eng.step()[0] for _ in range(5)]
    assert got == want


def test_chunked_prefill_with_speculative_lane():
    gpt, params = _gpt()
    dcfg = models.GPTConfig(vocab_size=64, d_model=16, num_heads=2,
                            num_layers=1, hidden_units=32, max_len=128)
    draft = models.GPT(dcfg)
    dparams = draft.init(jax.random.PRNGKey(3), jnp.zeros((1, 8), jnp.int32))
    prompt = rng.integers(0, 64, 12)

    dense = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                         prefill_chunk_size=None)
    want = [dense.add_request(0, prompt)] + [dense.step()[0]
                                             for _ in range(8)]
    eng = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                           draft_gpt=draft, draft_params=dparams,
                           prefill_chunk_size=8)
    got = [eng.add_request(0, prompt)]
    while len(got) < len(want):
        got.extend(eng.step_speculative(2)[0])
    assert got[:len(want)] == want


def test_batched_chunked_prefill_token_exact():
    """add_requests: three prompts of different lengths prefill through
    batched [B, chunk] chunk forwards; every stream must equal its
    dense-prefill reference."""
    gpt, params = _gpt()
    prompts = {0: rng.integers(0, 64, 13), 1: rng.integers(0, 64, 21),
               2: rng.integers(0, 64, 6)}
    refs = {}
    for sid, p in prompts.items():
        e = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                             prefill_chunk_size=None)
        refs[sid] = [e.add_request(0, p)] + [e.step()[0] for _ in range(6)]

    eng = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                           prefill_chunk_size=8)
    first = eng.add_requests(prompts)
    got = {sid: [first[sid]] for sid in prompts}
    for _ in range(6):
        toks = eng.step()
        for sid in prompts:
            got[sid].append(toks[sid])
    assert got == refs


def test_batched_prefill_joins_live_engine():
    """A batch joining mid-stream must not disturb live sequences, and the
    compiled chunk fn is reused per (chunk, B)."""
    gpt, params = _gpt()
    p0 = rng.integers(0, 64, 10)
    batch = {5: rng.integers(0, 64, 9), 6: rng.integers(0, 64, 15)}
    solo = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                            prefill_chunk_size=None)
    ref0 = [solo.add_request(0, p0)] + [solo.step()[0] for _ in range(8)]

    eng = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                           prefill_chunk_size=8)
    got0 = [eng.add_request(0, p0)]
    for _ in range(3):
        got0.append(eng.step()[0])
    eng.add_requests(batch)
    for _ in range(5):
        got0.append(eng.step()[0])
    assert got0 == ref0
    assert sorted(eng.live) == [0, 5, 6]


def test_chunked_prefill_moe_nodrop_token_exact():
    """NO-DROP MoE routing is per-token independent, so chunked prefill
    must be token-exact vs the dense prefill (the engine only chunks MoE
    when moe_capacity_factor=None)."""
    gpt, params = _gpt(moe_experts=4, moe_capacity_factor=None)
    prompt = rng.integers(0, 64, 17)
    dense = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                             prefill_chunk_size=None)
    want = [dense.add_request(0, prompt)] + [dense.step()[0]
                                             for _ in range(6)]
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           prefill_chunk_size=8)
    got = [eng.add_request(0, prompt)] + [eng.step()[0] for _ in range(6)]
    assert got == want


def test_capacity_moe_still_uses_dense_prefill():
    """Capacity-limited MoE routing is population-coupled: the engine must
    fall back to the dense prefill even when chunking is requested (and
    stay token-exact)."""
    gpt, params = _gpt(moe_experts=4)     # default capacity factor
    prompt = rng.integers(0, 64, 13)
    dense = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                             prefill_chunk_size=None)
    want = [dense.add_request(0, prompt)] + [dense.step()[0]
                                             for _ in range(4)]
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           prefill_chunk_size=8)
    got = [eng.add_request(0, prompt)] + [eng.step()[0] for _ in range(4)]
    assert got == want


def test_everything_at_once_serving():
    """All serving features in ONE engine: windowed GQA+RoPE model, bf16
    KV pages, chunked prefill, fork, speculative draft lane, window page
    reclamation, mid-stream join/finish — greedy streams must equal the
    plain per-sequence reference."""
    gpt, params = _gpt(positional="rope", attention_window=12,
                       num_kv_heads=2)
    dcfg = models.GPTConfig(vocab_size=64, d_model=16, num_heads=2,
                            num_layers=1, hidden_units=32, max_len=128,
                            positional="rope", attention_window=12)
    draft = models.GPT(dcfg)
    dparams = draft.init(jax.random.PRNGKey(9), jnp.zeros((1, 8), jnp.int32))
    p1 = rng.integers(0, 64, 21)
    p2 = rng.integers(0, 64, 9)

    def reference(prompt, n):
        e = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                             prefill_chunk_size=None)
        out = [e.add_request(0, prompt)]
        for _ in range(n):
            out.append(e.step()[0])
        return out

    ref1, ref2 = reference(p1, 16), reference(p2, 16)

    eng = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                           max_seqs=6, kv_dtype=None,
                           draft_gpt=draft, draft_params=dparams,
                           prefill_chunk_size=8)
    f0, d0 = eng.free_pages, len(eng._dfree)
    got = {0: [eng.add_request(0, p1)]}
    got[0].extend(eng.step_speculative(2)[0])
    got[1] = [eng.add_request(1, p2)]            # chunked join mid-stream
    eng.fork(0, 2)
    got[2] = list(got[0])
    while min(len(v) for v in got.values()) < 17:
        d = eng.step_speculative_many(2, gamma=2)
        for sid in (0, 1, 2):
            got[sid].extend(d[sid])
    assert got[0][:17] == ref1[:17]
    assert got[2][:17] == ref1[:17]              # forked twin
    assert got[1][:17] == ref2[:17]
    for sid in (0, 1, 2):
        eng.finish(sid)
    assert eng.free_pages == f0 and len(eng._dfree) == d0
