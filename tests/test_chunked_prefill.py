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
