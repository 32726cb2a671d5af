"""Automatic prefix caching: content-addressed KV-page reuse across
requests. Correctness bar is TOKEN-EXACT greedy decode vs a cache-off
engine (shared pages hold bit-identical K/V — they are literally the
earlier request's pages), plus page-accounting and LRU-eviction checks.

Reference lineage: the reference has no serving tier (SURVEY.md §5);
the design follows vLLM-style automatic prefix caching on the engine's
existing refcounted fork/share machinery (serving/engine.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models
from np_modeling_tpu.serving import GenerationEngine
from np_modeling_tpu.serving.kv_cache import OutOfPagesError

rng = np.random.default_rng(1)


def _gpt():
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_kv_heads=2, num_layers=2, hidden_units=64,
                           max_len=64)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.asarray(rng.integers(0, 64, (1, 8))))
    return gpt, params


def _decode(eng, sid, prompt, steps):
    toks = [eng.add_request(sid, jnp.asarray(prompt))]
    toks += eng.step_many(steps)[sid]
    return toks


def test_cache_hit_is_token_exact_and_skips_prefill():
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (13,))
    plain = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                             prefill_chunk_size=4)
    want = _decode(plain, 0, prompt, 5)

    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           prefill_chunk_size=4, enable_prefix_cache=True)
    first = _decode(eng, 0, prompt, 5)
    assert first == want
    eng.finish(0)
    free_before = eng.free_pages
    again = _decode(eng, 1, prompt, 5)
    assert again == want
    st = eng.prefix_cache_stats
    # 13 tokens / ps=4 -> pages 0..2 full; all 3 matched on the second
    # request (cap plen-1=12 -> (12)//4 = 3 pages).
    assert st["hit_tokens"] == 12
    assert st["entries"] == 3
    # Second prefill allocated only the non-matched page.
    assert free_before - eng.free_pages <= 2   # tail page + decode growth


def test_partial_prefix_match():
    """A prompt sharing only the first 2 pages matches exactly those."""
    gpt, params = _gpt()
    p1 = rng.integers(0, 64, (12,))
    p2 = np.concatenate([p1[:8], rng.integers(0, 64, (6,))])
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           prefill_chunk_size=4, enable_prefix_cache=True)
    _decode(eng, 0, p1, 2)
    eng.finish(0)
    hits0 = eng.prefix_cache_stats["hit_tokens"]
    plain = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                             prefill_chunk_size=4)
    want = _decode(plain, 0, p2, 4)
    got = _decode(eng, 1, p2, 4)
    assert got == want
    assert eng.prefix_cache_stats["hit_tokens"] - hits0 == 8


def test_live_sharing_and_batch():
    """The cache matches against a STILL-LIVE request's pages, and batched
    add_requests rows match independently."""
    gpt, params = _gpt()
    p1 = rng.integers(0, 64, (9,))
    p2 = np.concatenate([p1[:4], rng.integers(0, 64, (7,))])
    plain = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                             prefill_chunk_size=4)
    w1 = _decode(plain, 0, p1, 4)
    plain2 = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                              prefill_chunk_size=4)
    w2 = _decode(plain2, 0, p2, 4)

    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=4, prefill_chunk_size=4,
                           enable_prefix_cache=True)
    g1 = [eng.add_request(0, jnp.asarray(p1))]      # populates the cache
    firsts = eng.add_requests({1: jnp.asarray(p1), 2: jnp.asarray(p2)})
    g1b, g2 = [firsts[1]], [firsts[2]]
    outs = eng.step_many(4)
    g1 += outs[0][:4]
    g1b += outs[1]
    g2 += outs[2]
    assert g1 == w1 and g1b == w1 and g2 == w2
    # Row 1 matched 2 pages (cap 8 tokens), row 2 matched 1 page.
    assert eng.prefix_cache_stats["hit_tokens"] == 8 + 4


def test_lru_eviction_under_pressure():
    """When the free list runs short, LRU cache entries are evicted and
    serving continues (token-exact, no OutOfPagesError)."""
    gpt, params = _gpt()
    eng = GenerationEngine(gpt, params, total_pages=12, page_size=4,
                           max_seqs=2, prefill_chunk_size=4,
                           enable_prefix_cache=True)
    prompts = [rng.integers(0, 64, (10,)) for _ in range(4)]
    wants = []
    for p in prompts:
        plain = GenerationEngine(gpt, params, total_pages=12, page_size=4,
                                 prefill_chunk_size=4)
        wants.append(_decode(plain, 0, p, 3))
    for i, p in enumerate(prompts):    # far more cached pages than fit
        assert _decode(eng, i, p, 3) == wants[i]
        eng.finish(i)
    assert eng.prefix_cache_stats["entries"] <= 12


def test_page_aligned_prompt_keeps_one_suffix_token():
    """plen a page multiple: the match is capped at (plen-1)//ps pages so
    at least one token prefills (the first-token logits source)."""
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (8,))                 # exactly 2 pages
    plain = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                             prefill_chunk_size=4)
    want = _decode(plain, 0, prompt, 4)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           prefill_chunk_size=4, enable_prefix_cache=True)
    _decode(eng, 0, prompt, 4)
    eng.finish(0)
    assert _decode(eng, 1, prompt, 4) == want
    assert eng.prefix_cache_stats["hit_tokens"] == 4   # 1 page, not 2


def test_adapter_keyed_no_cross_match():
    """The same prompt under different LoRA adapters must NOT share pages
    (K/V depend on the adapter)."""
    from np_modeling_tpu.training.lora import ATTENTION_TARGETS, lora_init
    gpt, params = _gpt()
    ad = lora_init(jax.random.PRNGKey(7), params, rank=2,
                   match=ATTENTION_TARGETS)
    # Non-zero B so the adapter actually changes K/V.
    ad = jax.tree.map(lambda x: jnp.ones_like(x) * 0.05, ad)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=4, prefill_chunk_size=4,
                           enable_prefix_cache=True,
                           lora_adapters={"a": ad})
    prompt = rng.integers(0, 64, (10,))
    eng.add_request(0, jnp.asarray(prompt))            # base model
    eng.finish(0)
    eng.add_request(1, jnp.asarray(prompt), adapter="a")
    assert eng.prefix_cache_stats["hit_tokens"] == 0   # keyed by adapter
    eng.finish(1)
    eng.add_request(2, jnp.asarray(prompt), adapter="a")
    assert eng.prefix_cache_stats["hit_tokens"] == 8   # same-adapter hit


def test_fork_composes_with_cache():
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (9,))
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=4, prefill_chunk_size=4,
                           enable_prefix_cache=True)
    eng.add_request(0, jnp.asarray(prompt))
    eng.fork(0, 1)
    out = eng.step()
    assert out[0] == out[1]
    eng.finish(0)
    eng.finish(1)
    # Cached pages survive BOTH owners leaving; a third request hits.
    eng.add_request(2, jnp.asarray(prompt))
    assert eng.prefix_cache_stats["hit_tokens"] == 8


def test_requires_chunked_prefill():
    gpt, params = _gpt()
    with pytest.raises(AssertionError, match="CHUNKED"):
        GenerationEngine(gpt, params, enable_prefix_cache=True,
                         prefill_chunk_size=None)
