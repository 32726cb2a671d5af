"""Multi-LoRA serving: per-slot adapters in one batched decode dispatch.

Oracle: a per-adapter DENSE engine whose params are lora_finalize(base,
adapter) — the engine's factored per-slot deltas must reproduce its greedy
token stream exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, training
from np_modeling_tpu.serving import GenerationEngine
from np_modeling_tpu.training.lora import (ATTENTION_TARGETS, lora_init,
                                           lora_finalize)

rng = np.random.default_rng(11)


def _gpt(**kw):
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=128, **kw)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return gpt, params


def _random_adapter(key, params, rank=4):
    """lora_init gives B=0 (identity adapter) — randomize B so the adapter
    actually changes the model."""
    ad = lora_init(key, params, rank, ATTENTION_TARGETS)
    for i, (path, pair) in enumerate(sorted(ad.items())):
        k = jax.random.fold_in(key, 1000 + i)
        pair["b"] = 0.3 * jax.random.normal(k, pair["b"].shape, jnp.float32)
    return ad


def _reference_stream(gpt, merged, prompt, n):
    eng = GenerationEngine(gpt, merged, total_pages=64, page_size=8)
    out = [eng.add_request(0, prompt)]
    for _ in range(n):
        out.append(eng.step()[0])
    return out


@pytest.fixture(scope="module")
def setup():
    gpt, params = _gpt()
    ad1 = _random_adapter(jax.random.PRNGKey(1), params)
    ad2 = _random_adapter(jax.random.PRNGKey(2), params)
    return gpt, params, {"alpha": ad1, "beta": ad2}


def test_two_adapters_one_dispatch_token_exact(setup):
    gpt, params, adapters = setup
    p1 = rng.integers(0, 64, 11)
    p2 = rng.integers(0, 64, 17)
    p3 = rng.integers(0, 64, 9)
    ref1 = _reference_stream(gpt, lora_finalize(params, adapters["alpha"]),
                             p1, 8)
    ref2 = _reference_stream(gpt, lora_finalize(params, adapters["beta"]),
                             p2, 8)
    ref3 = _reference_stream(gpt, params, p3, 8)     # base, no adapter

    eng = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                           lora_adapters=adapters)
    got = {0: [eng.add_request(0, p1, adapter="alpha")],
           1: [eng.add_request(1, p2, adapter="beta")],
           2: [eng.add_request(2, p3)]}
    for _ in range(8):
        toks = eng.step()                       # ONE dispatch, three slots
        for sid in (0, 1, 2):
            got[sid].append(toks[sid])
    assert got[0] == ref1
    assert got[1] == ref2
    assert got[2] == ref3


def test_adapter_chunked_prefill_matches_dense(setup):
    """Both prefill paths (chunked factored vs dense merged) must agree."""
    gpt, params, adapters = setup
    prompt = rng.integers(0, 64, 19)
    dense = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                             lora_adapters=adapters, prefill_chunk_size=None)
    want = [dense.add_request(0, prompt, adapter="alpha")]
    want += [dense.step()[0] for _ in range(6)]
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           lora_adapters=adapters, prefill_chunk_size=8)
    got = [eng.add_request(0, prompt, adapter="alpha")]
    got += [eng.step()[0] for _ in range(6)]
    assert got == want


def test_fork_inherits_adapter(setup):
    gpt, params, adapters = setup
    prompt = rng.integers(0, 64, 13)
    ref = _reference_stream(gpt, lora_finalize(params, adapters["beta"]),
                            prompt, 9)
    eng = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                           lora_adapters=adapters)
    got0 = [eng.add_request(0, prompt, adapter="beta")]
    for _ in range(3):
        got0.append(eng.step()[0])
    eng.fork(0, 1)
    got1 = list(got0)
    for _ in range(6):
        toks = eng.step()
        got0.append(toks[0])
        got1.append(toks[1])
    assert got0 == ref[:10]
    assert got1 == ref[:10]                  # forked twin, same adapter


def test_slot_reuse_resets_adapter(setup):
    """finish() must clear the slot's adapter so the next occupant of that
    slot decodes with the base model."""
    gpt, params, adapters = setup
    p1 = rng.integers(0, 64, 9)
    p2 = rng.integers(0, 64, 9)
    base_ref = _reference_stream(gpt, params, p2, 6)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           lora_adapters=adapters)
    eng.add_request(0, p1, adapter="alpha")
    eng.step()
    eng.finish(0)
    got = [eng.add_request(1, p2)]           # reuses slot 0, no adapter
    got += [eng.step()[1] for _ in range(5)]
    assert got == base_ref[:6]


def test_speculative_with_adapters_token_exact(setup):
    """Adapters on the target lane compose with speculative decoding (the
    unadapted draft only proposes; the adapted target decides)."""
    gpt, params, adapters = setup
    dcfg = models.GPTConfig(vocab_size=64, d_model=16, num_heads=2,
                            num_layers=1, hidden_units=32, max_len=128)
    draft = models.GPT(dcfg)
    dparams = draft.init(jax.random.PRNGKey(5), jnp.zeros((1, 8), jnp.int32))
    prompt = rng.integers(0, 64, 10)
    ref = _reference_stream(gpt, lora_finalize(params, adapters["alpha"]),
                            prompt, 10)
    eng = GenerationEngine(gpt, params, total_pages=96, page_size=8,
                           draft_gpt=draft, draft_params=dparams,
                           lora_adapters=adapters)
    got = [eng.add_request(0, prompt, adapter="alpha")]
    while len(got) < len(ref):
        got.extend(eng.step_speculative(2)[0])
    assert got[:len(ref)] == ref


def test_unknown_adapter_raises(setup):
    gpt, params, adapters = setup
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                           lora_adapters=adapters)
    with pytest.raises(ValueError, match="unknown adapter"):
        eng.add_request(0, rng.integers(0, 64, 5), adapter="nope")
