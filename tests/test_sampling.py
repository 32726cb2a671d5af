"""Decode-time sampling controls: penalties / min_p / logit_bias.

Processor semantics are asserted against ``transformers``' logits
processors (repetition penalty, min_p) and hand-computed OpenAI-style
presence/frequency penalties; the engine integration is asserted
token-exact against a dense-decode oracle that applies the same
processors with numpy-maintained statistics.

Reference lineage: the reference has no serving tier (SURVEY.md §5);
semantics follow the de-facto public APIs (HF / OpenAI / vLLM).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from np_modeling_tpu import models
from np_modeling_tpu.serving import GenerationEngine, SamplingParams
from np_modeling_tpu.serving.sampling import (min_p_filter, params_row,
                                              process_logits, sample,
                                              sample_batch, static_bias,
                                              token_histogram)

rng = np.random.default_rng(0)


# ---- processor semantics vs transformers / hand-computed ------------------


def test_repetition_penalty_matches_transformers():
    from transformers import RepetitionPenaltyLogitsProcessor
    V = 37
    logits = rng.normal(size=(2, V)).astype(np.float32) * 3
    seen = [rng.integers(0, V, (9,)), rng.integers(0, V, (4,))]

    hf = RepetitionPenaltyLogitsProcessor(penalty=1.7)
    want = np.stack([
        hf(torch.tensor(s[None]), torch.tensor(logits[i][None]))[0].numpy()
        for i, s in enumerate(seen)])

    # Ours splits "seen" into prompt membership + generated counts; any
    # split covering the same token set must match HF (which only sees
    # the union).
    counts = np.stack([np.bincount(s[:2], minlength=V) for s in seen])
    pmask = np.stack([np.bincount(s[2:], minlength=V) > 0 for s in seen])
    got = process_logits(jnp.asarray(logits),
                         SamplingParams(repetition_penalty=1.7),
                         jnp.asarray(counts), jnp.asarray(pmask))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_min_p_matches_transformers():
    from transformers import MinPLogitsWarper
    V = 53
    logits = rng.normal(size=(3, V)).astype(np.float32) * 4
    hf = MinPLogitsWarper(min_p=0.2, min_tokens_to_keep=1)
    want = hf(torch.zeros((3, 1), dtype=torch.long),
              torch.tensor(logits)).numpy()
    got = np.asarray(min_p_filter(jnp.asarray(logits), 0.2))
    keep_w, keep_g = np.isfinite(want), np.isfinite(got)
    np.testing.assert_array_equal(keep_g, keep_w)
    np.testing.assert_allclose(got[keep_g], want[keep_w], rtol=1e-6)


def test_presence_frequency_openai_semantics():
    V = 19
    logits = rng.normal(size=(V,)).astype(np.float32)
    counts = rng.integers(0, 4, (V,))
    want = logits - 0.5 * (counts > 0) - 0.25 * counts
    got = process_logits(
        jnp.asarray(logits),
        SamplingParams(presence_penalty=0.5, frequency_penalty=0.25),
        jnp.asarray(counts), jnp.zeros((V,), bool))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_static_bias_and_banned_tokens():
    sp = SamplingParams(logit_bias={3: 2.5, 7: -1.0}, banned_tokens=(7, 11))
    b = np.asarray(static_bias(sp, 16))
    assert b[3] == 2.5
    assert b[7] == -np.inf and b[11] == -np.inf   # ban wins over bias
    assert b[0] == 0.0
    assert static_bias(SamplingParams(), 16) is None


def test_token_histogram():
    h = np.asarray(token_histogram([1, 1, 4, 0], 6))
    np.testing.assert_array_equal(h, [1, 2, 0, 0, 1, 0])


# ---- engine integration: token-exact vs a dense oracle --------------------


def _gpt():
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_kv_heads=2, num_layers=2, hidden_units=64,
                           max_len=64)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.asarray(rng.integers(0, 64, (1, 8))))
    return gpt, params


def _oracle_decode(gpt, params, prompt, steps, sp):
    """Greedy dense decode applying the full processor chain with
    numpy-maintained token statistics — the semantics the engine's
    in-graph counts must reproduce."""
    V = gpt.config.vocab_size
    toks = list(np.asarray(prompt))
    pmask = np.bincount(toks, minlength=V) > 0
    counts = np.zeros((V,), np.int64)
    bias = static_bias(sp, V)
    out = []
    for _ in range(steps):
        logits = gpt.apply(params, jnp.asarray(toks)[None])[0, -1]
        lg = process_logits(logits, sp, jnp.asarray(counts),
                            jnp.asarray(pmask), bias)
        t = int(jnp.argmax(lg))
        out.append(t)
        toks.append(t)
        counts[t] += 1
    return out


@pytest.mark.parametrize("chunked", [True, False],
                         ids=["chunked-prefill", "dense-prefill"])
def test_engine_repetition_penalty_matches_oracle(chunked):
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (6,))
    sp = SamplingParams(repetition_penalty=1.8, presence_penalty=0.3,
                        frequency_penalty=0.2)
    want = _oracle_decode(gpt, params, prompt, 6, sp)
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           max_seqs=4, sampling=sp,
                           prefill_chunk_size=4 if chunked else None)
    got = [eng.add_request(0, jnp.asarray(prompt))]
    for _ in range(5):
        got.append(eng.step()[0])
    assert got == want


def test_engine_step_many_matches_oracle():
    """Counts must update inside the scanned multi-token step too."""
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (5,))
    sp = SamplingParams(frequency_penalty=1.5)
    want = _oracle_decode(gpt, params, prompt, 7, sp)
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           max_seqs=4, sampling=sp)
    got = [eng.add_request(0, jnp.asarray(prompt))]
    got += eng.step_many(6)[0]
    assert got == want


def test_engine_banned_tokens_never_emitted():
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (4,))
    base = GenerationEngine(gpt, params, total_pages=32, page_size=4)
    t0 = [base.add_request(0, jnp.asarray(prompt))]
    t0 += base.step_many(4)[0]
    banned = tuple(set(t0))
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           sampling=SamplingParams(banned_tokens=banned))
    got = [eng.add_request(0, jnp.asarray(prompt))]
    got += eng.step_many(4)[0]
    assert not set(got) & set(banned)
    assert got != t0


def test_engine_logit_bias_forces_token():
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (4,))
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           sampling=SamplingParams(logit_bias={9: 1e4}))
    got = [eng.add_request(0, jnp.asarray(prompt))]
    got += eng.step_many(3)[0]
    assert got == [9, 9, 9, 9]


def test_fork_inherits_and_finish_clears_stats():
    gpt, params = _gpt()
    sp = SamplingParams(repetition_penalty=1.8)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=4, sampling=sp)
    prompt = rng.integers(0, 64, (6,))
    first = eng.add_request(0, jnp.asarray(prompt))
    eng.step()
    # The fork shares the page prefix AND the penalty statistics: both
    # sequences must emit the same (penalized, greedy) next token.
    eng.fork(0, 1)
    out = eng.step()
    assert out[0] == out[1]
    eng.finish(0)
    eng.finish(1)
    # Slot reuse must not inherit the old histogram: a fresh request in
    # the reclaimed slot decodes exactly like a fresh engine.
    again = eng.add_request(2, jnp.asarray(prompt))
    assert again == first
    fresh = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                             max_seqs=4, sampling=sp)
    assert fresh.add_request(0, jnp.asarray(prompt)) == again
    np.testing.assert_array_equal(
        np.asarray(eng.step()[2]), np.asarray(fresh.step()[0]))


def test_batched_prefill_seeds_per_row_masks():
    """add_requests: each row's penalties see ITS prompt only."""
    gpt, params = _gpt()
    sp = SamplingParams(repetition_penalty=2.0)
    p1 = rng.integers(0, 32, (6,))
    p2 = rng.integers(32, 64, (9,))
    want1 = _oracle_decode(gpt, params, p1, 4, sp)
    want2 = _oracle_decode(gpt, params, p2, 4, sp)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=4, sampling=sp, prefill_chunk_size=4)
    firsts = eng.add_requests({0: jnp.asarray(p1), 1: jnp.asarray(p2)})
    got1, got2 = [firsts[0]], [firsts[1]]
    for _ in range(3):
        out = eng.step()
        got1.append(out[0])
        got2.append(out[1])
    assert got1 == want1
    assert got2 == want2


def test_speculative_rejects_advanced_sampling():
    gpt, params = _gpt()
    with pytest.raises(AssertionError, match="speculative"):
        GenerationEngine(gpt, params, draft_gpt=gpt, draft_params=params,
                         sampling=SamplingParams(repetition_penalty=1.3))


def test_sample_batch_matches_single_config():
    """A uniform per-row table must reproduce the single-config chain
    EXACTLY (same -inf pattern, same categorical draw) — uniform-row
    batch == broadcast single config, for sampled and greedy configs."""
    V, S = 97, 5
    logits = jnp.asarray(rng.normal(size=(S, V)) * 3, jnp.float32)
    counts = jnp.asarray(rng.integers(0, 3, (S, V)))
    pmask = jnp.asarray(rng.random((S, V)) < 0.1)
    for sp in (SamplingParams(temperature=0.7, top_k=12, top_p=0.9,
                              min_p=0.05, repetition_penalty=1.5,
                              presence_penalty=0.3, frequency_penalty=0.2),
               SamplingParams(repetition_penalty=2.0),          # greedy
               SamplingParams(temperature=1.1, top_p=0.7),
               SamplingParams(temperature=0.5, top_k=3)):
        key = jax.random.PRNGKey(5)
        want = sample(logits, key, sp, counts, pmask)
        table = jnp.tile(jnp.asarray(params_row(sp))[None], (S, 1))
        got = sample_batch(logits, key, table, counts, pmask)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want)), sp


def test_per_request_sampling_independent_slots():
    """Two greedy slots with DIFFERENT penalty configs in one dispatch:
    each must match its own single-config oracle."""
    gpt, params = _gpt()
    p1 = rng.integers(0, 64, (6,))
    p2 = rng.integers(0, 64, (5,))
    sp1 = SamplingParams(repetition_penalty=2.0)
    sp2 = SamplingParams(frequency_penalty=1.0, logit_bias={3: 4.0})
    want1 = _oracle_decode(gpt, params, p1, 5, sp1)
    want2 = _oracle_decode(gpt, params, p2, 5, sp2)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=4, per_request_sampling=True)
    firsts = eng.add_requests({0: jnp.asarray(p1), 1: jnp.asarray(p2)},
                              sampling={0: sp1, 1: sp2})
    got1, got2 = [firsts[0]], [firsts[1]]
    outs = eng.step_many(4)
    got1 += outs[0]
    got2 += outs[1]
    assert got1 == want1
    assert got2 == want2


def test_per_request_default_matches_plain_engine():
    """Slots WITHOUT an explicit SamplingParams fall back to the engine's
    plain fields — token-exact vs a non-per-request engine (greedy and
    sampled), including a sampled slot sharing the dispatch."""
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (6,))
    plain = GenerationEngine(gpt, params, total_pages=32, page_size=4)
    a = [plain.add_request(0, jnp.asarray(prompt))]
    a += plain.step_many(4)[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           max_seqs=4, per_request_sampling=True)
    b = [eng.add_request(0, jnp.asarray(prompt))]
    eng.add_request(1, jnp.asarray(rng.integers(0, 64, (4,))),
                    sampling=SamplingParams(temperature=0.9, top_k=5))
    outs = eng.step_many(4)
    b += outs[0]
    assert a == b                      # greedy slot unaffected by neighbor
    assert all(0 <= t < 64 for t in outs[1])


def test_per_request_fork_and_finish():
    gpt, params = _gpt()
    sp = SamplingParams(repetition_penalty=1.9, banned_tokens=(7,))
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=4, per_request_sampling=True)
    prompt = rng.integers(0, 64, (6,))
    eng.add_request(0, jnp.asarray(prompt), sampling=sp)
    eng.step()
    eng.fork(0, 1)
    out = eng.step()
    assert out[0] == out[1]            # child inherits knobs + stats + bias
    eng.finish(0)
    eng.finish(1)
    # Reused slot reverts to the engine default (greedy, no penalties).
    fresh = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                             max_seqs=4)
    assert (eng.add_request(2, jnp.asarray(prompt))
            == fresh.add_request(0, jnp.asarray(prompt)))
    assert eng.step()[2] == fresh.step()[0]


def test_per_request_requires_flag():
    gpt, params = _gpt()
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4)
    with pytest.raises(ValueError, match="per_request_sampling"):
        eng.add_request(0, jnp.asarray(rng.integers(0, 64, (4,))),
                        sampling=SamplingParams(min_p=0.1))


def test_plain_sampling_params_match_legacy_fields():
    """SamplingParams(temperature/top_k/top_p) alone must decode exactly
    like the legacy plain-field configuration (same key path)."""
    gpt, params = _gpt()
    prompt = rng.integers(0, 64, (5,))
    legacy = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                              temperature=0.8, top_k=8, seed=3)
    a = [legacy.add_request(0, jnp.asarray(prompt))]
    a += legacy.step_many(5)[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           sampling=SamplingParams(temperature=0.8, top_k=8),
                           seed=3)
    b = [eng.add_request(0, jnp.asarray(prompt))]
    b += eng.step_many(5)[0]
    assert a == b
