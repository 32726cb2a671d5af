"""GenerationEngine: paged-cache decode must equal the dense-cache decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models
from np_modeling_tpu.serving import GenerationEngine

rng = np.random.default_rng(0)


def _gpt():
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_kv_heads=2, num_layers=2, hidden_units=64,
                           max_len=64)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 64, (1, 8)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    return gpt, params


def test_engine_matches_dense_generate():
    gpt, params = _gpt()
    prompt = jnp.asarray(rng.integers(0, 64, (1, 6)))
    steps = 5
    dense = np.asarray(gpt.generate(params, prompt, steps=steps))[0]

    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           max_seqs=4)
    toks = [eng.add_request(0, prompt[0])]
    for _ in range(steps - 1):
        toks.append(eng.step()[0])
    np.testing.assert_array_equal(np.asarray(toks), dense)


def test_continuous_batching_isolated_sequences():
    gpt, params = _gpt()
    p1 = jnp.asarray(rng.integers(0, 64, (6,)))
    p2 = jnp.asarray(rng.integers(0, 64, (4,)))

    # Solo run of p1 (no batching).
    solo = GenerationEngine(gpt, params, total_pages=64, page_size=4)
    t_solo = [solo.add_request(0, p1)]
    for _ in range(3):
        t_solo.append(solo.step()[0])

    # p1 batched with p2 joining mid-stream and leaving early.
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4)
    t1 = [eng.add_request(0, p1)]
    t1.append(eng.step()[0])
    eng.add_request(1, p2)            # joins
    out = eng.step()
    t1.append(out[0])
    eng.finish(1)                     # leaves; pages reclaimed
    t1.append(eng.step()[0])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t_solo))


def test_pages_reclaimed():
    gpt, params = _gpt()
    eng = GenerationEngine(gpt, params, total_pages=8, page_size=4)
    free0 = eng.free_pages
    eng.add_request(0, jnp.asarray(rng.integers(0, 64, (6,))))
    assert eng.free_pages < free0
    eng.finish(0)
    assert eng.free_pages == free0
    assert eng.live == []


def test_out_of_pages_leaves_state_intact():
    """Page growth is all-or-nothing: an OutOfPagesError mid-step must not
    corrupt any sequence's cache (regression: a partial allocation left a
    page host-side but not in the device table, and the retry scattered
    into another sequence's page 0)."""
    from np_modeling_tpu.serving.kv_cache import OutOfPagesError
    gpt, params = _gpt()
    p1 = jnp.asarray(rng.integers(0, 64, (6,)))
    p2 = jnp.asarray(rng.integers(0, 64, (6,)))

    # Solo reference trajectory for p1.
    solo = GenerationEngine(gpt, params, total_pages=16, page_size=4)
    t_solo = [solo.add_request(0, p1)]
    for _ in range(6):
        t_solo.append(solo.step()[0])

    # Tight pool: 2 prefills take 2 pages each (+1 trash) leaving 1 free;
    # both sequences need a new page at the same step -> OutOfPagesError.
    eng = GenerationEngine(gpt, params, total_pages=6, page_size=4)
    t1 = [eng.add_request(0, p1)]
    eng.add_request(1, p2)
    t1.append(eng.step()[0])      # len 6->7, fits page 2
    t1.append(eng.step()[0])      # len 7->8, fits (position 7)
    with pytest.raises(OutOfPagesError):
        eng.step()                # both need page 3: need 2, free 1
    eng.finish(1)                 # frees p2's pages
    for _ in range(4):
        t1.append(eng.step()[0])  # must continue EXACTLY on p1's trajectory
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t_solo))


def test_step_many_matches_stepwise():
    """step_many(n) (one dispatch) must equal n individual step() calls."""
    gpt, params = _gpt()
    prompt = jnp.asarray(rng.integers(0, 64, (6,)))
    e1 = GenerationEngine(gpt, params, total_pages=32, page_size=4)
    t1 = [e1.add_request(0, prompt)]
    for _ in range(6):
        t1.append(e1.step()[0])
    e2 = GenerationEngine(gpt, params, total_pages=32, page_size=4)
    t2 = [e2.add_request(0, prompt)]
    t2 += e2.step_many(6)[0]
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert e1._host_len[0] == e2._host_len[0]


def test_engine_serves_moe_gpt():
    """Round-1 gap: a MoE GPT crashed the engine's _block_step."""
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=64,
                           moe_experts=4)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 64, (1, 8)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    prompt = jnp.asarray(rng.integers(0, 64, (1, 6)))
    steps = 4
    dense = np.asarray(gpt.generate(params, prompt, steps=steps))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4)
    toks = [eng.add_request(0, prompt[0])]
    for _ in range(steps - 1):
        toks.append(eng.step()[0])
    np.testing.assert_array_equal(np.asarray(toks), dense)


def test_engine_respects_attention_window():
    """Serving a window-trained model must apply the same sliding-window
    mask as training/dense decode (round-1 advisory: paged decode silently
    attended over the full cache)."""
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=64,
                           attention_window=4)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 64, (1, 8)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    prompt = jnp.asarray(rng.integers(0, 64, (1, 10)))  # > window
    steps = 6
    dense = np.asarray(gpt.generate(params, prompt, steps=steps))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4)
    toks = [eng.add_request(0, prompt[0])]
    for _ in range(steps - 1):
        toks.append(eng.step()[0])
    np.testing.assert_array_equal(np.asarray(toks), dense)


def test_engine_sampling_in_graph():
    gpt, params = _gpt()
    prompt = jnp.asarray(rng.integers(0, 64, (6,)))
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           temperature=0.8, top_k=8, seed=7)
    toks = [eng.add_request(0, prompt)]
    for _ in range(8):
        toks.append(eng.step()[0])
    assert all(0 <= t < 64 for t in toks)
    # Different seed -> (almost surely) different trajectory.
    eng2 = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                            temperature=0.8, top_k=8, seed=8)
    toks2 = [eng2.add_request(0, prompt)]
    for _ in range(8):
        toks2.append(eng2.step()[0])
    assert toks != toks2


def test_engine_quantized_kv_close_to_dense():
    gpt, params = _gpt()
    prompt = jnp.asarray(rng.integers(0, 64, (1, 6)))
    dense = np.asarray(gpt.generate(params, prompt, steps=3))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           quantize_kv=True)
    toks = [eng.add_request(0, prompt[0])]
    for _ in range(2):
        toks.append(eng.step()[0])
    # int8 KV: same argmax decode expected at these scales.
    np.testing.assert_array_equal(np.asarray(toks), dense)


def test_engine_matches_dense_generate_rope():
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=64,
                           positional="rope")
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 64, (1, 8)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    prompt = jnp.asarray(rng.integers(0, 64, (1, 6)))
    steps = 5
    dense = np.asarray(gpt.generate(params, prompt, steps=steps))[0]

    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           max_seqs=4)
    toks = [eng.add_request(0, prompt[0])]
    for _ in range(steps - 1):
        toks.append(eng.step()[0])
    np.testing.assert_array_equal(np.asarray(toks), dense)


def test_capacity_bounded_by_model_max_len():
    """page_size not dividing max_len must NOT allow decoding past max_len
    (review finding: positions clipped silently past the trained context)."""
    from np_modeling_tpu.serving.kv_cache import OutOfPagesError
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=1, hidden_units=32, max_len=10)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.asarray(rng.integers(0, 64, (1, 8))))
    eng = GenerationEngine(gpt, params, total_pages=16, page_size=4)
    assert eng._max_tokens == 10          # not 12 (3 pages x 4)
    eng.add_request(0, jnp.asarray(rng.integers(0, 64, (8,))))
    eng.step()                            # len 8 -> 9
    eng.step()                            # len 9 -> 10
    with pytest.raises(OutOfPagesError):
        eng.step()                        # appending position 10 > max_len


def test_engine_bf16_kv_matches_dense():
    """bf16 KV pages (half the page DMA traffic; measured 1.31x decode)
    still greedy-decode identically to the fp32 dense path at these scales."""
    gpt, params = _gpt()
    prompt = jnp.asarray(rng.integers(0, 64, (1, 6)))
    dense = np.asarray(gpt.generate(params, prompt, steps=4))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           kv_dtype=jnp.bfloat16)
    toks = [eng.add_request(0, prompt[0])] + eng.step_many(3)[0]
    np.testing.assert_array_equal(np.asarray(toks), dense)


class TestWindowReclamation:
    def test_window_pages_reclaimed_and_tokens_exact(self):
        """A sliding-window model's per-sequence page usage stays bounded
        at ~window tokens during a long decode, with an unchanged token
        stream (expired positions are never attended)."""
        cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                               num_layers=2, hidden_units=64, max_len=512,
                               attention_window=16)
        gpt = models.GPT(cfg)
        params = gpt.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8), jnp.int32))
        prompt = jnp.asarray(rng.integers(0, 64, 24))

        # Reference stream: dense-cache generate (window-masked).
        want = np.asarray(gpt.generate(params, prompt[None], steps=60))[0]

        eng = GenerationEngine(gpt, params, total_pages=64, page_size=8)
        free0 = eng.free_pages
        got = [eng.add_request(0, prompt)]
        peak_used = 0
        for _ in range(59):
            got.append(eng.step()[0])
            peak_used = max(peak_used, free0 - eng.free_pages)
        assert got == [int(t) for t in want]
        # Live pages bounded: ~(window + page_size + lookahead) tokens of
        # pages, NOT the full 84-token context.
        assert peak_used <= 6, peak_used   # 84 tokens would need 11 pages
        eng.finish(0)
        assert eng.free_pages == free0

    def test_reclamation_with_fork(self):
        cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                               num_layers=1, hidden_units=64, max_len=256,
                               attention_window=8)
        gpt = models.GPT(cfg)
        params = gpt.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 8), jnp.int32))
        eng = GenerationEngine(gpt, params, total_pages=64, page_size=8,
                               max_seqs=4)
        free0 = eng.free_pages
        t = eng.add_request(0, jnp.asarray(rng.integers(0, 64, 20)))
        eng.fork(0, 1)
        d = {0: [t], 1: [t]}
        for _ in range(30):
            step = eng.step()
            d[0].append(step[0])
            d[1].append(step[1])
        assert d[0] == d[1]                  # greedy twins
        eng.finish(0)
        eng.finish(1)
        assert eng.free_pages == free0       # all pages home again
