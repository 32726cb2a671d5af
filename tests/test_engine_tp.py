"""Tensor-parallel serving: the mesh-sharded engine must emit the SAME
tokens as the single-device engine.

The TP engine (GenerationEngine(mesh=...)) shards weights by
parallel.TRANSFORMER_RULES and KV pages by kv-head over the tp axis; the
paged-attention call runs as a shard_map island (heads independent, no
collective inside), with XLA inserting the o-proj/FFN all-reduces from the
weight shardings. Run on the 8-virtual-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from np_modeling_tpu import models
from np_modeling_tpu.serving import GenerationEngine

rng = np.random.default_rng(7)


def _gpt(**kw):
    base = dict(vocab_size=97, d_model=64, num_heads=4, num_kv_heads=4,
                num_layers=2, hidden_units=128, max_len=64)
    cfg = models.GPTConfig(**{**base, **kw})
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 97, (1, 8)))
    params = gpt.init(jax.random.PRNGKey(3), tokens)
    return gpt, params


def _mesh(tp):
    return Mesh(np.asarray(jax.devices()[:tp]), ("tp",))


def _decode(eng, prompts, steps):
    """Prefill all prompts, decode ``steps-1`` more tokens, return the
    per-sequence token rows."""
    first = eng.add_requests({i: p for i, p in enumerate(prompts)})
    rows = {i: [t] for i, t in first.items()}
    for _ in range(steps - 1):
        out = eng.step()
        for i, t in out.items():
            rows[i].append(t)
    return np.asarray([rows[i] for i in range(len(prompts))])


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_engine_token_exact(tp):
    gpt, params = _gpt()
    prompts = [jnp.asarray(rng.integers(0, 97, (n,))) for n in (6, 11)]

    base = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                            max_seqs=4, prefill_chunk_size=4)
    want = _decode(base, prompts, steps=6)

    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           max_seqs=4, prefill_chunk_size=4,
                           mesh=_mesh(tp))
    got = _decode(eng, prompts, steps=6)
    np.testing.assert_array_equal(got, want)

    # The page buffers really are head-sharded over tp.
    spec = eng._state["k_pages"][0].sharding.spec
    assert spec[0] == "tp", spec


def test_tp_engine_gqa_window_quantized():
    """GQA (hq=8 over hkv=2 on tp=2) + sliding window + int8 KV pages:
    every decode-path feature composes with the tp shard_map island."""
    gpt, params = _gpt(num_heads=8, num_kv_heads=2, attention_window=8)
    prompts = [jnp.asarray(rng.integers(0, 97, (9,)))]

    base = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                            max_seqs=2, prefill_chunk_size=4,
                            quantize_kv=True)
    want = _decode(base, prompts, steps=5)

    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           max_seqs=2, prefill_chunk_size=4,
                           quantize_kv=True, mesh=_mesh(2))
    got = _decode(eng, prompts, steps=5)
    np.testing.assert_array_equal(got, want)


def test_tp_engine_continuous_batching_and_reclaim():
    """Sequences join/leave between tp-sharded steps; pages reclaimed."""
    gpt, params = _gpt()
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           max_seqs=4, prefill_chunk_size=4, mesh=_mesh(2))
    free0 = eng.free_pages
    eng.add_request(0, jnp.asarray(rng.integers(0, 97, (6,))))
    eng.step()
    eng.add_request(1, jnp.asarray(rng.integers(0, 97, (5,))))
    eng.step()
    eng.finish(0)
    eng.step()
    eng.finish(1)
    assert eng.free_pages == free0


def test_tp_island_runs_pallas_kernel_interpret():
    """The shard_map island dispatches the REAL Pallas kernel (interpret
    mode on CPU) — the path real TPU serving takes."""
    from np_modeling_tpu.ops import dispatch
    gpt, params = _gpt()
    prompts = [jnp.asarray(rng.integers(0, 97, (6,)))]
    base = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                            max_seqs=2, prefill_chunk_size=4)
    want = _decode(base, prompts, steps=4)
    with dispatch.force_pallas(True, interpret=True):
        eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                               max_seqs=2, prefill_chunk_size=4,
                               mesh=_mesh(2))
        got = _decode(eng, prompts, steps=4)
    np.testing.assert_array_equal(got, want)


def test_tp_speculative_token_exact():
    """Speculative decoding under tp: the draft lane's pages shard too and
    the multi-token (4-D q) verification runs through the island."""
    gpt, params = _gpt()
    draft, dparams = _gpt(num_layers=1)
    prompt = jnp.asarray(rng.integers(0, 97, (6,)))

    base = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                            max_seqs=2, prefill_chunk_size=4)
    want = [base.add_request(0, prompt)]
    for _ in range(4):
        want.append(base.step()[0])

    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           max_seqs=2, prefill_chunk_size=4, mesh=_mesh(2),
                           draft_gpt=draft, draft_params=dparams)
    got = [eng.add_request(0, prompt)]
    while len(got) < 5:
        got.extend(eng.step_speculative(gamma=2)[0])
    np.testing.assert_array_equal(np.asarray(got[:5]), np.asarray(want))


def test_tp_requires_divisible_kv_heads():
    gpt, params = _gpt(num_heads=2, num_kv_heads=1)
    with pytest.raises(AssertionError, match="kv heads"):
        GenerationEngine(gpt, params, total_pages=16, page_size=4,
                         prefill_chunk_size=4, mesh=_mesh(2))


def test_tp_requires_chunked_prefill():
    gpt, params = _gpt()
    with pytest.raises(AssertionError, match="chunked prefill"):
        GenerationEngine(gpt, params, total_pages=16, page_size=4,
                         prefill_chunk_size=None, mesh=_mesh(2))


def test_tp_engine_attention_sinks():
    """gpt-oss-style sinks through the TP island: the [hq] sinks array is
    SHARDED by head alongside q (a closed-over full-size array would
    reshape-crash inside the per-shard paged_attention call)."""
    gpt, params = _gpt(num_heads=8, num_kv_heads=2, attn_sinks=True,
                       norm="rms", ffn="swiglu", use_bias=False,
                       positional="rope", tie_embeddings=False)
    # Nonzero sinks so the rescale actually bites.
    for i in range(gpt.config.num_layers):
        params[f"layer_{i}"]["self_attention"]["sinks"] = jnp.asarray(
            rng.standard_normal(8), jnp.float32)
    prompts = [jnp.asarray(rng.integers(0, 97, (n,))) for n in (6, 9)]
    base = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                            max_seqs=4, prefill_chunk_size=4)
    want = _decode(base, prompts, steps=6)
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                           max_seqs=4, prefill_chunk_size=4, mesh=_mesh(2))
    got = _decode(eng, prompts, steps=6)
    np.testing.assert_array_equal(got, want)
