"""SSMEngine: continuous-batching Mamba serving. Token-exact vs
Mamba.generate greedy under staggered joins/leaves, slot lifecycle, and
single-dispatch step_many."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models
from np_modeling_tpu.serving import OutOfSlotsError, SSMEngine

rng = np.random.default_rng(31)


def _setup(max_seqs=4, kind="mamba"):
    if kind == "mamba2":
        cfg = models.Mamba2Config(vocab_size=64, d_model=32, num_layers=2,
                                  d_state=8, d_conv=4, expand=2, head_dim=8,
                                  n_groups=2, chunk_size=8)
        m = models.Mamba2(cfg)
    else:
        cfg = models.MambaConfig(vocab_size=64, d_model=32, num_layers=2,
                                 d_state=8, d_conv=4, expand=2, dt_rank=4)
        m = models.Mamba(cfg)
    toks = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), toks)
    return m, params, SSMEngine(m, params, max_seqs=max_seqs)


def _prompt(n=8):
    return jnp.asarray(rng.integers(0, 64, (n,)), jnp.int32)


def test_single_sequence_matches_generate():
    m, params, eng = _setup()
    p = _prompt()
    want = np.asarray(m.generate(params, p[None], steps=6))[0]
    eng.add_request(0, p)
    got = eng.step_many(6)[0]
    np.testing.assert_array_equal(got, want)


def test_staggered_continuous_batching_token_exact():
    m, params, eng = _setup()
    prompts = {i: _prompt(5 + i) for i in range(3)}
    want = {i: np.asarray(m.generate(params, p[None], steps=8))[0]
            for i, p in prompts.items()}

    streams = {i: [] for i in range(3)}
    eng.add_request(0, prompts[0])
    for _ in range(3):                       # seq 0 runs alone first
        for s, t in eng.step().items():
            streams[s].append(t)
    eng.add_request(1, prompts[1])           # joins mid-flight
    for _ in range(2):
        for s, t in eng.step().items():
            streams[s].append(t)
    eng.add_request(2, prompts[2])
    while any(len(v) < 8 for v in streams.values()):
        for s, t in eng.step().items():
            if len(streams[s]) < 8:
                streams[s].append(t)
    for i in range(3):
        np.testing.assert_array_equal(streams[i], want[i], err_msg=str(i))


def test_mamba2_staggered_continuous_batching_token_exact():
    """The engine is state-layout agnostic: serving Mamba-2 (chunked-SSD
    prefill, per-head states) stays token-exact under staggered joins."""
    m, params, eng = _setup(kind="mamba2")
    prompts = {i: _prompt(5 + i) for i in range(3)}
    want = {i: np.asarray(m.generate(params, p[None], steps=6))[0]
            for i, p in prompts.items()}

    streams = {i: [] for i in range(3)}
    eng.add_request(0, prompts[0])
    for _ in range(2):
        for s, t in eng.step().items():
            streams[s].append(t)
    eng.add_requests({1: prompts[1], 2: prompts[2]})   # join mid-flight
    while any(len(v) < 6 for v in streams.values()):
        for s, t in eng.step().items():
            if len(streams[s]) < 6:
                streams[s].append(t)
    for i in range(3):
        np.testing.assert_array_equal(streams[i], want[i], err_msg=str(i))


def test_step_many_with_fresh_join():
    """A just-joined sequence gets its prefill token as token 0 of the
    same step_many call (frozen first iteration)."""
    m, params, eng = _setup()
    p0, p1 = _prompt(), _prompt(6)
    want0 = np.asarray(m.generate(params, p0[None], steps=7))[0]
    want1 = np.asarray(m.generate(params, p1[None], steps=4))[0]
    eng.add_request(0, p0)
    out = eng.step_many(3)
    np.testing.assert_array_equal(out[0], want0[:3])
    eng.add_request(1, p1)
    out = eng.step_many(4)
    np.testing.assert_array_equal(out[0], want0[3:7])
    np.testing.assert_array_equal(out[1], want1)


def test_slot_lifecycle_and_reuse():
    m, params, eng = _setup(max_seqs=2)
    a, b, c = _prompt(), _prompt(7), _prompt(9)
    eng.add_request(0, a)
    eng.add_request(1, b)
    with pytest.raises(OutOfSlotsError):
        eng.add_request(2, c)
    with pytest.raises(ValueError):
        eng.add_request(0, a)
    hist_b = list(eng.step_many(2)[1])
    eng.remove(0)                            # freed slot is reusable...
    eng.add_request(2, c)
    want_c = np.asarray(m.generate(params, c[None], steps=3))[0]
    out = eng.step_many(3)
    np.testing.assert_array_equal(out[2], want_c)
    assert eng.live == [1, 2]
    # ...and the surviving sequence was not disturbed by the join.
    hist_b.extend(out[1])
    want_b = np.asarray(m.generate(params, b[None], steps=5))[0]
    np.testing.assert_array_equal(hist_b, want_b)


def test_sampled_decode_runs():
    m, params, _ = _setup()
    eng = SSMEngine(m, params, max_seqs=2, temperature=0.9, top_k=12,
                    seed=3)
    eng.add_request(0, _prompt())
    out = eng.step_many(5)[0]
    assert len(out) == 5 and all(0 <= t < 64 for t in out)
