"""Seq2SeqEngine: paged continuous-batching T5 decode must equal the
dense-cache ``T5.greedy_decode`` (the oracle HF-generate parity is
established against in test_t5.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models
from np_modeling_tpu.serving import Seq2SeqEngine
from np_modeling_tpu.serving.kv_cache import OutOfPagesError

rng = np.random.default_rng(0)


def _t5(gated=False, tie=True):
    cfg = models.T5Config(vocab_size=64, d_model=32, d_kv=8, num_heads=4,
                          num_encoder_layers=2, num_decoder_layers=2,
                          d_ff=48, relpos_buckets=8, relpos_max_distance=20,
                          gated_act=gated, tie_embeddings=tie)
    m = models.T5(cfg)
    src = jnp.zeros((1, 6), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), src, src)
    return m, params


def _dense(m, params, src, steps):
    valid = jnp.ones((1, len(src)), bool)
    return np.asarray(m.greedy_decode(params, jnp.asarray(src)[None], 0,
                                      steps, src_valid=valid))[0]


@pytest.mark.parametrize("gated,tie", [(False, True), (True, False)])
def test_engine_matches_greedy_decode(gated, tie):
    m, params = _t5(gated=gated, tie=tie)
    src = rng.integers(1, 64, (7,))
    steps = 6
    dense = _dense(m, params, src, steps)

    eng = Seq2SeqEngine(m, params, max_src_len=16, max_tgt_len=16,
                        total_pages=16, page_size=4, max_seqs=4)
    eng.add_request(0, src)
    toks = [eng.step()[0] for _ in range(steps)]
    np.testing.assert_array_equal(np.asarray(toks), dense)


def test_continuous_batching_isolated_sequences():
    """A sequence decoding alongside others (different source lengths,
    mid-stream join, early leave) must produce its solo tokens."""
    m, params = _t5()
    s1 = rng.integers(1, 64, (9,))
    s2 = rng.integers(1, 64, (4,))

    solo = [_dense(m, params, s, 5) for s in (s1, s2)]

    eng = Seq2SeqEngine(m, params, max_src_len=16, max_tgt_len=16,
                        total_pages=32, page_size=4, max_seqs=4)
    eng.add_request(0, s1)
    t1 = [eng.step()[0], eng.step()[0]]
    eng.add_request(1, s2)           # joins two steps in
    t2 = []
    for _ in range(3):
        out = eng.step()
        t1.append(out[0])
        t2.append(out[1])
    eng.finish(0)                    # leaves; pages reclaimed
    t2 += [eng.step()[1], eng.step()[1]]
    np.testing.assert_array_equal(np.asarray(t1), solo[0])
    np.testing.assert_array_equal(np.asarray(t2), solo[1])


def test_step_many_matches_stepwise():
    m, params = _t5()
    src = rng.integers(1, 64, (5,))
    dense = _dense(m, params, src, 6)

    eng = Seq2SeqEngine(m, params, max_src_len=8, max_tgt_len=8,
                        total_pages=16, page_size=4, max_seqs=2)
    eng.add_request(7, src)
    out = eng.step_many(6)
    np.testing.assert_array_equal(np.asarray(out[7]), dense)
    assert eng.capacity(7) == 2


def test_page_exhaustion_and_reclaim():
    m, params = _t5()
    # 4 usable pages (one is the trash page, one spare), page_size=2.
    eng = Seq2SeqEngine(m, params, max_src_len=8, max_tgt_len=8,
                        total_pages=5, page_size=2, max_seqs=4)
    eng.add_request(0, rng.integers(1, 64, (3,)))
    eng.add_request(1, rng.integers(1, 64, (3,)))
    eng.step_many(4)                 # 2 pages each = 4 of 4 used
    with pytest.raises(OutOfPagesError):
        eng.step()                   # 5th token needs a 3rd page apiece
    eng.finish(1)                    # reclaim
    eng.step()                       # now fits
    assert eng.live == [0]


def test_capacity_limit_is_max_tgt_len():
    m, params = _t5()
    eng = Seq2SeqEngine(m, params, max_src_len=8, max_tgt_len=4,
                        total_pages=16, page_size=2, max_seqs=2)
    eng.add_request(0, rng.integers(1, 64, (3,)))
    eng.step_many(4)
    with pytest.raises(OutOfPagesError):
        eng.step()


def test_source_too_long_rejected():
    m, params = _t5()
    eng = Seq2SeqEngine(m, params, max_src_len=4, max_tgt_len=8,
                        total_pages=16, page_size=2, max_seqs=2)
    with pytest.raises(ValueError):
        eng.add_request(0, rng.integers(1, 64, (5,)))
