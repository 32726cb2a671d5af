"""T5 encoder-decoder: HF torch parity (v1.0 relu + v1.1 gated), KV-cached
greedy decode vs HF generate, relpos-bias gradients, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import transformers

from np_modeling_tpu import models, training
from np_modeling_tpu.models.t5 import relative_position_bucket
from np_modeling_tpu.utils import hf_compat

rng = np.random.default_rng(0)


def _tiny_t5(seed=0, gated=False, tie=True, dec_layers=2):
    cfg = transformers.T5Config(
        vocab_size=66, d_model=32, d_kv=8, num_heads=4, num_layers=2,
        num_decoder_layers=dec_layers, d_ff=37,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        layer_norm_epsilon=1e-6,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tie, decoder_start_token_id=0)
    torch.manual_seed(seed)
    model = transformers.T5ForConditionalGeneration(cfg)
    model.eval()
    return model


def test_bucket_matches_hf():
    """Our bucket fn == HF T5Attention._relative_position_bucket."""
    from transformers.models.t5.modeling_t5 import T5Attention
    rel = torch.arange(-50, 51)[None]
    for bidir, buckets, maxd in [(True, 32, 128), (False, 32, 128),
                                 (True, 8, 20), (False, 8, 20)]:
        want = T5Attention._relative_position_bucket(
            rel, bidirectional=bidir, num_buckets=buckets,
            max_distance=maxd).numpy()
        got = np.asarray(relative_position_bucket(
            jnp.asarray(rel.numpy()), bidirectional=bidir,
            num_buckets=buckets, max_distance=maxd))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("gated,tie", [(False, True), (True, False)])
def test_t5_logits_match_torch(gated, tie):
    model = _tiny_t5(gated=gated, tie=tie)
    cfg, params = hf_compat.import_t5(model)
    assert cfg.gated_act == gated and cfg.tie_embeddings == tie
    t5 = models.T5(cfg)
    src = rng.integers(0, 66, (2, 9))
    tgt = rng.integers(0, 66, (2, 7))
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(src),
                     decoder_input_ids=torch.from_numpy(tgt)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(t5.apply(params, jnp.asarray(src),
                                  jnp.asarray(tgt)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_t5_padded_source_matches_torch():
    """src_valid masks padded encoder positions like HF attention_mask."""
    model = _tiny_t5(seed=3)
    cfg, params = hf_compat.import_t5(model)
    t5 = models.T5(cfg)
    src = rng.integers(1, 66, (2, 8))
    valid = np.ones((2, 8), np.int64)
    valid[0, 5:] = 0
    valid[1, 3:] = 0
    tgt = rng.integers(0, 66, (2, 5))
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(src),
                     attention_mask=torch.from_numpy(valid),
                     decoder_input_ids=torch.from_numpy(tgt)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(t5.apply(params, jnp.asarray(src),
                                  jnp.asarray(tgt),
                                  src_valid=jnp.asarray(valid)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_t5_greedy_decode_matches_hf_generate():
    model = _tiny_t5(seed=7)
    cfg, params = hf_compat.import_t5(model)
    t5 = models.T5(cfg)
    src = rng.integers(1, 66, (2, 6))
    steps = 5
    with torch.no_grad():
        want = model.generate(torch.from_numpy(src), max_new_tokens=steps,
                              do_sample=False, num_beams=1,
                              min_new_tokens=steps).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(t5.greedy_decode(params, jnp.asarray(src),
                                          bos_token=0, steps=steps))
    # HF prepends decoder_start_token_id (= our bos 0).
    np.testing.assert_array_equal(got, want[:, 1:1 + steps])


def test_t5_trains_and_relpos_gets_grads():
    cfg = models.T5Config(vocab_size=50, d_model=32, d_kv=8, num_heads=4,
                          num_encoder_layers=2, num_decoder_layers=2,
                          d_ff=64, relpos_buckets=8, relpos_max_distance=20)
    t5 = models.T5(cfg)
    src = jnp.asarray(rng.integers(0, 50, (4, 10)))
    tgt = jnp.asarray(rng.integers(0, 50, (4, 8)))
    params = t5.init(jax.random.PRNGKey(0), src, tgt)
    opt = training.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda p: t5.loss(p, src, tgt))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss, g

    losses = []
    for _ in range(12):
        params, state, loss, g = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # The relative-bias tables learn (grads flow through the flash
    # kernels' dbias path).
    assert float(jnp.sum(jnp.abs(g["enc_relpos"]))) > 0
    assert float(jnp.sum(jnp.abs(g["dec_relpos"]))) > 0


def test_t5_beam1_equals_greedy():
    """beam_size=1 beam decode == greedy decode (the standard beam sanity
    identity), and scores are finite + sorted."""
    model = _tiny_t5(seed=5)
    cfg, params = hf_compat.import_t5(model)
    t5 = models.T5(cfg)
    src = jnp.asarray(rng.integers(1, 66, (2, 6)))
    steps = 5
    greedy = np.asarray(t5.greedy_decode(params, src, bos_token=0,
                                         steps=steps))
    toks, scores = t5.beam_decode(params, src, bos_token=0, steps=steps,
                                  beam_size=1)
    np.testing.assert_array_equal(np.asarray(toks)[:, 0], greedy)
    assert np.isfinite(np.asarray(scores)).all()


def test_t5_beam_scores_improve_or_match():
    """A wider beam never returns a worse top hypothesis (total logprob)."""
    model = _tiny_t5(seed=9)
    cfg, params = hf_compat.import_t5(model)
    t5 = models.T5(cfg)
    src = jnp.asarray(rng.integers(1, 66, (2, 5)))
    _, s1 = t5.beam_decode(params, src, bos_token=0, steps=4, beam_size=1)
    _, s4 = t5.beam_decode(params, src, bos_token=0, steps=4, beam_size=4)
    assert (np.asarray(s4)[:, 0] >= np.asarray(s1)[:, 0] - 1e-5).all()
