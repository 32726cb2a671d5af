"""HuggingFace BERT import: hidden-state/pooler/MLM parity vs torch.

Oracle pattern (SURVEY.md §4): ``transformers.BertModel`` /
``BertForMaskedLM`` built locally with random weights (no network),
converted via utils.hf_compat.import_bert, must match at fp32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models
from np_modeling_tpu.utils import hf_compat

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

rng = np.random.default_rng(11)
TOL = dict(rtol=1e-4, atol=2e-5)


def _hf_cfg(**kw):
    base = dict(vocab_size=113, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=64, type_vocab_size=2,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                hidden_act="gelu")
    return transformers.BertConfig(**{**base, **kw})


def test_bert_model_parity():
    torch.manual_seed(0)
    model = transformers.BertModel(_hf_cfg())
    model.eval()
    cfg, params = hf_compat.import_bert(model)
    assert cfg.activation == "gelu_exact" and cfg.ln_eps == 1e-12
    assert not cfg.norm_first and cfg.type_vocab_size == 2
    bert = models.BertEncoder(cfg)

    toks = rng.integers(0, 113, (2, 10))
    with torch.no_grad():
        out = model(torch.tensor(toks))
    ours = bert.encode(params, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(ours),
                               out.last_hidden_state.numpy(), **TOL)
    pooled = np.tanh(np.asarray(ours)[:, 0] @ np.asarray(params["pooler"]["w"])
                     + np.asarray(params["pooler"]["b"]))
    np.testing.assert_allclose(pooled, out.pooler_output.numpy(), **TOL)


def test_bert_token_type_ids_parity():
    """Sentence-pair inputs: segment embeddings must route through."""
    torch.manual_seed(1)
    model = transformers.BertModel(_hf_cfg())
    model.eval()
    cfg, params = hf_compat.import_bert(model)
    bert = models.BertEncoder(cfg)

    toks = rng.integers(0, 113, (1, 12))
    tt = np.concatenate([np.zeros((1, 5), np.int64),
                         np.ones((1, 7), np.int64)], axis=1)
    with torch.no_grad():
        out = model(torch.tensor(toks), token_type_ids=torch.tensor(tt))
    ours = bert.encode(params, jnp.asarray(toks),
                       token_type_ids=jnp.asarray(tt))
    np.testing.assert_allclose(np.asarray(ours),
                               out.last_hidden_state.numpy(), **TOL)


def test_bert_mlm_logits_parity():
    torch.manual_seed(2)
    model = transformers.BertForMaskedLM(_hf_cfg())
    model.eval()
    cfg, params = hf_compat.import_bert(model)
    assert cfg.mlm_head
    bert = models.BertEncoder(cfg)

    toks = rng.integers(0, 113, (2, 8))
    with torch.no_grad():
        want = model(torch.tensor(toks)).logits.numpy()
    got = np.asarray(bert.mlm_logits(params, jnp.asarray(toks)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bert_padding_mask_matches_hf():
    """attention_mask (padding) through our segment-id machinery must match
    HF's additive -inf masking at the real-token positions."""
    torch.manual_seed(3)
    model = transformers.BertModel(_hf_cfg())
    model.eval()
    cfg, params = hf_compat.import_bert(model)
    bert = models.BertEncoder(cfg)

    toks = rng.integers(0, 113, (2, 10))
    am = np.ones((2, 10), np.int64)
    am[0, 7:] = 0
    am[1, 4:] = 0
    with torch.no_grad():
        out = model(torch.tensor(toks), attention_mask=torch.tensor(am))
    ours = np.asarray(bert.encode(params, jnp.asarray(toks),
                                  attention_mask=jnp.asarray(am)))
    want = out.last_hidden_state.numpy()
    for b in range(2):
        n = int(am[b].sum())
        np.testing.assert_allclose(ours[b, :n], want[b, :n], **TOL)
