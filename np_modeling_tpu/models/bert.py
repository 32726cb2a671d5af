"""BERT-style bidirectional encoder (BASELINE.json config #4 shape)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.nn import Dropout, Embedding, LayerNorm, Linear
from np_modeling_tpu.nn.module import Module, split_rngs
from np_modeling_tpu.nn.transformer import TransformerEncoderBlock


@dataclasses.dataclass
class BertConfig:
    vocab_size: int = 30522
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 4
    hidden_units: int = 2048
    max_len: int = 512
    drop_rate: float = 0.0
    norm_first: bool = False    # classic BERT is post-norm
    num_classes: int = 2
    mlm_head: bool = False      # add the masked-LM pretraining head
                                # (transform Linear+gelu+LN, tied decoder)
    activation: object = "relu"  # FFN activation (HF BERT: "gelu_exact")
    ln_eps: float = 1e-3        # LayerNorm epsilon (HF BERT: 1e-12)
    type_vocab_size: int = 0    # >0: token-type (segment) embeddings
                                # (HF BERT sentence-pair inputs)


@dataclasses.dataclass
class BertEncoder(Module):
    """Token+position embeddings -> encoder stack -> [CLS] pooler -> classifier."""

    config: BertConfig

    def __post_init__(self):
        c = self.config
        self.embed = Embedding(c.vocab_size, c.d_model)
        self.pos_embed = Embedding(c.max_len, c.d_model)
        if c.type_vocab_size:
            self.type_embed = Embedding(c.type_vocab_size, c.d_model)
        self.embed_norm = LayerNorm(epsilon=c.ln_eps)
        self.block = TransformerEncoderBlock(
            c.num_heads, c.hidden_units, c.norm_first, c.drop_rate,
            activation=c.activation, ln_eps=c.ln_eps)
        self.pooler = Linear(c.d_model)
        self.classifier = Linear(c.num_classes)
        self.drop = Dropout(c.drop_rate)
        if c.mlm_head:
            self.mlm_transform = Linear(c.d_model)
            self.mlm_norm = LayerNorm(epsilon=c.ln_eps)

    def init(self, key, tokens):
        c = self.config
        ks = jax.random.split(key, c.num_layers + 5)
        x = jnp.zeros((*tokens.shape, c.d_model), jnp.float32)
        params = {
            "embedding": self.embed.init(ks[0]),
            "pos_embedding": self.pos_embed.init(ks[1]),
            "embed_norm": self.embed_norm.init(ks[2], x),
        }
        if c.type_vocab_size:
            params["type_embedding"] = self.type_embed.init(
                jax.random.fold_in(key, 777))
        for i in range(c.num_layers):
            params[f"layer_{i}"] = self.block.init(ks[3 + i], x)
        pooled = jnp.zeros((tokens.shape[0], c.d_model), jnp.float32)
        params["pooler"] = self.pooler.init(ks[-2], pooled)
        params["classifier"] = self.classifier.init(ks[-1], pooled)
        if c.mlm_head:
            km = jax.random.fold_in(key, 999)
            params["mlm_transform"] = self.mlm_transform.init(km, x)
            params["mlm_norm"] = self.mlm_norm.init(
                jax.random.fold_in(km, 1), x)
            params["mlm_bias"] = jnp.zeros((c.vocab_size,), jnp.float32)
        return params

    def encode(self, params, tokens, mask=None, training=False, rngs=None,
               attention_mask=None, token_type_ids=None):
        """``attention_mask``: [b, s] (1 = real token, 0 = padding) — the
        standard padded-batch surface. Routed through the flash kernels'
        segment-id machinery (O(s) operands, not an O(s^2) boolean mask):
        padding tokens form their own segment so real tokens never attend
        to them. ``mask`` remains for arbitrary [b|1, h|1, s, s] masks.
        ``token_type_ids``: [b, s] segment ids for sentence-pair inputs
        (needs ``type_vocab_size>0``; defaults to all-zeros)."""
        c = self.config
        segment_ids = None
        if attention_mask is not None:
            assert attention_mask.shape == tokens.shape
            segment_ids = attention_mask.astype(jnp.int32)
        positions = jnp.arange(tokens.shape[-1])
        x = (self.embed.apply(params["embedding"], tokens)
             + self.pos_embed.apply(params["pos_embedding"], positions))
        if c.type_vocab_size:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(tokens)
            x = x + self.type_embed.apply(params["type_embedding"],
                                          token_type_ids)
        else:
            assert token_type_ids is None, (
                "token_type_ids needs BertConfig(type_vocab_size>0)")
        x = self.embed_norm.apply(params["embed_norm"], x)
        x = self.drop.apply({}, x, training, rngs, salt=1000)
        for i in range(c.num_layers):
            x = self.block.apply(params[f"layer_{i}"], x, mask=mask,
                                 segment_ids=segment_ids,
                                 training=training, rngs=split_rngs(rngs, i))
        return x

    def apply(self, params, tokens, mask=None, training=False, rngs=None,
              attention_mask=None, token_type_ids=None):
        x = self.encode(params, tokens, mask, training, rngs,
                        attention_mask=attention_mask,
                        token_type_ids=token_type_ids)
        pooled = jnp.tanh(self.pooler.apply(params["pooler"], x[:, 0]))
        return self.classifier.apply(params["classifier"], pooled)

    # ---- masked-LM pretraining (BERT objective) --------------------------

    def mlm_logits(self, params, tokens, training=False, rngs=None,
                   attention_mask=None):
        """Per-position vocab logits via the BERT MLM head: hidden ->
        Linear + gelu + LayerNorm -> tied-embedding decoder + bias."""
        assert self.config.mlm_head, "build with BertConfig(mlm_head=True)"
        x = self.encode(params, tokens, training=training, rngs=rngs,
                        attention_mask=attention_mask)
        x = ops.gelu(self.mlm_transform.apply(params["mlm_transform"], x))
        x = self.mlm_norm.apply(params["mlm_norm"], x)
        logits = jnp.einsum("...d,vd->...v", x,
                            params["embedding"]["table"],
                            preferred_element_type=jnp.float32)
        return logits.astype(jnp.float32) + params["mlm_bias"]

    def mlm_loss(self, params, tokens, labels, weights, training=False,
                 rngs=None, attention_mask=None):
        """Mean CE over masked positions (``weights`` 1 = masked/predict).

        ``tokens``: corrupted inputs (see :func:`mlm_mask_tokens`);
        ``labels``: original ids."""
        logits = self.mlm_logits(params, tokens, training, rngs,
                                 attention_mask=attention_mask)
        ce = ops.softmax_cross_entropy_with_integer_labels(logits, labels)
        w = weights.astype(jnp.float32)
        return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def mlm_mask_tokens(key, tokens, vocab_size: int, mask_token: int,
                    mask_rate: float = 0.15, special_tokens=()):
    """BERT 80/10/10 corruption: select ``mask_rate`` of positions; replace
    80% with ``mask_token``, 10% with a random id, 10% kept. Returns
    ``(inputs, labels, weights)`` with ``weights`` 1 at selected positions.
    ``special_tokens``: ids never selected (e.g. CLS/SEP/PAD)."""
    k_sel, k_split, k_rand = jax.random.split(key, 3)
    selectable = jnp.ones(tokens.shape, bool)
    for t in special_tokens:
        selectable &= tokens != t
    sel = (jax.random.uniform(k_sel, tokens.shape) < mask_rate) & selectable
    u = jax.random.uniform(k_split, tokens.shape)
    rand_ids = jax.random.randint(k_rand, tokens.shape, 0, vocab_size)
    corrupted = jnp.where(u < 0.8, mask_token,
                          jnp.where(u < 0.9, rand_ids, tokens))
    inputs = jnp.where(sel, corrupted, tokens)
    return inputs, tokens, sel.astype(jnp.int32)
