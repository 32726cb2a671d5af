"""Encoder-decoder (seq2seq) transformer.

The reference pairs TransformerEncoder with TransformerDecoder in its tests
(transformer_test.py:160-219: decoder takes q + encoder memory kv). This is
the full model around that pairing: shared-vocab embeddings, encoder stack,
causal decoder stack with cross-attention, tied output head, KV-cache greedy
decode.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.nn import Embedding, LayerNorm
from np_modeling_tpu.nn.transformer import (TransformerDecoder,
                                            TransformerEncoder)
from np_modeling_tpu.nn.module import Module


@dataclasses.dataclass
class Seq2SeqConfig:
    vocab_size: int = 32000
    d_model: int = 512
    num_heads: int = 8
    num_encoder_layers: int = 4
    num_decoder_layers: int = 4
    hidden_units: int = 2048
    max_len: int = 512
    drop_rate: float = 0.0
    norm_first: bool = True


@dataclasses.dataclass
class Seq2SeqTransformer(Module):
    config: Seq2SeqConfig

    def __post_init__(self):
        c = self.config
        self.embed = Embedding(c.vocab_size, c.d_model)
        self.pos_embed = Embedding(c.max_len, c.d_model)
        self.encoder = TransformerEncoder(
            c.num_encoder_layers, c.num_heads, c.hidden_units,
            c.norm_first, c.drop_rate)
        self.decoder = TransformerDecoder(
            c.num_decoder_layers, c.num_heads, c.hidden_units,
            c.norm_first, c.drop_rate, causal=True)
        self.final_norm = LayerNorm()

    def init(self, key, src, tgt):
        c = self.config
        ks = jax.random.split(key, 5)
        x = jnp.zeros((*src.shape, c.d_model), jnp.float32)
        y = jnp.zeros((*tgt.shape, c.d_model), jnp.float32)
        return {
            "embedding": self.embed.init(ks[0]),
            "pos_embedding": self.pos_embed.init(ks[1]),
            "encoder": self.encoder.init(ks[2], x),
            "decoder": self.decoder.init(ks[3], y, x),
            "final_norm": self.final_norm.init(ks[4], y),
        }

    def _embed(self, params, tokens, offset=0):
        pos = offset + jnp.arange(tokens.shape[-1])
        return (self.embed.apply(params["embedding"], tokens)
                + self.pos_embed.apply(params["pos_embedding"], pos))

    @staticmethod
    def _cross_segs(tgt_len, src_valid):
        """(q_seg, kv_seg) so every target position attends only valid
        (non-padding) source positions — in-kernel, O(s) operands."""
        if src_valid is None:
            return None
        q_seg = jnp.ones((src_valid.shape[0], tgt_len), jnp.int32)
        return (q_seg, src_valid.astype(jnp.int32))

    def encode(self, params, src, training=False, rngs=None, src_valid=None):
        """``src_valid``: [b, s_src] (1 = token, 0 = padding) — padded
        source batches; masking runs in-kernel via segment ids."""
        x = self._embed(params, src)
        seg = src_valid.astype(jnp.int32) if src_valid is not None else None
        return self.encoder.apply(params["encoder"], x, training=training,
                                  rngs=rngs, segment_ids=seg)

    def apply(self, params, src, tgt, training=False, rngs=None,
              src_valid=None):
        memory = self.encode(params, src, training, rngs, src_valid)
        y = self._embed(params, tgt)
        y = self.decoder.apply(params["decoder"], y, memory,
                               training=training, rngs=rngs,
                               cross_segment_ids=self._cross_segs(
                                   tgt.shape[-1], src_valid))
        y = self.final_norm.apply(params["final_norm"], y)
        return self.embed.attend(params["embedding"], y).astype(jnp.float32)

    def loss(self, params, src, tgt, training=False, rngs=None,
             src_valid=None, tgt_valid=None):
        logits = self.apply(params, src, tgt[..., :-1], training, rngs,
                            src_valid=src_valid)
        ce = ops.softmax_cross_entropy_with_integer_labels(
            logits, tgt[..., 1:])
        if tgt_valid is not None:
            v = tgt_valid[..., 1:].astype(ce.dtype)
            return jnp.sum(ce * v) / jnp.maximum(jnp.sum(v), 1.0)
        return jnp.mean(ce)

    def greedy_decode(self, params, src, bos_token: int, steps: int,
                      src_valid=None):
        """KV-cached greedy decode conditioned on encoded src (jittable
        lax.scan, like GPT.generate — one compile regardless of steps)."""
        b = src.shape[0]
        c = self.config
        memory = self.encode(params, src, src_valid=src_valid)
        caches = self.decoder.init_cache(b, steps + 1, c.d_model)
        tok0 = jnp.full((b, 1), bos_token, jnp.int32)
        cross_segs = self._cross_segs(1, src_valid)

        def body(carry, i):
            tok, caches = carry
            y = self._embed(params, tok, offset=i)
            y, caches = self.decoder.apply(params["decoder"], y, memory,
                                           caches=caches, decode=True,
                                           cross_segment_ids=cross_segs)
            y = self.final_norm.apply(params["final_norm"], y)
            logits = self.embed.attend(params["embedding"], y)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (nxt, caches), nxt

        _, toks = jax.lax.scan(body, (tok0, caches), jnp.arange(steps))
        return jnp.swapaxes(toks[:, :, 0], 0, 1)        # [steps,b,1]->[b,steps]

    def beam_decode(self, params, src, bos_token: int, steps: int,
                    beam_size: int, eos_id: int | None = None,
                    alpha: float = 0.0, src_valid=None):
        """Beam-search decode conditioned on encoded ``src``
        (:func:`models.beam.encdec_beam_search` — encoder memory rides
        the gather-exempt aux cache). Returns
        ``(tokens [b, beam, steps], scores [b, beam])`` best-first."""
        from np_modeling_tpu.models.beam import encdec_beam_search

        memory = self.encode(params, src, src_valid=src_valid)
        kv_seg = (src_valid.astype(jnp.int32) if src_valid is not None
                  else None)

        def init_dec_cache(b, max_len):
            return self.decoder.init_cache(b, max_len, self.config.d_model)

        def decode_step(params, tokens, dec, aux):
            cs = ((jnp.ones(tokens.shape, jnp.int32), aux["kv_seg"])
                  if "kv_seg" in aux else None)
            y = self._embed(params, tokens, offset=dec[0]["index"])
            y, dec = self.decoder.apply(params["decoder"], y, aux["mem"],
                                        caches=dec, decode=True,
                                        cross_segment_ids=cs)
            y = self.final_norm.apply(params["final_norm"], y)
            logits = self.embed.attend(params["embedding"], y)
            return logits.astype(jnp.float32), dec

        return encdec_beam_search(init_dec_cache, decode_step, params,
                                  src.shape[0], bos_token, steps,
                                  beam_size, memory, kv_seg=kv_seg,
                                  eos_id=eos_id, alpha=alpha)
