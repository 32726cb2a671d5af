"""T5 encoder-decoder (relative-position-bias transformer).

The reference's encoder-decoder surface is its Transformer{Encoder,Decoder}
pairing (/root/reference/layers/transformer.py:95-203, tests at
transformer_test.py:160-219); models/seq2seq.py is the faithful
learned-position version. This is the production enc-dec family built on
the same kernels: T5's pre-RMSNorm blocks, UNSCALED attention scores
(scale=1.0), bucketed relative-position bias (one embedding per stack,
owned by block 0, streamed into the flash kernels as an additive score
bias with a differentiable dbias), biasless projections, and the
relu (v1.0) / gated-gelu (v1.1) FFN forms. ``utils.hf_compat.import_t5``
maps HF ``T5ForConditionalGeneration`` checkpoints onto it, torch-parity
tested.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.nn import Embedding, RMSNorm, initializers
from np_modeling_tpu.nn.attention import MultiHeadAttention
from np_modeling_tpu.nn.module import Module, maybe_cast


@dataclasses.dataclass
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64                 # per-head dim, decoupled from d_model
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ff: int = 2048
    relpos_buckets: int = 32
    relpos_max_distance: int = 128
    gated_act: bool = False        # False: relu FFN (v1.0); True:
                                   # gated-gelu (v1.1 / FLAN)
    tie_embeddings: bool = True    # tied head rescales hidden by d^-0.5
    drop_rate: float = 0.0
    ln_eps: float = 1e-6
    dtype: object = None           # bf16 compute; params/stats stay fp32


def relative_position_bucket(rel, *, bidirectional: bool,
                             num_buckets: int, max_distance: int):
    """HF-exact bucketing of ``rel = memory_pos - query_pos`` (int array):
    half the buckets (all of them for the causal decoder) cover exact
    small distances, the rest are logarithmic up to ``max_distance``."""
    ret = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (rel > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    scale = (num_buckets - max_exact) / jnp.log(max_distance / max_exact)
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        * scale).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, rel, large)


@dataclasses.dataclass
class T5(Module):
    config: T5Config

    def __post_init__(self):
        c = self.config
        self.embed = Embedding(c.vocab_size, c.d_model)
        mha = dict(num_heads=c.num_heads, head_dim=c.d_kv, use_bias=False,
                   attn_scale=1.0, dtype=c.dtype)
        self.enc_attn = MultiHeadAttention(**mha)
        self.dec_attn = MultiHeadAttention(causal=True, **mha)
        self.cross_attn = MultiHeadAttention(**mha)
        self.norm = RMSNorm(epsilon=c.ln_eps)

    # ---- params --------------------------------------------------------

    def _ffn_init(self, key, d):
        c = self.config
        ks = jax.random.split(key, 3)
        init = initializers.lecun_normal
        if c.gated_act:
            return {"wi_0": init(ks[0], (d, c.d_ff)),
                    "wi_1": init(ks[1], (d, c.d_ff)),
                    "wo": init(ks[2], (c.d_ff, d))}
        return {"wi": init(ks[0], (d, c.d_ff)),
                "wo": init(ks[1], (c.d_ff, d))}

    def init(self, key, src, tgt):
        c = self.config
        x = jnp.zeros((*src.shape, c.d_model), jnp.float32)
        ks = jax.random.split(key, 4 + c.num_encoder_layers
                              + c.num_decoder_layers)
        params = {
            "embedding": self.embed.init(ks[0]),
            # One relpos table per stack, owned by block 0 (T5 layout).
            "enc_relpos": initializers.normal(
                ks[1], (c.relpos_buckets, c.num_heads)),
            "dec_relpos": initializers.normal(
                ks[2], (c.relpos_buckets, c.num_heads)),
        }
        for i in range(c.num_encoder_layers):
            k = jax.random.split(ks[3 + i], 4)
            params[f"enc_{i}"] = {
                "self_attention": self.enc_attn.init(k[0], x),
                "norm1": self.norm.init(k[1], x),
                "norm2": self.norm.init(k[2], x),
                "ffn": self._ffn_init(k[3], c.d_model),
            }
        off = 3 + c.num_encoder_layers
        for i in range(c.num_decoder_layers):
            k = jax.random.split(ks[off + i], 6)
            params[f"dec_{i}"] = {
                "self_attention": self.dec_attn.init(k[0], x),
                "cross_attention": self.cross_attn.init(k[1], x, x),
                "norm1": self.norm.init(k[2], x),
                "norm2": self.norm.init(k[3], x),
                "norm3": self.norm.init(k[4], x),
                "ffn": self._ffn_init(k[5], c.d_model),
            }
        params["enc_norm"] = self.norm.init(ks[-1], x)
        params["dec_norm"] = self.norm.init(ks[-1], x)
        if not c.tie_embeddings:
            params["lm_head"] = {"w": initializers.lecun_normal(
                ks[-1], (c.d_model, c.vocab_size))}
        return params

    # ---- pieces --------------------------------------------------------

    def _relpos_bias(self, table, qpos, kpos, bidirectional):
        """[1, h, q, k] additive score bias from bucketed relative
        positions (rel = kpos - qpos)."""
        c = self.config
        rel = kpos[None, :] - qpos[:, None]
        bucket = relative_position_bucket(
            rel, bidirectional=bidirectional, num_buckets=c.relpos_buckets,
            max_distance=c.relpos_max_distance)
        bias = jnp.asarray(table)[bucket]          # [q, k, h]
        return jnp.transpose(bias, (2, 0, 1))[None]

    def _ffn(self, fp, y):
        c = self.config
        y = maybe_cast(y, c.dtype)
        if c.gated_act:
            g = ops.gelu(ops.linear(y, maybe_cast(fp["wi_0"], c.dtype)))
            h = g * ops.linear(y, maybe_cast(fp["wi_1"], c.dtype))
        else:
            h = ops.relu(ops.linear(y, maybe_cast(fp["wi"], c.dtype)))
        return ops.linear(h, maybe_cast(fp["wo"], c.dtype))

    def _drop(self, x, training, rngs, salt):
        if not training or self.config.drop_rate == 0.0 or rngs is None:
            return x
        key = jax.random.fold_in(rngs["dropout"], salt)
        keep = jax.random.bernoulli(key, 1.0 - self.config.drop_rate,
                                    x.shape)
        return jnp.where(keep, x / (1.0 - self.config.drop_rate), 0.0)

    # ---- stacks --------------------------------------------------------

    def encode(self, params, src, training=False, rngs=None,
               src_valid=None):
        c = self.config
        x = self.embed.apply(params["embedding"], src)
        x = maybe_cast(x, c.dtype)
        pos = jnp.arange(src.shape[-1])
        bias = self._relpos_bias(params["enc_relpos"], pos, pos,
                                 bidirectional=True)
        seg = src_valid.astype(jnp.int32) if src_valid is not None else None
        for i in range(c.num_encoder_layers):
            lp = params[f"enc_{i}"]
            h = self.norm.apply(lp["norm1"], x)
            h = self.enc_attn.apply(lp["self_attention"], h, bias=bias,
                                    segment_ids=seg)
            x = x + self._drop(h, training, rngs, 2 * i)
            h = self.norm.apply(lp["norm2"], x)
            x = x + self._drop(self._ffn(lp["ffn"], h), training, rngs,
                               2 * i + 1)
        return self.norm.apply(params["enc_norm"], x)

    def _decoder_stack(self, params, y, memory, bias, training, rngs,
                       cross_segs, caches=None, decode=False):
        c = self.config
        new_caches = [] if decode else None
        for i in range(c.num_decoder_layers):
            lp = params[f"dec_{i}"]
            h = self.norm.apply(lp["norm1"], y)
            if decode:
                h, cache = self.dec_attn.apply(
                    lp["self_attention"], h, cache=caches[i], decode=True,
                    bias=bias)
                new_caches.append(cache)
            else:
                h = self.dec_attn.apply(lp["self_attention"], h, bias=bias)
            y = y + self._drop(h, training, rngs, 1000 + 3 * i)
            h = self.norm.apply(lp["norm2"], y)
            h = self.cross_attn.apply(lp["cross_attention"], h, memory,
                                      segment_ids=cross_segs)
            y = y + self._drop(h, training, rngs, 1000 + 3 * i + 1)
            h = self.norm.apply(lp["norm3"], y)
            y = y + self._drop(self._ffn(lp["ffn"], h), training, rngs,
                               1000 + 3 * i + 2)
        y = self.norm.apply(params["dec_norm"], y)
        return (y, new_caches) if decode else y

    def _head(self, params, y):
        c = self.config
        if c.tie_embeddings:
            # HF ties with a d^-0.5 rescale of the final hidden states.
            y = y * jnp.asarray(c.d_model ** -0.5, y.dtype)
            table = maybe_cast(params["embedding"]["table"], c.dtype)
            return jnp.einsum("...d,vd->...v", maybe_cast(y, c.dtype),
                              table,
                              preferred_element_type=jnp.float32)
        return ops.linear(maybe_cast(y, c.dtype),
                          maybe_cast(params["lm_head"]["w"], c.dtype)
                          ).astype(jnp.float32)

    @staticmethod
    def _cross_segs(b, tgt_len, src_valid):
        if src_valid is None:
            return None
        return (jnp.ones((b, tgt_len), jnp.int32),
                src_valid.astype(jnp.int32))

    # ---- public API ----------------------------------------------------

    def apply(self, params, src, tgt, training=False, rngs=None,
              src_valid=None):
        """Teacher-forced logits [b, s_tgt, vocab] (fp32)."""
        c = self.config
        memory = self.encode(params, src, training, rngs, src_valid)
        y = maybe_cast(self.embed.apply(params["embedding"], tgt), c.dtype)
        pos = jnp.arange(tgt.shape[-1])
        bias = self._relpos_bias(params["dec_relpos"], pos, pos,
                                 bidirectional=False)
        y = self._decoder_stack(params, y, memory, bias, training, rngs,
                                self._cross_segs(src.shape[0],
                                                 tgt.shape[-1], src_valid))
        return self._head(params, y)

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
        """KV-cached greedy decode (jittable lax.scan). The decoder's
        relative bias row is rebuilt per step for query position i against
        the full cache length."""
        c = self.config
        b = src.shape[0]
        memory = self.encode(params, src, src_valid=src_valid)
        caches = [self.dec_attn.init_cache(b, steps + 1, c.d_model)
                  for _ in range(c.num_decoder_layers)]
        tok0 = jnp.full((b, 1), bos_token, jnp.int32)
        cross_segs = self._cross_segs(b, 1, src_valid)
        kpos = jnp.arange(steps + 1)

        def body(carry, i):
            tok, caches = carry
            y = maybe_cast(self.embed.apply(params["embedding"], tok),
                           c.dtype)
            bias = self._relpos_bias(params["dec_relpos"], i[None], kpos,
                                     bidirectional=False)
            y, caches = self._decoder_stack(
                params, y, memory, bias, False, None, cross_segs,
                caches=caches, decode=True)
            logits = self._head(params, y)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (nxt, caches), nxt

        _, toks = jax.lax.scan(body, (tok0, caches), jnp.arange(steps))
        return jnp.swapaxes(toks[:, :, 0], 0, 1)

    def beam_decode(self, params, src, bos_token: int, steps: int,
                    beam_size: int, eos_id: int | None = None,
                    alpha: float = 0.0, src_valid=None):
        """Beam-search decode conditioned on encoded ``src``
        (:func:`models.beam.encdec_beam_search` — encoder memory rides
        the gather-exempt aux cache). Returns
        ``(tokens [b, beam, steps], scores [b, beam])`` best-first."""
        from np_modeling_tpu.models.beam import encdec_beam_search

        c = self.config
        memory = self.encode(params, src, src_valid=src_valid)
        kv_seg = (src_valid.astype(jnp.int32) if src_valid is not None
                  else None)

        def init_dec_cache(b, max_len):
            return [self.dec_attn.init_cache(b, max_len, c.d_model)
                    for _ in range(c.num_decoder_layers)]

        def decode_step(params, tokens, dec, aux):
            cs = ((jnp.ones(tokens.shape, jnp.int32), aux["kv_seg"])
                  if "kv_seg" in aux else None)
            qpos = dec[0]["index"] + jnp.arange(tokens.shape[-1])
            bias = self._relpos_bias(params["dec_relpos"], qpos,
                                     jnp.arange(dec[0]["k"].shape[2]),
                                     bidirectional=False)
            y = maybe_cast(self.embed.apply(params["embedding"], tokens),
                           c.dtype)
            y, dec = self._decoder_stack(params, y, aux["mem"], bias,
                                         False, None, cs, caches=dec,
                                         decode=True)
            return self._head(params, y), dec

        return encdec_beam_search(init_dec_cache, decode_step, params,
                                  src.shape[0], bos_token, steps,
                                  beam_size, memory, kv_seg=kv_seg,
                                  eos_id=eos_id, alpha=alpha)
