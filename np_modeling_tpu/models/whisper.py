"""Whisper: speech-to-text encoder-decoder (first audio family).

Architecture (Radford et al.): a conv1d x2 stem over log-mel features
(stride 2 halves time), FIXED sinusoidal encoder positions, a pre-LN
transformer encoder; a decoder with learned positions, causal self- and
cross-attention, and a tied-embedding head. Built entirely from the same
ops/nn tier as the text models — the conv stem rides ops.conv2d (height-1
images, manual torch-style (1, 1) edge padding + VALID so the boundary
columns match HF exactly), attention is the standard flash-kernel MHA
(Whisper's k projection is biasless in HF; imported as a zero bias,
which is exact).

Reference lineage: the reference's encoder-decoder surface is
/root/reference/layers/transformer.py:95-203; this is that pairing on a
non-text modality. ``utils.hf_compat.import_whisper`` maps HF
``WhisperForConditionalGeneration`` checkpoints, torch-parity tested.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import ops
from np_modeling_tpu.nn import Dropout, Embedding, LayerNorm, initializers
from np_modeling_tpu.nn.attention import MultiHeadAttention
from np_modeling_tpu.nn.module import Module, maybe_cast


@dataclasses.dataclass
class WhisperConfig:
    vocab_size: int = 51865
    n_mels: int = 80
    num_audio_positions: int = 1500   # encoder frames AFTER the stride-2 conv
    max_target_positions: int = 448
    d_model: int = 384                # tiny=384 base=512 small=768 ...
    num_heads: int = 6
    num_encoder_layers: int = 4
    num_decoder_layers: int = 4
    d_ff: int = 1536
    drop_rate: float = 0.0
    ln_eps: float = 1e-5
    dtype: object = None


def sinusoid_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal table: [length, channels], fp32 —
    sin on the first half of channels, cos on the second."""
    assert channels % 2 == 0
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(
        np.float32)


@dataclasses.dataclass
class Whisper(Module):
    config: WhisperConfig

    def __post_init__(self):
        c = self.config
        self.embed = Embedding(c.vocab_size, c.d_model)
        mha = dict(num_heads=c.num_heads, use_bias=True, dtype=c.dtype)
        self.enc_attn = MultiHeadAttention(**mha)
        self.dec_attn = MultiHeadAttention(causal=True, **mha)
        self.cross_attn = MultiHeadAttention(**mha)
        self.norm = LayerNorm(epsilon=c.ln_eps)
        self.dropout = Dropout(c.drop_rate)

    # ---- params ---------------------------------------------------------

    def _ffn_init(self, key, d):
        c = self.config
        ks = jax.random.split(key, 2)
        init = initializers.lecun_normal
        return {"wi": init(ks[0], (d, c.d_ff)),
                "bi": jnp.zeros((c.d_ff,)),
                "wo": init(ks[1], (c.d_ff, d)),
                "bo": jnp.zeros((d,))}

    def init(self, key, mel, tgt):
        """mel: [b, frames, n_mels] (time-major; 2x num_audio_positions
        frames), tgt: [b, s] token ids."""
        c = self.config
        x = jnp.zeros((1, 1, c.d_model), jnp.float32)
        ks = jax.random.split(key, 6 + c.num_encoder_layers
                              + c.num_decoder_layers)
        params = {
            "embedding": self.embed.init(ks[0]),
            "conv1": {"w": initializers.lecun_normal(
                ks[1], (1, 3, c.n_mels, c.d_model)),
                "b": jnp.zeros((c.d_model,))},
            "conv2": {"w": initializers.lecun_normal(
                ks[2], (1, 3, c.d_model, c.d_model)),
                "b": jnp.zeros((c.d_model,))},
            # Sinusoids at init; HF checkpoints store the same table as a
            # weight, so the import just overwrites it.
            "enc_positions": jnp.asarray(sinusoid_positions(
                c.num_audio_positions, c.d_model)),
            "dec_positions": 0.02 * jax.random.normal(
                ks[3], (c.max_target_positions, c.d_model), jnp.float32),
        }
        for i in range(c.num_encoder_layers):
            k = jax.random.split(ks[4 + i], 4)
            params[f"enc_{i}"] = {
                "self_attention": self.enc_attn.init(k[0], x),
                "norm1": self.norm.init(k[1], x),
                "norm2": self.norm.init(k[2], x),
                "ffn": self._ffn_init(k[3], c.d_model),
            }
        off = 4 + c.num_encoder_layers
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
        params["enc_norm"] = self.norm.init(ks[-2], x)
        params["dec_norm"] = self.norm.init(ks[-1], x)
        return params

    # ---- pieces ---------------------------------------------------------

    def _ffn(self, fp, y):
        c = self.config
        y = maybe_cast(y, c.dtype)
        h = ops.gelu_exact(ops.linear(y, maybe_cast(fp["wi"], c.dtype),
                                      maybe_cast(fp["bi"], c.dtype)))
        return ops.linear(h, maybe_cast(fp["wo"], c.dtype),
                          maybe_cast(fp["bo"], c.dtype))

    def _drop(self, x, training, rngs, salt):
        return self.dropout.apply({}, x, training, rngs, salt=salt)

    def _stem(self, params, mel):
        """[b, frames, n_mels] -> [b, frames // 2, d]: two k=3 convs
        (stride 1 then 2) with exact-GELU, torch (1, 1) edge padding."""
        x = mel[:, None]                               # [b, 1, T, mels]
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        x = ops.conv2d(x, params["conv1"]["w"], params["conv1"]["b"],
                       strides=(1, 1), padding="VALID")
        x = ops.gelu_exact(x)
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        x = ops.conv2d(x, params["conv2"]["w"], params["conv2"]["b"],
                       strides=(1, 2), padding="VALID")
        return ops.gelu_exact(x)[:, 0]                 # [b, T // 2, d]

    # ---- stacks ---------------------------------------------------------

    def encode(self, params, mel, training=False, rngs=None):
        """[b, frames, n_mels] -> encoder memory [b, frames // 2, d]."""
        c = self.config
        x = self._stem(params, mel)
        assert x.shape[1] == c.num_audio_positions, (
            f"encoder expects {2 * c.num_audio_positions} mel frames, got "
            f"{mel.shape[1]}")
        x = maybe_cast(x + params["enc_positions"], c.dtype)
        for i in range(c.num_encoder_layers):
            lp = params[f"enc_{i}"]
            h = self.norm.apply(lp["norm1"], x)
            h = self.enc_attn.apply(lp["self_attention"], h)
            x = x + self._drop(h, training, rngs, 2 * i)
            h = self.norm.apply(lp["norm2"], x)
            x = x + self._drop(self._ffn(lp["ffn"], h), training, rngs,
                               2 * i + 1)
        return self.norm.apply(params["enc_norm"], x)

    def _decoder_stack(self, params, y, memory, training, rngs,
                       caches=None, decode=False, cross_kv=None):
        """``cross_kv``: per-layer precomputed (k, v) of the encoder
        memory (see :meth:`_cross_kv`) — decode projects the static
        memory ONCE instead of per generated token."""
        c = self.config
        new_caches = [] if decode else None
        for i in range(c.num_decoder_layers):
            lp = params[f"dec_{i}"]
            h = self.norm.apply(lp["norm1"], y)
            if decode:
                h, cache = self.dec_attn.apply(
                    lp["self_attention"], h, cache=caches[i], decode=True)
                new_caches.append(cache)
            else:
                h = self.dec_attn.apply(lp["self_attention"], h)
            y = y + self._drop(h, training, rngs, 1000 + 3 * i)
            h = self.norm.apply(lp["norm2"], y)
            h = self.cross_attn.apply(
                lp["cross_attention"], h,
                memory if cross_kv is None else None,
                precomputed_kv=None if cross_kv is None else cross_kv[i])
            y = y + self._drop(h, training, rngs, 1000 + 3 * i + 1)
            h = self.norm.apply(lp["norm3"], y)
            y = y + self._drop(self._ffn(lp["ffn"], h), training, rngs,
                               1000 + 3 * i + 2)
        y = self.norm.apply(params["dec_norm"], y)
        return (y, new_caches) if decode else y

    def _embed_tgt(self, params, tgt, offset=0):
        c = self.config
        pos = offset + jnp.arange(tgt.shape[-1])
        # jnp.asarray: imported params may be host numpy arrays, which
        # cannot be indexed by a traced position inside scan.
        y = (self.embed.apply(params["embedding"], tgt)
             + jnp.asarray(params["dec_positions"])[pos])
        return maybe_cast(y, c.dtype)

    def _head(self, params, y):
        table = maybe_cast(params["embedding"]["table"], self.config.dtype)
        return jnp.einsum("...d,vd->...v", maybe_cast(y, self.config.dtype),
                          table,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.float32)

    # ---- public API -----------------------------------------------------

    def apply(self, params, mel, tgt, training=False, rngs=None):
        """Teacher-forced logits [b, s_tgt, vocab] (fp32)."""
        memory = self.encode(params, mel, training, rngs)
        y = self._embed_tgt(params, tgt)
        y = self._decoder_stack(params, y, memory, training, rngs)
        return self._head(params, y)

    def loss(self, params, mel, tgt, training=False, rngs=None,
             tgt_valid=None):
        logits = self.apply(params, mel, tgt[..., :-1], training, rngs)
        ce = ops.softmax_cross_entropy_with_integer_labels(
            logits, tgt[..., 1:])
        if tgt_valid is not None:
            v = tgt_valid[..., 1:].astype(ce.dtype)
            return jnp.sum(ce * v) / jnp.maximum(jnp.sum(v), 1.0)
        return jnp.mean(ce)

    def _cross_kv(self, params, memory):
        """Project the encoder memory through every decoder layer's
        cross-attention k/v ONCE (the memory is static across decode)."""
        out = []
        for i in range(self.config.num_decoder_layers):
            ap = params[f"dec_{i}"]["cross_attention"]
            out.append((self.cross_attn._project(memory, ap["wk"],
                                                 ap.get("bk")),
                        self.cross_attn._project(memory, ap["wv"],
                                                 ap.get("bv"))))
        return out

    def greedy_decode(self, params, mel, prompt_tokens, steps: int):
        """KV-cached greedy decode from a forced prompt (Whisper prefixes
        <sot><lang><task>...): encode once, prefill the prompt through the
        decode path, then a jittable scan. Returns [b, steps]."""
        c = self.config
        b = mel.shape[0]
        memory = self.encode(params, mel)
        prompt = jnp.asarray(prompt_tokens)
        if prompt.ndim == 1:
            prompt = jnp.broadcast_to(prompt[None], (b, prompt.shape[0]))
        max_len = prompt.shape[1] + steps + 1
        caches = [self.dec_attn.init_cache(b, max_len, c.d_model)
                  for _ in range(c.num_decoder_layers)]
        cross_kv = self._cross_kv(params, memory)
        y = self._embed_tgt(params, prompt)
        y, caches = self._decoder_stack(params, y, memory, False, None,
                                        caches=caches, decode=True,
                                        cross_kv=cross_kv)
        tok0 = jnp.argmax(self._head(params, y[:, -1:]),
                          axis=-1).astype(jnp.int32)

        def body(carry, i):
            tok, caches = carry
            y = self._embed_tgt(params, tok,
                                offset=prompt.shape[1] + i)
            y, caches = self._decoder_stack(params, y, memory, False, None,
                                            caches=caches, decode=True,
                                            cross_kv=cross_kv)
            nxt = jnp.argmax(self._head(params, y[:, -1:]),
                             axis=-1).astype(jnp.int32)
            return (nxt, caches), tok

        (_, _), toks = jax.lax.scan(body, (tok0, caches),
                                    jnp.arange(steps))
        return jnp.swapaxes(toks[:, :, 0], 0, 1)

    def beam_decode(self, params, mel, prompt_tokens, steps: int,
                    beam_size: int, eos_id: int | None = None,
                    alpha: float = 0.0):
        """Beam-search decode from a forced prompt (decode-surface parity
        with T5, VERDICT r3 #7): encoder memory AND the per-layer
        precomputed cross-attention k/v ride the gather-exempt aux cache
        (:func:`models.beam.encdec_beam_search`). Returns
        ``(tokens [b, beam, steps], scores [b, beam])`` best-first; tokens
        EXCLUDE the forced prompt."""
        from np_modeling_tpu.models.beam import encdec_beam_search

        c = self.config
        b = mel.shape[0]
        memory = self.encode(params, mel)
        prompt = jnp.asarray(prompt_tokens)
        if prompt.ndim == 1:
            prompt = jnp.broadcast_to(prompt[None], (b, prompt.shape[0]))
        cross_kv = self._cross_kv(params, memory)

        def init_dec_cache(bb, max_len):
            return [self.dec_attn.init_cache(bb, max_len, c.d_model)
                    for _ in range(c.num_decoder_layers)]

        def decode_step(params, tokens, dec, aux):
            y = self._embed_tgt(params, tokens, offset=dec[0]["index"])
            y, dec = self._decoder_stack(params, y, aux["mem"], False,
                                         None, caches=dec, decode=True,
                                         cross_kv=aux["ckv"])
            return self._head(params, y), dec

        return encdec_beam_search(
            init_dec_cache, decode_step, params, b, 0, steps, beam_size,
            memory, eos_id=eos_id, alpha=alpha, prompt=prompt,
            aux_extra={"ckv": cross_kv})

    def transcribe_long(self, params, mel, prompt_tokens, steps: int,
                        beam_size: int = 1, eos_id: int | None = None,
                        alpha: float = 0.0):
        """Long-form transcription: chunk ``mel`` [frames, n_mels] (one
        utterance, frames > the model's 30s window) into consecutive
        windows of ``2 * num_audio_positions`` frames (the last window
        zero-padded — Whisper's pad-to-30s convention), decode ALL windows
        in one batched beam/greedy decode, EOS-truncate each window's best
        hypothesis, and stitch. Returns (token list, per-window tokens)."""
        c = self.config
        win = 2 * c.num_audio_positions
        mel = jnp.asarray(mel)
        assert mel.ndim == 2, "transcribe_long takes ONE utterance " \
                              "[frames, n_mels]"
        n_win = max(1, -(-mel.shape[0] // win))
        pad = n_win * win - mel.shape[0]
        if pad:
            mel = jnp.pad(mel, ((0, pad), (0, 0)))
        chunks = mel.reshape(n_win, win, c.n_mels)
        if beam_size > 1:
            seqs, _ = self.beam_decode(params, chunks, prompt_tokens,
                                       steps, beam_size, eos_id=eos_id,
                                       alpha=alpha)
            toks = np.asarray(seqs[:, 0])            # best hypothesis
        else:
            toks = np.asarray(self.greedy_decode(params, chunks,
                                                 prompt_tokens, steps))
        per_window, stitched = [], []
        for row in toks:
            row = row.tolist()
            if eos_id is not None and eos_id in row:
                row = row[:row.index(eos_id)]
            per_window.append(row)
            stitched.extend(row)
        return stitched, per_window
