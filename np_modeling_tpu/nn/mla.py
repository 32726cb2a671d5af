"""MLA: multi-head latent attention (DeepSeek-V2) with an absorbed,
latent-cache decode path.

MLA factors the KV projection through a small latent: per token the cache
holds only ``kv_lora_rank + qk_rope_head_dim`` numbers (c_kv and a SHARED
rope key), instead of ``2 * num_heads * head_dim`` — the defining modern
serving memory optimization (DeepSeek-V2). Structure:

- q: optional low-rank path (q_a -> RMSNorm -> q_b), split per head into
  a no-position part (``qk_nope_head_dim``) and a rotary part
  (``qk_rope_head_dim``).
- kv: ``kv_a`` projects x to [kv_lora_rank + rope]; the latent c_kv is
  RMSNorm'd, the rope part k_pe is shared across heads (MQA-style).
  ``kv_b`` expands c_kv to per-head (k_nope, v).
- scores: (q_nope . k_nope + q_pe . k_pe) * (nope+rope)**-0.5.

TPU mapping:
- TRAIN/PREFILL: one flash-attention call on concatenated features —
  score = concat(q_nope, q_pe) . concat(k_nope, k_pe) exactly, so the
  whole thing rides the existing Pallas kernels (v is zero-padded to the
  qk head dim; zero columns drop out of p@v).
- DECODE (absorbed): the cache stores concat(c_kv, k_pe) ONLY. k_nope
  never materializes: q_nope is absorbed through kv_b's k-half
  (q_abs = q_nope @ Wk_b^T, so q_abs . c_kv == q_nope . k_nope), making
  decode an MQA with kv dim rank+rope; the attention output in latent
  space (p @ c_kv) is expanded per head through kv_b's v-half. Exact
  (linear-algebra identity) up to fp reassociation.

Reference lineage: the reference has one dense MHA
(/root/reference/layers/attentions.py); MLA is the capability extension
the same way GQA was (SURVEY.md §2.2).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.nn import initializers
from np_modeling_tpu.nn.module import Module, maybe_cast


@dataclasses.dataclass
class MLAttention(Module):
    """DeepSeek-V2 attention. Param layout (all biasless):

    - ``wq`` [d, hq, nope+rope]            (q_lora_rank is None), or
      ``q_a`` [d, q_rank] + ``q_a_norm`` + ``q_b`` [q_rank, hq, nope+rope]
    - ``kv_a`` [d, rank+rope], ``kv_a_norm`` gamma [rank]
    - ``kv_b`` [rank, hq, nope+v]
    - ``wo`` [hq, v, d]
    """

    num_heads: int
    kv_lora_rank: int = 512
    q_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    rope_base: float = 10000.0
    rope_scaling: Optional[tuple] = None
    ln_eps: float = 1e-6
    causal: bool = True
    dtype: Optional[Any] = None
    kernel_init: Any = initializers.lecun_normal

    # Signature-compat fields (TransformerEncoderBlock reads these).
    rope: bool = True
    window = None
    attn_scale = None
    attn_softcap = None
    qk_norm = False

    @property
    def qk_head_dim(self):
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    def init(self, key, query, key_=None, value=None):
        del key_, value
        d = query.shape[-1]
        hq = self.num_heads
        ks = jax.random.split(key, 6)
        params = {
            "kv_a": self.kernel_init(
                ks[0], (d, self.kv_lora_rank + self.qk_rope_head_dim)),
            "kv_a_norm": {"gamma": initializers.ones(
                ks[1], (self.kv_lora_rank,))},
            "kv_b": self.kernel_init(
                ks[2], (self.kv_lora_rank, hq,
                        self.qk_nope_head_dim + self.v_head_dim)),
            "wo": self.kernel_init(ks[3], (hq, self.v_head_dim, d)),
        }
        if self.q_lora_rank is None:
            params["wq"] = self.kernel_init(ks[4], (d, hq, self.qk_head_dim))
        else:
            params["q_a"] = self.kernel_init(ks[4], (d, self.q_lora_rank))
            params["q_a_norm"] = {"gamma": initializers.ones(
                jax.random.fold_in(key, 7), (self.q_lora_rank,))}
            params["q_b"] = self.kernel_init(
                ks[5], (self.q_lora_rank, hq, self.qk_head_dim))
        return params

    # ---- shared projections ------------------------------------------------

    def _q_heads(self, params, x):
        """x [b, s, d] -> q [b, hq, s, nope+rope]."""
        if self.q_lora_rank is None:
            w = maybe_cast(params["wq"], self.dtype)
            d, hq, dk = w.shape
            y = ops.linear(maybe_cast(x, self.dtype), w.reshape(d, hq * dk),
                           None)
        else:
            a = ops.linear(maybe_cast(x, self.dtype),
                           maybe_cast(params["q_a"], self.dtype), None)
            a = ops.rms_norm(a.astype(jnp.float32),
                             params["q_a_norm"]["gamma"], self.ln_eps)
            w = maybe_cast(params["q_b"], self.dtype)
            qr, hq, dk = w.shape
            y = ops.linear(maybe_cast(a, self.dtype), w.reshape(qr, hq * dk),
                           None)
        y = y.reshape(*x.shape[:-1], self.num_heads, self.qk_head_dim)
        return jnp.swapaxes(y, -3, -2)

    def _latent(self, params, x):
        """x -> (c_kv [b, 1, s, rank] RMSNorm'd, k_pe [b, 1, s, rope] raw)."""
        y = ops.linear(maybe_cast(x, self.dtype),
                       maybe_cast(params["kv_a"], self.dtype), None)
        c, k_pe = jnp.split(y, [self.kv_lora_rank], axis=-1)
        c = ops.rms_norm(c.astype(jnp.float32), params["kv_a_norm"]["gamma"],
                         self.ln_eps)
        c = maybe_cast(c, self.dtype)
        return c[:, None], k_pe[:, None]          # add the hkv=1 head axis

    def _expand_kv(self, params, c):
        """c [b, 1, s, rank] -> (k_nope, v) each [b, hq, s, .]."""
        w = maybe_cast(params["kv_b"], self.dtype)
        kv = jnp.einsum("bosr,rhd->bhsd", c, w)
        return jnp.split(kv, [self.qk_nope_head_dim], axis=-1)

    def _out(self, params, o):
        """o [b, hq, s, v] -> [b, s, d] via wo."""
        o = jnp.swapaxes(o, -3, -2)
        wo = maybe_cast(params["wo"], self.dtype)
        hq, v, d = wo.shape
        o = o.reshape(*o.shape[:-2], hq * v)
        return ops.linear(o, wo.reshape(hq * v, d), None)

    # ---- forward -----------------------------------------------------------

    def apply(self, params, query, key=None, value=None, mask=None,
              training=False, rngs=None, cache=None, decode=False,
              collect_kv=False, segment_ids=None, positions=None,
              bias=None):
        del training, rngs
        assert key is None and value is None and bias is None, (
            "MLA is a self-attention form")
        assert not collect_kv, (
            "MLA serving caches latents, not per-head K/V — the paged "
            "engine path is not wired for MLA")
        x = query
        scale = 1.0 / math.sqrt(self.qk_head_dim)

        q = self._q_heads(params, x)              # [b, hq, s, nope+rope]
        q_nope, q_pe = jnp.split(q, [self.qk_nope_head_dim], axis=-1)
        c, k_pe = self._latent(params, x)

        if decode:
            return self._decode(params, q_nope, q_pe, c, k_pe, cache, scale)

        if positions is None:
            positions = jnp.arange(x.shape[-2])
        q_pe = ops.apply_rope(q_pe, positions, self.rope_base, None,
                              self.rope_scaling)
        k_pe = ops.apply_rope(k_pe, positions, self.rope_base, None,
                              self.rope_scaling)
        q = jnp.concatenate([q_nope, q_pe], axis=-1)   # roped q_pe back in
        k_nope, v = self._expand_kv(params, c)
        k_full = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (*k_nope.shape[:-1],
                                             self.qk_rope_head_dim))],
            axis=-1)
        # Zero-pad v to the qk head dim so ONE flash kernel serves both
        # matmuls; the padded output columns are exactly zero.
        v_pad = jnp.pad(v, ((0, 0),) * 3
                        + ((0, self.qk_head_dim - self.v_head_dim),))
        o = ops.flash_attention(q, k_full, v_pad, mask=mask,
                                segment_ids=segment_ids, causal=self.causal,
                                scale=scale)
        return self._out(params, o[..., :self.v_head_dim])

    # ---- absorbed latent-cache decode ---------------------------------------

    def init_cache(self, batch, max_len, features, dtype=jnp.float32):
        del features
        width = self.kv_lora_rank + self.qk_rope_head_dim
        return {"k": jnp.zeros((batch, 1, max_len, width), dtype),
                "index": jnp.zeros((), jnp.int32)}

    def _decode(self, params, q_nope, q_pe, c, k_pe, cache, scale):
        assert cache is not None, "decode=True requires init_cache()"
        idx = cache["index"]
        s_new = q_pe.shape[2]
        positions = idx + jnp.arange(s_new)
        q_pe = ops.apply_rope(q_pe, positions, self.rope_base, None,
                              self.rope_scaling)
        k_pe = ops.apply_rope(k_pe, positions, self.rope_base, None,
                              self.rope_scaling)

        k_new = jnp.concatenate([c, k_pe], axis=-1)   # [b, 1, s, rank+rope]
        k = jax.lax.dynamic_update_slice(
            cache["k"], k_new.astype(cache["k"].dtype), (0, 0, idx, 0))
        new_cache = {"k": k, "index": idx + s_new}

        # Absorb kv_b's k-half into q: q_abs . c_kv == q_nope . k_nope.
        wk = maybe_cast(params["kv_b"][:, :, :self.qk_nope_head_dim],
                        self.dtype)                   # [rank, hq, nope]
        q_abs = jnp.einsum("bhsn,rhn->bhsr", q_nope, wk)
        q_eff = jnp.concatenate([q_abs, q_pe], axis=-1)

        max_len = k.shape[2]
        q_iota = jax.lax.broadcasted_iota(jnp.int32, (s_new, max_len), 0)
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (s_new, max_len), 1)
        mask = (kv_pos <= idx + q_iota)[None, None]

        # MQA over the latent: v IS the cache row — p @ concat(c, k_pe)'s
        # first rank columns equal p @ c (the latent attention output).
        # Short-q decode rides the jnp path, which allows v's trailing dim
        # to differ from q/k's.
        o = ops.flash_attention(q_eff, k, k, mask=mask, causal=False,
                                scale=scale)
        o_lat = o[..., :self.kv_lora_rank]
        wv = maybe_cast(params["kv_b"][:, :, self.qk_nope_head_dim:],
                        self.dtype)                   # [rank, hq, v]
        o_heads = jnp.einsum("bhsr,rhv->bhsv",
                             o_lat.astype(wv.dtype), wv)
        return self._out(params, o_heads), new_cache
