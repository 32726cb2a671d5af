"""Multi-head attention module (full MHA + GQA + KV-cache decode).

Reference parity: /root/reference/layers/attentions.py.
- Self-attention defaulting: ``key <- query``, ``value <- key``
  (attentions.py:27-30, 73-76).
- Mask semantics: boolean [batch, heads, sq, skv], True = attend
  (attentions.py:106-107) — and unlike the reference, the masked *backward*
  works (closes the NotImplementedError at attentions.py:152-153).
- GQA (num_kv_heads < num_heads): first-class (reference test-only,
  attentions_test.py:267-358).
- KV-cache decode: closes the reference's ``TODO: support cache``
  (transformer.py:120).

Param layout matches Flax MultiHeadDotProductAttention so tests can bind
Flax weights directly: wq/wk/wv: [d_model, heads, head_dim];
bq/bk/bv: [heads, head_dim]; wo: [heads, head_dim, d_out]; bo: [d_out].
The attention core runs as the Pallas flash kernel (ops/attention.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.nn import initializers
from np_modeling_tpu.nn.module import Module, maybe_cast


# Fuse the self-attention q/k/v projections into one matmul. Same-process
# A/B on the headline GPT train step (bench_probe.ab, b8 s2048 d1024 bf16):
# fused is 0.912x — the per-step weight concat + backward splits cost more
# than the saved input reads, so it stays OFF (XLA already pipelines the
# three separate gemms well).
FUSED_QKV = False


@dataclasses.dataclass
class MultiHeadAttention(Module):
    num_heads: int
    num_kv_heads: Optional[int] = None   # GQA; defaults to num_heads
    head_dim: Optional[int] = None       # defaults to features // num_heads
    causal: bool = False
    window: Optional[int] = None         # sliding-window width (causal only)
    rope: bool = False                   # rotary position embeddings on q/k
    rope_base: float = 10000.0
    rope_dim: Optional[int] = None       # partial rotary (GPT-NeoX / Phi)
    rope_scaling: Optional[tuple] = None  # ("linear", f) | ("llama3", f,
                                          # low, high, orig) — long-context
                                          # frequency scaling
    use_bias: bool = True                # False: LLaMA-style biasless q/k/v/o
    qkv_bias: object = None              # override for q/k/v only (Qwen2:
                                         # qkv biased, o/FFN biasless)
    kernel_init: Callable = initializers.lecun_normal
    bias_init: Callable = initializers.zeros
    attn_scale: Optional[float] = None   # score scale; None = 1/sqrt(dk)
                                         # (T5 uses 1.0 — unscaled scores)
    attn_softcap: Optional[float] = None  # Gemma-2 logit soft-capping:
                                          # cap*tanh(s/cap) on the scaled
                                          # scores, inside the kernels
    qk_norm: bool = False                 # Qwen3: per-head RMSNorm over
                                          # head_dim on q and k, BEFORE RoPE
    qk_norm_eps: float = 1e-6
    attn_sinks: bool = False              # gpt-oss: per-head learnable
                                          # attention-sink logits (a
                                          # virtual no-value key)
    dtype: Optional[Any] = None           # compute dtype (mixed precision)
    attn_impl: Optional[Callable] = None  # override the attention core for
                                          # the non-decode path, e.g. a
                                          # context-parallel ring:
                                          # parallel.make_context_parallel_
                                          # attention(mesh, 'sp', causal=..)
                                          # — called as f(q, k, v,
                                          # segment_ids=); causal/window are
                                          # baked in at construction

    def _dims(self, features):
        hq = self.num_heads
        hkv = self.num_kv_heads or hq
        dk = self.head_dim or features // hq
        assert hq % hkv == 0
        return hq, hkv, dk

    def init(self, key, query, key_=None, value=None):
        # Lazy shape inference from example inputs (reference
        # attentions.py:17-65 semantics, explicit pytree output).
        kv_src = key_ if key_ is not None else query
        d_q = query.shape[-1]
        d_kv = kv_src.shape[-1]
        hq, hkv, dk = self._dims(d_q)
        ks = jax.random.split(key, 8)
        params = {
            "wq": self.kernel_init(ks[0], (d_q, hq, dk)),
            "wk": self.kernel_init(ks[1], (d_kv, hkv, dk)),
            "wv": self.kernel_init(ks[2], (d_kv, hkv, dk)),
            "wo": self.kernel_init(ks[3], (hq, dk, d_q)),
        }
        qkv_bias = (self.use_bias if self.qkv_bias is None
                    else self.qkv_bias)
        if qkv_bias:
            params.update({
                "bq": self.bias_init(ks[4], (hq, dk)),
                "bk": self.bias_init(ks[5], (hkv, dk)),
                "bv": self.bias_init(ks[6], (hkv, dk)),
            })
        if self.use_bias:
            params["bo"] = self.bias_init(ks[7], (d_q,))
        if self.qk_norm:
            params["q_norm"] = {"gamma": initializers.ones(
                jax.random.fold_in(key, 31), (dk,))}
            params["k_norm"] = {"gamma": initializers.ones(
                jax.random.fold_in(key, 32), (dk,))}
        if self.attn_sinks:
            params["sinks"] = jnp.zeros((hq,), jnp.float32)
        return params

    def _apply_qk_norm(self, params, q, k):
        """Per-head RMSNorm on q/k over head_dim (Qwen3) — stats in fp32
        (framework invariant), result back in compute dtype."""
        qn = ops.rms_norm(q.astype(jnp.float32),
                          params["q_norm"]["gamma"], self.qk_norm_eps)
        kn = ops.rms_norm(k.astype(jnp.float32),
                          params["k_norm"]["gamma"], self.qk_norm_eps)
        return qn.astype(q.dtype), kn.astype(k.dtype)

    def _project_qkv(self, x, params):
        """Fused self-attention projection: [b,s,d] @ [d, (hq+2*hkv)*dk]."""
        d = params["wq"].shape[0]
        hq, hkv, dk = (params["wq"].shape[1], params["wk"].shape[1],
                       params["wq"].shape[2])
        w = jnp.concatenate([params[n].reshape(d, -1)
                             for n in ("wq", "wk", "wv")], axis=1)
        # Biasless configs (use_bias=False / qkv_bias=False) have no bq/bk/bv
        # at all — mirror _project's params.get(...) handling.
        if all(params.get(n) is not None for n in ("bq", "bk", "bv")):
            b = jnp.concatenate([params[n].reshape(-1)
                                 for n in ("bq", "bk", "bv")])
        else:
            b = None
        x, w, b = (maybe_cast(a, self.dtype) for a in (x, w, b))
        y = ops.linear(x, w, b)
        qf, kf, vf = jnp.split(y, [hq * dk, (hq + hkv) * dk], axis=-1)
        to_heads = lambda t, h: jnp.swapaxes(
            t.reshape(*t.shape[:-1], h, dk), -3, -2)
        return to_heads(qf, hq), to_heads(kf, hkv), to_heads(vf, hkv)

    def _project(self, x, w, b):
        # [b, s, d] @ [d, h, dk] -> [b, h, s, dk]; uses ops.linear (manual VJP)
        # on the flattened head dims, so the MXU matmul kernel is reused.
        x, w, b = (maybe_cast(a, self.dtype) for a in (x, w, b))
        d, h, dk = w.shape
        y = ops.linear(x, w.reshape(d, h * dk),
                       b.reshape(h * dk) if b is not None else None)
        y = y.reshape(*x.shape[:-1], h, dk)
        return jnp.swapaxes(y, -3, -2)

    def apply(self, params, query, key=None, value=None, mask=None,
              training=False, rngs=None, cache=None, decode=False,
              collect_kv=False, segment_ids=None, positions=None,
              bias=None, precomputed_kv=None):
        """``collect_kv=True`` additionally returns the projected (k, v)
        ([b, hkv, s, dk]) — used by serving prefill to seed paged caches.
        ``bias``: additive score bias [b|1, h, sq, skv] (T5 relative
        position / ALiBi), streamed into the flash kernels.
        ``precomputed_kv``: (k, v) already projected to [b, hkv, s, dk] —
        cross-attention decode projects the (static) encoder memory ONCE
        instead of once per generated token; qk_norm/RoPE are assumed to
        have been applied at projection time (they are position-of-the-
        MEMORY transforms, not of the query)."""
        del training, rngs
        if key is None:
            key = query
        if value is None:
            value = key

        if precomputed_kv is not None:
            assert cache is None and not collect_kv
            q = self._project(query, params["wq"], params.get("bq"))
            k, v = precomputed_kv
            if self.qk_norm:
                q = ops.rms_norm(q.astype(jnp.float32),
                                 params["q_norm"]["gamma"],
                                 self.qk_norm_eps).astype(q.dtype)
            o = ops.flash_attention(q, k, v, mask=mask, bias=bias,
                                    segment_ids=segment_ids,
                                    causal=self.causal, window=self.window,
                                    scale=self.attn_scale,
                                    softcap=self.attn_softcap,
                                    sinks=params.get("sinks"))
            o = jnp.swapaxes(o, -3, -2)
            wo = maybe_cast(params["wo"], self.dtype)
            bo = maybe_cast(params.get("bo"), self.dtype)
            hq, dk, d_out = wo.shape
            o = o.reshape(*o.shape[:-2], hq * dk)
            return ops.linear(o, wo.reshape(hq * dk, d_out), bo)

        if FUSED_QKV and key is query and value is query:
            # Self-attention: ONE fused qkv matmul (x is read once; the
            # weight concat folds into the gemm) instead of three.
            q, k, v = self._project_qkv(query, params)
        else:
            q = self._project(query, params["wq"], params.get("bq"))
            k = self._project(key, params["wk"], params.get("bk"))
            v = self._project(value, params["wv"], params.get("bv"))

        if self.qk_norm:
            q, k = self._apply_qk_norm(params, q, k)

        if self.rope:
            from np_modeling_tpu.ops.rope import apply_rope
            if decode:
                idx = cache["index"]
                if idx.ndim:          # per-row write positions -> [b, s]
                    positions = idx[:, None] + jnp.arange(q.shape[2])
                else:
                    positions = idx + jnp.arange(q.shape[2])
            elif positions is None:
                positions = jnp.arange(q.shape[2])
            q = apply_rope(q, positions, self.rope_base, self.rope_dim,
                           self.rope_scaling)
            k = apply_rope(k, positions, self.rope_base, self.rope_dim,
                           self.rope_scaling)

        new_cache = None
        if decode:
            if cache is None:
                raise ValueError("decode=True requires a cache; build one "
                                 "with init_cache()")
            k, v, mask, new_cache = self._update_cache(cache, k, v)
            o = ops.flash_attention(q, k, v, mask=mask, bias=bias,
                                    causal=False, scale=self.attn_scale,
                                    softcap=self.attn_softcap,
                                    sinks=params.get("sinks"))
        elif self.attn_impl is not None:
            assert mask is None and bias is None, (
                "attn_impl overrides (e.g. ring attention) take structural "
                "masking at construction; explicit masks/biases are "
                "unsupported")
            assert (self.attn_scale is None and self.attn_softcap is None
                    and not self.attn_sinks), (
                "attn_impl overrides bake their own score scale/softcap/"
                "sinks; set them at the override's construction")
            o = self.attn_impl(q, k, v, segment_ids=segment_ids)
        else:
            o = ops.flash_attention(q, k, v, mask=mask, bias=bias,
                                    segment_ids=segment_ids,
                                    causal=self.causal, window=self.window,
                                    scale=self.attn_scale,
                                    softcap=self.attn_softcap,
                                    sinks=params.get("sinks"))

        # [b, h, s, dk] -> [b, s, h*dk] -> out projection.
        o = jnp.swapaxes(o, -3, -2)
        wo = maybe_cast(params["wo"], self.dtype)
        bo = maybe_cast(params.get("bo"), self.dtype)
        hq, dk, d_out = wo.shape
        o = o.reshape(*o.shape[:-2], hq * dk)
        out = ops.linear(o, wo.reshape(hq * dk, d_out), bo)
        if decode:
            return out, new_cache
        if collect_kv:
            return out, (k, v)
        return out

    # ---- KV-cache decode path ------------------------------------------

    def init_cache(self, batch, max_len, features, dtype=jnp.float32):
        hq, hkv, dk = self._dims(features)
        return {
            "k": jnp.zeros((batch, hkv, max_len, dk), dtype),
            "v": jnp.zeros((batch, hkv, max_len, dk), dtype),
            "index": jnp.zeros((), jnp.int32),
        }

    def _update_cache(self, cache, k_new, v_new):
        """Insert the step's k/v at cache['index']; mask future positions.

        ``index`` may be a scalar (all rows share one write position — the
        standard generate/beam path) or per-row ``[b]`` (rows at divergent
        lengths — batched speculative decoding's per-row rollback)."""
        idx = cache["index"]
        s_new = k_new.shape[2]
        max_len = cache["k"].shape[2]
        q_iota = jax.lax.broadcasted_iota(jnp.int32, (s_new, max_len), 0)
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (s_new, max_len), 1)
        if idx.ndim == 0:
            k = jax.lax.dynamic_update_slice(
                cache["k"], k_new.astype(cache["k"].dtype), (0, 0, idx, 0))
            v = jax.lax.dynamic_update_slice(
                cache["v"], v_new.astype(cache["v"].dtype), (0, 0, idx, 0))
            # Query position i (of this step) attends to slots <= idx+i.
            q_pos = idx + q_iota
            keep = kv_pos <= q_pos
            if self.window is not None:
                keep = keep & (kv_pos > q_pos - self.window)
            mask = keep[None, None]                       # [1, 1, s, L]
        else:
            upd = lambda c, n, i: jax.lax.dynamic_update_slice(
                c, n.astype(c.dtype), (0, i, 0))
            k = jax.vmap(upd)(cache["k"], k_new, idx)     # per-row offset
            v = jax.vmap(upd)(cache["v"], v_new, idx)
            q_pos = idx[:, None, None] + q_iota[None]     # [b, s, L]
            keep = kv_pos[None] <= q_pos
            if self.window is not None:
                keep = keep & (kv_pos[None] > q_pos - self.window)
            mask = keep[:, None]                          # [b, 1, s, L]
        new_cache = {"k": k, "v": v, "index": idx + s_new}
        return k, v, mask, new_cache
