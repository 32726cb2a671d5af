"""Transformer encoder/decoder blocks and stacks.

Reference parity: /root/reference/layers/transformer.py.
- Block structure and residual/norm/dropout ORDER match the reference exactly
  (dropout applied BEFORE the norm in the pre-norm path, transformer.py:36-38;
  attention block then 2-layer FFN Dense(ReLU)->Linear, transformer.py:49-52).
- The reference reshapes to 2-D for the FFN because its Dense is 2-D-only
  (transformer.py:44-45); our Linear handles batched dims natively.
- Decoder adds cross-attention (transformer.py:139) and — new here — a causal
  flag for the self-attention (the reference decoder is unmasked) plus a
  KV-cache decode path (closing ``TODO: support cache``, transformer.py:120).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.nn import initializers
from np_modeling_tpu.nn.attention import MultiHeadAttention
from np_modeling_tpu.nn.linear import (Dense, Dropout, LayerNorm, Linear,
                                       RMSNorm)
from np_modeling_tpu.nn.module import Module, maybe_cast, split_rngs


@dataclasses.dataclass
class TransformerEncoderBlock(Module):
    num_heads: int
    hidden_units: int
    norm_first: bool
    drop_rate: float = 0.0
    causal: bool = False            # GPT-style decoder-only blocks set True
    num_kv_heads: Optional[int] = None
    dtype: Optional[object] = None  # compute dtype (mixed precision)
    moe_experts: int = 0            # >0: FFN becomes a routed MoE
    moe_top_k: int = 2              # 2 = GShard, 1 = Switch routing
    moe_capacity_factor: Optional[float] = 1.25  # None = no-drop routing
    moe_router_weights: str = "default"  # see nn.MoE.router_weights
    moe_routed_scaling: float = 1.0
    moe_shared_units: int = 0       # DeepSeek always-on shared experts
    moe_router_groups: object = None  # (n_group, topk_group) group-limited
    moe_router_score: str = "softmax"  # "softmax" | "sigmoid" (DeepSeek-V3)
    moe_router_select_bias: bool = False  # DeepSeek-V3 noaux-tc bias
    moe_group_metric: str = "max"   # "max" | "top2sum" (DeepSeek-V3)
    moe_hidden_units: Optional[int] = None  # expert FFN width (DeepSeek's
                                    # moe_intermediate_size differs from
                                    # the dense layers' intermediate_size)
    rope: bool = False              # rotary position embeddings
    window: Optional[int] = None    # sliding-window attention (causal only)
    activation: object = "relu"     # FFN activation (reference default ReLU)
    ln_eps: float = 1e-3            # LayerNorm/RMSNorm epsilon
    norm: str = "layer"             # "layer" | "rms" (LLaMA-style)
    ffn: str = "mlp"                # "mlp" (Dense->Linear) | "swiglu"
                                    # (silu-gated) | "geglu" (gelu-gated)
    use_bias: bool = True           # False: biasless attention + FFN
    qkv_bias: object = None         # override q/k/v bias only (Qwen2)
    rms_offset: bool = False        # RMSNorm scales by (1 + w) (Gemma)
    head_dim: Optional[int] = None  # decouple from d_model // num_heads
    parallel_residual: bool = False     # x + attn(n1(x)) + ffn(n2(x))
                                    # (GPT-J / GPT-NeoX / Phi form)
    parallel_shared_norm: bool = False  # Phi: norm1 feeds BOTH branches
    attn_scale: Optional[float] = None  # score scale override (Gemma-2
                                    # query_pre_attn_scalar**-0.5)
    attn_softcap: Optional[float] = None  # Gemma-2 logit soft-capping
    qk_norm: bool = False           # Qwen3: per-head RMSNorm on q/k
    attn_sinks: bool = False        # gpt-oss: per-head sink logits
    moe_router_bias: bool = False   # gpt-oss: biased router linear
    mla: Optional[dict] = None      # DeepSeek-V2 multi-head latent
                                    # attention: dict of MLAttention dims
                                    # (kv_lora_rank, q_lora_rank,
                                    # qk_nope/rope_head_dim, v_head_dim)
                                    # — replaces MultiHeadAttention
    sandwich_norm: bool = False     # Gemma-2: a SECOND norm on each
                                    # sublayer OUTPUT before its residual
                                    # add (post_norm1 / post_norm2)

    def __post_init__(self):
        if self.mla is not None:
            from np_modeling_tpu.nn.mla import MLAttention
            assert (self.window is None and self.attn_softcap is None
                    and not self.qk_norm and not self.sandwich_norm), (
                "MLA composes with none of: sliding windows, softcap, "
                "qk_norm, sandwich_norm (they would be silently dropped)")
            self.attn = MLAttention(self.num_heads, causal=self.causal,
                                    dtype=self.dtype, ln_eps=self.ln_eps,
                                    **self.mla)
        else:
            self.attn = MultiHeadAttention(self.num_heads, self.num_kv_heads,
                                           head_dim=self.head_dim,
                                           causal=self.causal,
                                           dtype=self.dtype,
                                           rope=self.rope, window=self.window,
                                           use_bias=self.use_bias,
                                           qkv_bias=self.qkv_bias,
                                           attn_scale=self.attn_scale,
                                           attn_softcap=self.attn_softcap,
                                           qk_norm=self.qk_norm,
                                           qk_norm_eps=self.ln_eps
                                           if self.qk_norm else 1e-6,
                                           attn_sinks=self.attn_sinks)
        if self.parallel_residual:
            assert self.norm_first, "parallel residual is a pre-norm form"
        if self.parallel_shared_norm:
            assert self.parallel_residual, (
                "parallel_shared_norm only makes sense with "
                "parallel_residual (Phi-style block)")
        if self.sandwich_norm:
            assert self.norm_first and not self.parallel_residual, (
                "sandwich_norm is a pre-norm sequential-block form")
        if self.norm == "rms":
            self.norm1 = RMSNorm(epsilon=self.ln_eps,
                                 offset=self.rms_offset)
            self.norm2 = RMSNorm(epsilon=self.ln_eps,
                                 offset=self.rms_offset)
        else:
            self.norm1 = LayerNorm(epsilon=self.ln_eps)
            self.norm2 = LayerNorm(epsilon=self.ln_eps)
        if self.sandwich_norm:
            if self.norm == "rms":
                self.post_norm1 = RMSNorm(epsilon=self.ln_eps,
                                          offset=self.rms_offset)
                self.post_norm2 = RMSNorm(epsilon=self.ln_eps,
                                          offset=self.rms_offset)
            else:
                self.post_norm1 = LayerNorm(epsilon=self.ln_eps)
                self.post_norm2 = LayerNorm(epsilon=self.ln_eps)
        if self.moe_experts:
            from np_modeling_tpu.nn.moe import MoE
            self.moe = MoE(self.moe_experts,
                           self.moe_hidden_units or self.hidden_units,
                           capacity_factor=self.moe_capacity_factor,
                           router_top_k=self.moe_top_k,
                           activation=self.activation, ffn=self.ffn,
                           router_weights=self.moe_router_weights,
                           routed_scaling=self.moe_routed_scaling,
                           shared_experts_units=self.moe_shared_units,
                           router_groups=self.moe_router_groups,
                           router_bias=self.moe_router_bias,
                           router_score=self.moe_router_score,
                           router_select_bias=self.moe_router_select_bias,
                           router_group_metric=self.moe_group_metric)
        elif self.ffn == "mlp":
            self.dense1 = Dense(self.hidden_units, dtype=self.dtype,
                                activation=self.activation,
                                use_bias=self.use_bias)
        else:
            assert self.ffn in ("swiglu", "geglu"), self.ffn
        self.drop = Dropout(self.drop_rate)

    def init(self, key, x):
        ks = jax.random.split(key, 6)
        params = {
            "self_attention": self.attn.init(ks[0], x),
            "norm1": self.norm1.init(ks[1], x),
        }
        if not self.parallel_shared_norm:
            params["norm2"] = self.norm2.init(ks[2], x)
        if self.sandwich_norm:
            params["post_norm1"] = self.post_norm1.init(
                jax.random.fold_in(key, 101), x)
            params["post_norm2"] = self.post_norm2.init(
                jax.random.fold_in(key, 102), x)
        if self.moe_experts:
            params["moe"] = self.moe.init(ks[3], x)
        elif self.ffn in ("swiglu", "geglu"):
            d, h = x.shape[-1], self.hidden_units
            params["swiglu"] = {
                "w_gate": initializers.lecun_normal(ks[3], (d, h)),
                "w_up": initializers.lecun_normal(ks[4], (d, h)),
                "w_down": initializers.lecun_normal(ks[5], (h, d)),
            }
        else:
            h1 = self.dense1.init(ks[3], x)
            features = x.shape[-1]
            dense2 = Linear(features, dtype=self.dtype,
                            use_bias=self.use_bias)  # lazily sized
            hidden = self.dense1.apply(h1, x)
            params["dense1"] = h1
            params["dense2"] = dense2.init(ks[4], hidden)
        return params

    def _ffn(self, params, y, features):
        """The feed-forward sub-block (mlp / swiglu; LLaMA uses swiglu:
        ``w_down @ (silu(x @ w_gate) * (x @ w_up))``, biasless)."""
        if self.ffn in ("swiglu", "geglu"):
            act = ops.silu if self.ffn == "swiglu" else ops.gelu
            sp = params["swiglu"]
            yc = maybe_cast(y, self.dtype)
            gate = act(ops.linear(yc, maybe_cast(sp["w_gate"],
                                                 self.dtype), None))
            up = ops.linear(yc, maybe_cast(sp["w_up"], self.dtype), None)
            return ops.linear(gate * up, maybe_cast(sp["w_down"],
                                                    self.dtype), None)
        y = self.dense1.apply(params["dense1"], y)
        dense2 = Linear(features, dtype=self.dtype,
                        use_bias=self.use_bias)
        return dense2.apply(params["dense2"], y)

    def apply(self, params, x, mask=None, training=False, rngs=None,
              cache=None, decode=False, collect_kv=False,
              collect_aux=False, segment_ids=None, positions=None):
        features = x.shape[-1]
        new_cache = None
        kv = None
        aux = jnp.zeros((), jnp.float32)

        if self.parallel_residual:
            # GPT-J / GPT-NeoX / Phi form: the attention and FFN branches
            # both read the BLOCK INPUT and sum into one residual:
            # out = x + attn(norm1(x)) + ffn(norm2(x))   (NeoX: two norms)
            # out = x + attn(n(x)) + ffn(n(x))           (Phi: shared norm)
            h = self.drop.apply({}, x, training, rngs, salt=1)
            a_in = self.norm1.apply(params["norm1"], h)
            if decode:
                y, new_cache = self.attn.apply(params["self_attention"],
                                               a_in, mask=mask, cache=cache,
                                               decode=True)
            elif collect_kv:
                y, kv = self.attn.apply(params["self_attention"], a_in,
                                        mask=mask, collect_kv=True)
            else:
                y = self.attn.apply(params["self_attention"], a_in,
                                    mask=mask, segment_ids=segment_ids,
                                    positions=positions)
            f_in = (a_in if self.parallel_shared_norm
                    else self.norm2.apply(params["norm2"], h))
            if self.moe_experts:
                z, aux = self.moe.apply_with_aux(params["moe"], f_in)
            else:
                z = self._ffn(params, f_in, features)
            out = x + y + z
            if decode:
                return out, new_cache
            if collect_kv:
                return out, kv
            if collect_aux:
                return out, aux
            return out

        skip = x
        if self.norm_first:
            x = self.drop.apply({}, x, training, rngs, salt=1)
            x = self.norm1.apply(params["norm1"], x)
        if decode:
            y, new_cache = self.attn.apply(params["self_attention"], x,
                                           mask=mask, cache=cache, decode=True)
        elif collect_kv:
            y, kv = self.attn.apply(params["self_attention"], x, mask=mask,
                                    collect_kv=True)
        else:
            y = self.attn.apply(params["self_attention"], x, mask=mask,
                                segment_ids=segment_ids,
                                positions=positions)
        if self.sandwich_norm:
            y = self.post_norm1.apply(params["post_norm1"], y)
        y = y + skip
        if not self.norm_first:
            y = self.drop.apply({}, y, training, rngs, salt=1)
            y = self.norm1.apply(params["norm1"], y)

        skip = y
        if self.norm_first:
            y = self.drop.apply({}, y, training, rngs, salt=2)
            y = self.norm2.apply(params["norm2"], y)
        if self.moe_experts:
            y, aux = self.moe.apply_with_aux(params["moe"], y)
        else:
            y = self._ffn(params, y, features)
        if self.sandwich_norm:
            y = self.post_norm2.apply(params["post_norm2"], y)
        y = y + skip
        if not self.norm_first:
            y = self.drop.apply({}, y, training, rngs, salt=2)
            y = self.norm2.apply(params["norm2"], y)

        if decode:
            return y, new_cache
        if collect_kv:
            return y, kv
        if collect_aux:
            return y, aux
        return y

    def init_cache(self, batch, max_len, features, dtype=jnp.float32):
        return self.attn.init_cache(batch, max_len, features, dtype)


@dataclasses.dataclass
class TransformerDecoderBlock(Module):
    """Self-attention + cross-attention + FFN (reference transformer.py:95-203)."""

    num_heads: int
    hidden_units: int
    norm_first: bool
    drop_rate: float = 0.0
    causal: bool = False

    def __post_init__(self):
        self.self_attn = MultiHeadAttention(self.num_heads, causal=self.causal)
        self.cross_attn = MultiHeadAttention(self.num_heads)
        self.norm1 = LayerNorm()
        self.norm2 = LayerNorm()
        self.norm3 = LayerNorm()
        self.dense1 = Dense(self.hidden_units)
        self.drop = Dropout(self.drop_rate)

    def init(self, key, q, kv):
        ks = jax.random.split(key, 7)
        h1 = self.dense1.init(ks[5], q)
        features = q.shape[-1]
        hidden = self.dense1.apply(h1, q)
        return {
            "self_attention": self.self_attn.init(ks[0], q),
            "cross_attention": self.cross_attn.init(ks[1], q, kv),
            "norm1": self.norm1.init(ks[2], q),
            "norm2": self.norm2.init(ks[3], q),
            "norm3": self.norm3.init(ks[4], q),
            "dense1": h1,
            "dense2": Linear(features).init(ks[6], hidden),
        }

    def apply(self, params, q, kv, self_mask=None, cross_mask=None,
              training=False, rngs=None, cache=None, decode=False,
              cross_segment_ids=None):
        """``cross_segment_ids``: (q_seg [b, s_q], kv_seg [b, s_kv]) for
        cross-attention — e.g. (ones, src_valid) masks padded encoder
        memory inside the flash kernels (O(s) operands)."""
        dense2 = Linear(q.shape[-1])
        new_cache = None

        skip = q
        if self.norm_first:
            q = self.drop.apply({}, q, training, rngs, salt=1)
            q = self.norm1.apply(params["norm1"], q)
        if decode:
            y, new_cache = self.self_attn.apply(params["self_attention"], q,
                                                mask=self_mask, cache=cache,
                                                decode=True)
        else:
            y = self.self_attn.apply(params["self_attention"], q,
                                     mask=self_mask)
        y = y + skip
        if not self.norm_first:
            y = self.drop.apply({}, y, training, rngs, salt=1)
            y = self.norm1.apply(params["norm1"], y)

        skip = y
        if self.norm_first:
            y = self.drop.apply({}, y, training, rngs, salt=2)
            y = self.norm2.apply(params["norm2"], y)
        y = self.cross_attn.apply(params["cross_attention"], y, kv,
                                  mask=cross_mask,
                                  segment_ids=cross_segment_ids)
        y = y + skip
        if not self.norm_first:
            y = self.drop.apply({}, y, training, rngs, salt=2)
            y = self.norm2.apply(params["norm2"], y)

        skip = y
        if self.norm_first:
            y = self.drop.apply({}, y, training, rngs, salt=3)
            y = self.norm3.apply(params["norm3"], y)
        y = self.dense1.apply(params["dense1"], y)
        y = dense2.apply(params["dense2"], y)
        y = y + skip
        if not self.norm_first:
            y = self.drop.apply({}, y, training, rngs, salt=3)
            y = self.norm3.apply(params["norm3"], y)

        if decode:
            return y, new_cache
        return y

    def init_cache(self, batch, max_len, features, dtype=jnp.float32):
        return self.self_attn.init_cache(batch, max_len, features, dtype)


@dataclasses.dataclass
class TransformerEncoder(Module):
    """Stack of encoder blocks; params keyed ``layer_0..layer_{n-1}``."""

    num_layers: int
    num_heads: int
    hidden_units: int
    norm_first: bool = True
    drop_rate: float = 0.0
    causal: bool = False

    def __post_init__(self):
        self.block = TransformerEncoderBlock(
            self.num_heads, self.hidden_units, self.norm_first,
            self.drop_rate, self.causal)

    def init(self, key, x):
        return {f"layer_{i}": self.block.init(jax.random.fold_in(key, i), x)
                for i in range(self.num_layers)}

    def apply(self, params, x, mask=None, training=False, rngs=None,
              caches=None, decode=False, segment_ids=None):
        new_caches = [] if decode else None
        for i in range(self.num_layers):
            r = split_rngs(rngs, i)
            if decode:
                x, c = self.block.apply(params[f"layer_{i}"], x, mask=mask,
                                        training=training, rngs=r,
                                        cache=caches[i], decode=True)
                new_caches.append(c)
            else:
                x = self.block.apply(params[f"layer_{i}"], x, mask=mask,
                                     segment_ids=segment_ids,
                                     training=training, rngs=r)
        if decode:
            return x, new_caches
        return x

    def init_cache(self, batch, max_len, features, dtype=jnp.float32):
        return [self.block.init_cache(batch, max_len, features, dtype)
                for _ in range(self.num_layers)]


@dataclasses.dataclass
class TransformerDecoder(Module):
    """Stack of decoder blocks (self-attn + cross-attn + FFN)."""

    num_layers: int
    num_heads: int
    hidden_units: int
    norm_first: bool = True
    drop_rate: float = 0.0
    causal: bool = True

    def __post_init__(self):
        self.block = TransformerDecoderBlock(
            self.num_heads, self.hidden_units, self.norm_first,
            self.drop_rate, self.causal)

    def init(self, key, q, kv):
        return {f"layer_{i}": self.block.init(jax.random.fold_in(key, i),
                                              q, kv)
                for i in range(self.num_layers)}

    def apply(self, params, q, kv, self_mask=None, cross_mask=None,
              training=False, rngs=None, caches=None, decode=False,
              cross_segment_ids=None):
        new_caches = [] if decode else None
        for i in range(self.num_layers):
            r = split_rngs(rngs, i)
            if decode:
                q, c = self.block.apply(params[f"layer_{i}"], q, kv,
                                        self_mask=self_mask,
                                        cross_mask=cross_mask,
                                        training=training, rngs=r,
                                        cache=caches[i], decode=True,
                                        cross_segment_ids=cross_segment_ids)
                new_caches.append(c)
            else:
                q = self.block.apply(params[f"layer_{i}"], q, kv,
                                     self_mask=self_mask,
                                     cross_mask=cross_mask,
                                     training=training, rngs=r,
                                     cross_segment_ids=cross_segment_ids)
        if decode:
            return q, new_caches
        return q

    def init_cache(self, batch, max_len, features, dtype=jnp.float32):
        return [self.block.init_cache(batch, max_len, features, dtype)
                for _ in range(self.num_layers)]
