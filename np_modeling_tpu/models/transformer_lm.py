"""GPT-style causal decoder-only language model — the flagship.

BASELINE.json config #5 ("TransformerDecoder stack, GPT-style, causal-masked
attention, autoregressive loss, Adam"). The reference's decoder has no causal
mask and no KV cache (transformer.py:120 ``TODO: support cache``); both are
first-class here. Attention runs the Pallas flash kernel with whole-tile
causal skipping; decoding uses per-layer KV caches.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.nn import Dropout, Embedding, LayerNorm, Linear
from np_modeling_tpu.nn.module import Module, split_rngs
from np_modeling_tpu.nn.transformer import TransformerEncoderBlock


@dataclasses.dataclass
class GPTConfig:
    vocab_size: int = 32000
    d_model: int = 512
    num_heads: int = 8
    num_kv_heads: int | None = None      # GQA
    num_layers: int = 4
    hidden_units: int = 2048
    max_len: int = 1024
    drop_rate: float = 0.0
    norm_first: bool = True
    tie_embeddings: bool = True
    dtype: object = None          # compute dtype, e.g. jnp.bfloat16 (params fp32)
    scan_layers: bool = False     # lax.scan over stacked layer params
                                  # (O(1) compile time in depth)
    remat: bool = False           # jax.checkpoint each block (recompute
                                  # activations in backward: memory for FLOPs)
    moe_experts: int = 0          # >0: FFN becomes a routed MoE
    moe_top_k: int = 2            # 2 = GShard, 1 = Switch routing
    moe_aux_weight: float = 0.01  # load-balancing aux loss coefficient
    moe_capacity_factor: float | None = 1.25
                                  # None = NO-DROP routing (ragged_dot):
                                  # population-independent, so the serving
                                  # engine can chunk-prefill MoE exactly
    moe_router_weights: str = "default"   # nn.MoE.router_weights
    moe_routed_scaling: float = 1.0       # DeepSeek routed_scaling_factor
    moe_shared_units: int = 0     # DeepSeek always-on shared experts width
    moe_router_groups: tuple | None = None   # (n_group, topk_group)
    moe_router_score: str = "softmax"     # "sigmoid" = DeepSeek-V3 scoring
    moe_router_select_bias: bool = False  # DeepSeek-V3 noaux-tc bias
    moe_group_metric: str = "max"         # "top2sum" = DeepSeek-V3 groups
    moe_hidden_units: int | None = None   # expert width != dense FFN width
    moe_first_dense: int = 0      # DeepSeek first_k_dense_replace: layers
                                  # i < this keep a DENSE FFN
    positional: str = "learned"   # "learned" | "rope"
    activation: str = "relu"      # FFN activation ("relu" | "gelu" | "silu";
                                  # "gelu" is the tanh form = HF "gelu_new")
    ln_eps: float = 1e-3          # LayerNorm/RMSNorm epsilon (reference
                                  # default; GPT-2 1e-5, LLaMA 1e-5/1e-6)
    norm: str = "layer"           # "layer" | "rms" (LLaMA-style)
    rms_offset: bool = False      # RMSNorm scales by (1 + w) (Gemma-style
                                  # zero-centered weight)
    ffn: str = "mlp"              # "mlp" | "swiglu" (LLaMA) | "geglu"
                                  # (Gemma: gelu-gated)
    head_dim: int | None = None   # attention head dim (Gemma decouples it
                                  # from d_model // num_heads)
    embed_scale: bool = False     # multiply embeddings by sqrt(d_model)
                                  # (Gemma)
    use_bias: bool = True         # False: biasless attention/FFN (LLaMA)
    qkv_bias: bool | None = None  # override q/k/v bias only (Qwen2-style)
    rope_base: float = 10000.0    # RoPE theta (LLaMA-3 uses 500000)
    rope_dim: int | None = None   # partial rotary: rotate only the first
                                  # rope_dim head features (GPT-NeoX
                                  # rotary_pct, Phi partial_rotary_factor)
    rope_scaling: tuple | None = None  # long-context frequency scaling:
                                  # ("linear", factor) or ("llama3",
                                  # factor, low, high, original_max_len)
    parallel_residual: bool = False   # x + attn(n1(x)) + ffn(n2(x))
                                  # (GPT-J / GPT-NeoX / Phi block form)
    parallel_shared_norm: bool = False  # Phi: ONE shared LN feeds both the
                                  # attention and FFN branches (no norm2)
    lm_head_bias: bool = False    # untied LM head carries a bias (Phi)
    attention_window: int | None = None   # sliding-window (local) attention
    window_pattern: int = 1       # >1: only layers with i % pattern == 0
                                  # use attention_window, the rest attend
                                  # globally (Gemma-2 alternates 2)
    attn_logit_softcap: float | None = None   # Gemma-2: cap*tanh(s/cap) on
                                  # the scaled attention scores (in-kernel)
    final_logit_softcap: float | None = None  # Gemma-2: same cap on the
                                  # LM-head output logits
    query_pre_attn_scalar: float | None = None  # Gemma-2: attention scale
                                  # = query_pre_attn_scalar**-0.5 (instead
                                  # of head_dim**-0.5)
    sandwich_norm: bool = False   # Gemma-2: extra norm on each sublayer
                                  # output before its residual add
    qk_norm: bool = False         # Qwen3: per-head RMSNorm on q/k over
                                  # head_dim (eps = ln_eps), before RoPE
    attn_sinks: bool = False      # gpt-oss: learnable per-head attention
                                  # sinks (virtual no-value key)
    moe_router_bias: bool = False # gpt-oss: biased router linear
    mla: dict | None = None       # DeepSeek-V2 multi-head LATENT attention
                                  # (per-token cache = kv_lora_rank + rope
                                  # numbers; absorbed decode): dims dict for
                                  # nn.mla.MLAttention
    fused_loss: bool = False      # chunked LM-head+CE: [N, vocab] logits
                                  # never materialized (tied AND untied
                                  # heads). Measured v32k/b8/s2048: 0.82x
                                  # step time, -2.14 GiB temp memory —
                                  # enable when activation memory binds


@dataclasses.dataclass
class GPT(Module):
    config: GPTConfig

    def __post_init__(self):
        c = self.config
        self.embed = Embedding(c.vocab_size, c.d_model)
        self.pos_embed = Embedding(c.max_len, c.d_model)
        attn_scale = (c.query_pre_attn_scalar ** -0.5
                      if c.query_pre_attn_scalar is not None else None)

        def make_block(window, moe_experts=c.moe_experts):
            return TransformerEncoderBlock(
                c.num_heads, c.hidden_units, c.norm_first, c.drop_rate,
                causal=True, num_kv_heads=c.num_kv_heads, dtype=c.dtype,
                moe_experts=moe_experts, moe_top_k=c.moe_top_k,
                moe_capacity_factor=c.moe_capacity_factor,
                moe_router_weights=c.moe_router_weights,
                moe_routed_scaling=c.moe_routed_scaling,
                moe_shared_units=c.moe_shared_units,
                moe_hidden_units=c.moe_hidden_units,
                moe_router_groups=c.moe_router_groups,
                moe_router_score=c.moe_router_score,
                moe_router_select_bias=c.moe_router_select_bias,
                moe_group_metric=c.moe_group_metric,
                rope=(c.positional == "rope"),
                window=window, activation=c.activation,
                ln_eps=c.ln_eps, norm=c.norm, ffn=c.ffn, use_bias=c.use_bias,
                qkv_bias=c.qkv_bias, rms_offset=c.rms_offset,
                head_dim=c.head_dim, parallel_residual=c.parallel_residual,
                parallel_shared_norm=c.parallel_shared_norm,
                attn_scale=attn_scale, attn_softcap=c.attn_logit_softcap,
                qk_norm=c.qk_norm, mla=c.mla, attn_sinks=c.attn_sinks,
                moe_router_bias=c.moe_router_bias,
                sandwich_norm=c.sandwich_norm)

        self.block = make_block(c.attention_window)
        if c.moe_first_dense > 0:
            # DeepSeek first_k_dense_replace: the first layers keep a
            # dense FFN. A twin block with moe_experts=0 — here the PARAM
            # STRUCTURE differs per layer too, so init also routes through
            # _block_for.
            assert c.moe_experts and not c.scan_layers
            assert c.window_pattern == 1, (
                "window_pattern and moe_first_dense both fork the block; "
                "composing them is not wired")
            self.block_dense = make_block(c.attention_window, moe_experts=0)
        if c.window_pattern > 1:
            # Alternating local/global attention (Gemma-2): a twin block
            # with NO window for the global layers. Identical param
            # structure — window is compute-only — so init/params are
            # shared; scan_layers would need a heterogeneous body.
            assert not c.scan_layers, (
                "window_pattern > 1 alternates block behavior per layer; "
                "use scan_layers=False")
            assert c.attention_window is not None
            self.block_global = make_block(None)
        if c.positional == "rope":
            twins = [self.block]
            if c.window_pattern > 1:
                twins.append(self.block_global)
            if c.moe_first_dense > 0:
                twins.append(self.block_dense)
            for blk in twins:
                blk.attn.rope_base = c.rope_base
                blk.attn.rope_dim = c.rope_dim
                blk.attn.rope_scaling = c.rope_scaling
        from np_modeling_tpu.nn import RMSNorm
        self.final_norm = (RMSNorm(epsilon=c.ln_eps, offset=c.rms_offset)
                           if c.norm == "rms"
                           else LayerNorm(epsilon=c.ln_eps))
        self.drop = Dropout(c.drop_rate)
        if not c.tie_embeddings:
            self.lm_head = Linear(c.vocab_size, use_bias=c.lm_head_bias,
                                  dtype=c.dtype)

    def _block_for(self, i: int):
        """Layer i's block: with window_pattern > 1, layers i % pattern != 0
        attend globally (Gemma-2 alternation); params are block-agnostic."""
        c = self.config
        if c.window_pattern > 1 and i % c.window_pattern != 0:
            return self.block_global
        if c.moe_first_dense > 0 and i < c.moe_first_dense:
            return self.block_dense
        return self.block

    def init(self, key, tokens):
        c = self.config
        ks = jax.random.split(key, c.num_layers + 4)
        x = jnp.zeros((*tokens.shape, c.d_model), jnp.float32)
        params = {
            "embedding": self.embed.init(ks[0]),
            "final_norm": self.final_norm.init(ks[2], x),
        }
        if c.positional == "learned":
            params["pos_embedding"] = self.pos_embed.init(ks[1])
        if c.scan_layers:
            layer_keys = jax.random.split(ks[3], c.num_layers)
            params["layers"] = jax.vmap(
                lambda k: self.block.init(k, x))(layer_keys)
        else:
            for i in range(c.num_layers):
                params[f"layer_{i}"] = self._block_for(i).init(ks[3 + i], x)
        if not c.tie_embeddings:
            params["lm_head"] = self.lm_head.init(ks[-1], x)
        return params

    def apply(self, params, tokens, training=False, rngs=None,
              caches=None, decode=False, positions=None, collect_kv=False,
              collect_aux=False, segment_ids=None, return_hidden=False,
              logits_last_only=False, logits_dtype=None,
              inputs_embeds=None):
        """``segment_ids`` [b, s]: packed-sequence training — documents in
        the batch cannot attend across segment boundaries (masked inside
        the flash kernels). Pass per-document ``positions`` as well if
        position embeddings should restart at each document.
        ``return_hidden=True`` returns the final-norm hidden states instead
        of logits (the fused-loss path computes CE without materializing
        them). ``logits_last_only=True`` computes the LM head only for the
        final position (decode prefill needs just the next-token logits —
        skips a [b, s, vocab] materialization).
        ``inputs_embeds`` [b, s, d] replaces the token-embedding lookup
        (``tokens`` may be None) — multimodal models (LLaVA) splice
        projected image features into the embedding sequence and run the
        LM on the result (HF ``inputs_embeds`` surface)."""
        c = self.config
        if inputs_embeds is not None:
            assert not c.embed_scale, (
                "inputs_embeds bypasses the token embedding; the caller "
                "must pre-scale (embed_scale models)")
            x = inputs_embeds
        else:
            x = self.embed.apply(params["embedding"], tokens)
            if c.embed_scale:
                # Scale the TOKEN embedding only (Gemma / original-
                # Transformer semantics) — positions add unscaled.
                x = x * jnp.asarray(c.d_model ** 0.5, x.dtype)
        if c.positional == "learned":
            if positions is None:
                if decode:
                    start = (caches["index"][0] if c.scan_layers
                             else caches[0]["index"])
                    if start.ndim:    # per-row cache index -> [b, s]
                        start = start[:, None]
                else:
                    start = 0
                positions = start + jnp.arange(x.shape[-2])
            x = x + self.pos_embed.apply(params["pos_embedding"], positions)
        if c.dtype is not None:
            x = x.astype(c.dtype)
        x = self.drop.apply({}, x, training, rngs, salt=1000)

        new_caches = [] if decode else None
        collected = [] if collect_kv else None
        aux_total = jnp.zeros((), jnp.float32)
        block_positions = positions if c.positional == "rope" else None
        if c.scan_layers:
            assert not collect_kv, "collect_kv requires scan_layers=False"
            x, new_caches, aux_total = self._apply_scanned(
                params["layers"], x, training, rngs, caches, decode,
                segment_ids=segment_ids, positions=block_positions)
        else:
            def make_run(blk):
                def run(p, x, r):
                    return blk.apply(
                        p, x, training=training, rngs=r,
                        segment_ids=segment_ids, positions=block_positions,
                        collect_aux=collect_aux)
                return (jax.checkpoint(run) if c.remat and not decode
                        else run)
            for i in range(c.num_layers):
                blk = self._block_for(i)
                run_block = make_run(blk)
                r = split_rngs(rngs, i)
                if decode:
                    x, cache = blk.apply(params[f"layer_{i}"], x,
                                         training=training, rngs=r,
                                         cache=caches[i], decode=True)
                    new_caches.append(cache)
                elif collect_kv:
                    x, kv = blk.apply(params[f"layer_{i}"], x,
                                      training=training, rngs=r,
                                      collect_kv=True)
                    collected.append(kv)
                elif collect_aux:
                    x, aux = run_block(params[f"layer_{i}"], x, r)
                    aux_total = aux_total + aux
                else:
                    x = run_block(params[f"layer_{i}"], x, r)

        x = self.final_norm.apply(params["final_norm"], x)
        if return_hidden:
            if collect_aux:
                return x, aux_total
            return x
        if logits_last_only:
            x = x[..., -1:, :]
        if c.tie_embeddings:
            table = params["embedding"]["table"]
            if c.dtype is not None:
                table = table.astype(c.dtype)
            logits = jnp.einsum("...d,vd->...v", x, table,
                                preferred_element_type=jnp.float32)
        else:
            logits = self.lm_head.apply(params["lm_head"], x)
        # Public default: fp32 logits. The train loss passes
        # logits_dtype=bf16 so the [b, s, vocab] tensor stays half-width in
        # HBM (the CE op casts tile-wise to fp32 INSIDE its fused
        # reductions — softmax statistics and the loss stay fp32).
        logits = logits.astype(logits_dtype or jnp.float32)
        if c.final_logit_softcap is not None:
            cap = jnp.asarray(c.final_logit_softcap, logits.dtype)
            logits = cap * jnp.tanh(logits / cap)
        if decode:
            return logits, new_caches
        if collect_kv:
            return logits, collected
        if collect_aux:
            return logits, aux_total
        return logits

    def _apply_scanned(self, stacked, x, training, rngs, caches, decode,
                       segment_ids=None, positions=None):
        """lax.scan over stacked per-layer params (and stacked caches).

        Threads segment_ids / rope positions / MoE aux loss through the scan
        body — packed-sequence masking and load balancing behave identically
        with and without scan_layers. Returns (x, new_caches, aux_total)."""
        c = self.config
        idxs = jnp.arange(c.num_layers)
        zero_aux = jnp.zeros((), jnp.float32)

        if decode:
            def body(x, inp):
                lp, cache, i = inp
                r = split_rngs(rngs, i)
                x, new_cache = self.block.apply(lp, x, training=training,
                                                rngs=r, cache=cache,
                                                decode=True)
                return x, new_cache

            x, new_caches = jax.lax.scan(body, x, (stacked, caches, idxs))
            return x, new_caches, zero_aux

        def body(carry, inp):
            x, aux = carry
            lp, i = inp
            r = split_rngs(rngs, i)
            if c.moe_experts:
                x, layer_aux = self.block.apply(
                    lp, x, training=training, rngs=r, collect_aux=True,
                    segment_ids=segment_ids, positions=positions)
                aux = aux + layer_aux
            else:
                x = self.block.apply(lp, x, training=training, rngs=r,
                                     segment_ids=segment_ids,
                                     positions=positions)
            return (x, aux), None

        if c.remat:
            body = jax.checkpoint(body)
        (x, aux_total), _ = jax.lax.scan(body, (x, zero_aux),
                                         (stacked, idxs))
        return x, None, aux_total

    # ---- losses / decoding ---------------------------------------------

    def loss(self, params, tokens, training=False, rngs=None,
             segment_ids=None, positions=None):
        """Next-token CE (mean over positions) via the fused softmax-xent op.

        FULL-LENGTH inputs (r5): the model runs on all ``S`` tokens and the
        last position is excluded via the ``valid`` mask instead of slicing
        to ``S-1``. Mathematically identical (the masked position
        contributes zero loss, hence zero gradient through it), but the
        odd S-1 sequence forced a pad-to-tile copy of q/k/v (+ their
        backward mirrors) inside EVERY flash-attention call — measured
        ~6ms/step of the s4096 headline. Falls back to slicing only when
        ``S > max_len`` (full-length wouldn't fit the position table).

        With MoE layers, adds the load-balancing aux loss
        (moe_aux_weight * Σ per-layer GShard aux)."""
        c = self.config
        full = tokens.shape[-1] <= c.max_len
        if full:
            inputs, seg, pos = tokens, segment_ids, positions
            # roll wraps tokens[0] into the last slot — masked by `valid`.
            targets = jnp.roll(tokens, -1, axis=-1)
            last = jnp.zeros_like(tokens[..., :1], jnp.float32)
            valid = jnp.concatenate(
                [jnp.ones_like(tokens[..., 1:], jnp.float32), last], -1)
            if segment_ids is not None:
                valid = valid * jnp.concatenate(
                    [(segment_ids[..., 1:] == segment_ids[..., :-1]
                      ).astype(jnp.float32), last], -1)
        else:
            inputs = tokens[..., :-1]
            seg = segment_ids[..., :-1] if segment_ids is not None else None
            pos = positions[..., :-1] if positions is not None else None
            targets = tokens[..., 1:]
            valid = None
            if segment_ids is not None:
                # Don't learn to predict across document boundaries.
                valid = (segment_ids[..., 1:]
                         == segment_ids[..., :-1]).astype(jnp.float32)
        fused = c.fused_loss
        assert not (fused and c.final_logit_softcap is not None), (
            "fused_loss never materializes logits, so the final logit "
            "softcap cannot be applied — disable one")
        if c.moe_experts:
            out, aux = self.apply(params, inputs,
                                  training=training, rngs=rngs,
                                  collect_aux=True, segment_ids=seg,
                                  positions=pos, return_hidden=fused,
                                  logits_dtype=c.dtype)
        else:
            out, aux = self.apply(params, inputs,
                                  training=training, rngs=rngs,
                                  segment_ids=seg, positions=pos,
                                  return_hidden=fused,
                                  logits_dtype=c.dtype), 0.0
        if fused:
            if c.tie_embeddings:
                ce_mean = ops.fused_lm_head_loss(
                    out, params["embedding"]["table"], targets, valid=valid)
            else:
                ce_mean = ops.fused_lm_head_loss(
                    out, params["lm_head"]["w"], targets, valid=valid,
                    table_layout="dv", bias=params["lm_head"].get("b"))
            return ce_mean + c.moe_aux_weight * aux
        ce = ops.softmax_cross_entropy_with_integer_labels(out, targets)
        if valid is not None:
            return (jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
                    + c.moe_aux_weight * aux)
        return jnp.mean(ce) + c.moe_aux_weight * aux

    def init_cache(self, batch, max_len=None, dtype=jnp.float32):
        c = self.config
        max_len = max_len or c.max_len
        one = self.block.init_cache(batch, max_len, c.d_model, dtype)
        if c.scan_layers:
            return jax.tree_util.tree_map(
                lambda a: jnp.zeros((c.num_layers, *a.shape), a.dtype), one)
        return [one] + [self._block_for(i).init_cache(batch, max_len,
                                                      c.d_model, dtype)
                        for i in range(1, c.num_layers)]

    def generate(self, params, prompt_tokens, steps: int, key=None,
                 temperature: float = 0.0, top_k: int | None = None,
                 top_p: float | None = None, prompt_embeds=None):
        """Autoregressive decode with KV caches (jittable scan).

        ``temperature=0`` (or no key) is greedy; otherwise samples with
        optional top-k and/or nucleus (top-p) filtering, all in-graph.
        ``prompt_embeds`` [b, plen, d]: prefill from embeddings instead of
        ``prompt_tokens`` (multimodal prompts with spliced image
        features); subsequent steps decode sampled TOKENS as usual."""
        if prompt_embeds is not None:
            b, plen = prompt_embeds.shape[:2]
        else:
            b, plen = prompt_tokens.shape
        caches = self.init_cache(b, plen + steps)
        logits, caches = self.apply(params, prompt_tokens, caches=caches,
                                    decode=True, logits_last_only=True,
                                    inputs_embeds=prompt_embeds)
        next_tok = self._sample(logits[:, -1], key, temperature, 0,
                                top_k, top_p)

        def body(carry, i):
            tok, caches, key = carry
            logits, caches = self.apply(params, tok[:, None], caches=caches,
                                        decode=True)
            nxt = self._sample(logits[:, -1], key, temperature, i,
                               top_k, top_p)
            return (nxt, caches, key), nxt

        (_, _, _), toks = jax.lax.scan(
            body, (next_tok, caches, key), jnp.arange(1, steps))
        return jnp.concatenate([next_tok[:, None], toks.T], axis=1)

    @staticmethod
    def _sample(logits, key, temperature, salt, top_k=None, top_p=None):
        if temperature == 0.0 or key is None:
            return jnp.argmax(logits, axis=-1)
        lg = filter_logits(logits / temperature, top_k, top_p)
        key = jax.random.fold_in(key, salt)
        return jax.random.categorical(key, lg, axis=-1)


def filter_logits(lg, top_k=None, top_p=None):
    """Apply top-k and/or nucleus (top-p) filtering: logits outside the
    keep-set become -inf. ``softmax(filter_logits(logits/T))`` is the
    exact distribution ``GPT._sample`` draws from — speculative decoding
    uses it for the filtered accept ratio."""
    if top_k is not None:
        kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
        lg = jnp.where(lg < kth, -jnp.inf, lg)
    if top_p is not None:
        # Nucleus: keep the smallest prefix of the sorted distribution
        # with cumulative probability >= top_p (the top token always
        # survives).
        sorted_lg = jnp.sort(lg, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_lg, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = cum - probs < top_p
        # Cutoff = the SMALLEST kept logit; everything below it drops.
        cutoff = jnp.min(jnp.where(keep_sorted, sorted_lg, jnp.inf),
                         axis=-1, keepdims=True)
        lg = jnp.where(lg < cutoff, -jnp.inf, lg)
    return lg
