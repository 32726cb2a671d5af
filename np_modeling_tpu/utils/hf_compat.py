"""HuggingFace transformers interop: import GPT-2 checkpoints.

Converts a ``transformers.GPT2LMHeadModel`` (or its state dict) into a
(``GPTConfig``, params) pair for :class:`np_modeling_tpu.models.GPT`, so
weights trained elsewhere can be served/fine-tuned by this framework.
The reference framework's only interop surface is its Flax test binding
(/root/reference/layers/utils.py:27-101); this extends the same idea to a
real production checkpoint format.

Architecture mapping (GPT-2 is a pre-norm decoder-only transformer — the
exact structure of our GPT with ``norm_first=True``):

| HF GPT-2                       | ours                                  |
|--------------------------------|---------------------------------------|
| ``wte.weight`` [V, d]          | ``embedding/table`` (tied LM head)    |
| ``wpe.weight`` [P, d]          | ``pos_embedding/table``               |
| ``h.i.ln_1 / ln_2``            | ``layer_i/norm1 / norm2`` (eps 1e-5)  |
| ``h.i.attn.c_attn`` [d, 3d]    | split -> wq/wk/wv [d, h, dk]          |
| ``h.i.attn.c_proj`` [d, d]     | wo [h, dk, d]                         |
| ``h.i.mlp.c_fc`` [d, 4d]       | ``dense1`` (activation = gelu-tanh,   |
|                                | HF ``gelu_new``)                      |
| ``h.i.mlp.c_proj`` [4d, d]     | ``dense2``                            |
| ``ln_f``                       | ``final_norm``                        |

HF's ``Conv1D`` stores weights as [in, out] — the same layout as our
``Linear`` — so the conversion is reshapes only, no transposes.
"""

from __future__ import annotations

import numpy as np


def _np(t):
    """torch tensor / array -> float32 numpy array (no torch import needed)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def gpt2_config(hf_config, **overrides):
    """``transformers.GPT2Config`` -> :class:`GPTConfig` (same architecture)."""
    from np_modeling_tpu.models import GPTConfig

    kw = dict(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.n_embd,
        num_heads=hf_config.n_head,
        num_layers=hf_config.n_layer,
        hidden_units=(hf_config.n_inner or 4 * hf_config.n_embd),
        max_len=hf_config.n_positions,
        drop_rate=0.0,          # inference default; set for fine-tuning
        norm_first=True,
        tie_embeddings=True,
        positional="learned",
        activation="gelu",      # tanh approximation == HF "gelu_new"
        ln_eps=hf_config.layer_norm_epsilon,
    )
    kw.update(overrides)
    return GPTConfig(**kw)


def gpt2_params(state_dict, config) -> dict:
    """GPT-2 state dict (``model.state_dict()``) -> GPT params pytree.

    ``config``: the :class:`GPTConfig` (from :func:`gpt2_config`). Keys may
    carry the ``transformer.`` prefix (LMHeadModel) or not (GPT2Model).
    """
    sd = {k.removeprefix("transformer."): v for k, v in state_dict.items()}
    d, h = config.d_model, config.num_heads
    dk = d // h

    def lin(prefix):
        return {"w": _np(sd[f"{prefix}.weight"]),
                "b": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"]),
                "beta": _np(sd[f"{prefix}.bias"])}

    params = {
        "embedding": {"table": _np(sd["wte.weight"])},
        "pos_embedding": {"table": _np(sd["wpe.weight"])},
        "final_norm": ln("ln_f"),
    }
    for i in range(config.num_layers):
        p = f"h.{i}"
        w_qkv = _np(sd[f"{p}.attn.c_attn.weight"])   # [d, 3d]
        b_qkv = _np(sd[f"{p}.attn.c_attn.bias"])     # [3d]
        wq, wk, wv = np.split(w_qkv, 3, axis=1)
        bq, bk, bv = np.split(b_qkv, 3)
        wo = _np(sd[f"{p}.attn.c_proj.weight"])      # [h*dk, d]
        params[f"layer_{i}"] = {
            "self_attention": {
                "wq": wq.reshape(d, h, dk), "bq": bq.reshape(h, dk),
                "wk": wk.reshape(d, h, dk), "bk": bk.reshape(h, dk),
                "wv": wv.reshape(d, h, dk), "bv": bv.reshape(h, dk),
                "wo": wo.reshape(h, dk, d),
                "bo": _np(sd[f"{p}.attn.c_proj.bias"]),
            },
            "norm1": ln(f"{p}.ln_1"),
            "norm2": ln(f"{p}.ln_2"),
            "dense1": {"linear": lin(f"{p}.mlp.c_fc")},
            "dense2": lin(f"{p}.mlp.c_proj"),
        }
    return params


def import_gpt2(model, **config_overrides):
    """``transformers.GPT2LMHeadModel``/``GPT2Model`` -> (GPTConfig, params).

    >>> cfg, params = import_gpt2(GPT2LMHeadModel.from_pretrained("gpt2"))
    >>> gpt = models.GPT(cfg)
    >>> logits = gpt.apply(params, tokens)
    """
    cfg = gpt2_config(model.config, **config_overrides)
    return cfg, gpt2_params(model.state_dict(), cfg)


def export_gpt2_state_dict(params, config) -> dict:
    """GPT params pytree -> a HuggingFace GPT-2 state dict (numpy values).

    Inverse of :func:`gpt2_params`: load the result into a
    ``transformers.GPT2LMHeadModel`` of the matching ``GPT2Config`` via
    ``model.load_state_dict({k: torch.from_numpy(v) ...})`` to run a model
    trained here under torch. Requires the GPT-2 architecture settings
    (norm_first, tied embeddings, learned positions, gelu FFN).
    """
    c = config
    assert c.norm_first and c.tie_embeddings, "GPT-2 is pre-norm and tied"
    assert c.positional == "learned" and c.activation == "gelu"
    assert c.norm == "layer" and c.ffn == "mlp", "GPT-2 is LN + MLP"
    assert not c.embed_scale and not c.qkv_bias, (
        "embed_scale / qkv_bias have no GPT-2 state-dict representation")
    assert c.attention_window is None, "GPT-2 has no sliding window"
    assert c.attention_window is None, (
        "GPT-2 has no sliding window — exporting would silently change "
        "attention semantics under torch")
    assert (c.num_kv_heads or c.num_heads) == c.num_heads, (
        "GPT-2 has no GQA (num_kv_heads must equal num_heads)")
    d = c.d_model
    sd = {
        "transformer.wte.weight": _np(params["embedding"]["table"]),
        "transformer.wpe.weight": _np(params["pos_embedding"]["table"]),
        "transformer.ln_f.weight": _np(params["final_norm"]["gamma"]),
        "transformer.ln_f.bias": _np(params["final_norm"]["beta"]),
        "lm_head.weight": _np(params["embedding"]["table"]),
    }
    for i in range(c.num_layers):
        lp = params[f"layer_{i}"]
        ap = lp["self_attention"]
        p = f"transformer.h.{i}"
        w_qkv = np.concatenate([_np(ap[k]).reshape(d, d)
                                for k in ("wq", "wk", "wv")], axis=1)
        b_qkv = np.concatenate([_np(ap[k]).reshape(d)
                                for k in ("bq", "bk", "bv")])
        sd.update({
            f"{p}.attn.c_attn.weight": w_qkv,
            f"{p}.attn.c_attn.bias": b_qkv,
            f"{p}.attn.c_proj.weight": _np(ap["wo"]).reshape(d, d),
            f"{p}.attn.c_proj.bias": _np(ap["bo"]),
            f"{p}.ln_1.weight": _np(lp["norm1"]["gamma"]),
            f"{p}.ln_1.bias": _np(lp["norm1"]["beta"]),
            f"{p}.ln_2.weight": _np(lp["norm2"]["gamma"]),
            f"{p}.ln_2.bias": _np(lp["norm2"]["beta"]),
            f"{p}.mlp.c_fc.weight": _np(lp["dense1"]["linear"]["w"]),
            f"{p}.mlp.c_fc.bias": _np(lp["dense1"]["linear"]["b"]),
            f"{p}.mlp.c_proj.weight": _np(lp["dense2"]["w"]),
            f"{p}.mlp.c_proj.bias": _np(lp["dense2"]["b"]),
        })
    return sd


# ---------------------------------------------------------------------------
# LLaMA (HF LlamaForCausalLM) import: RMSNorm + SwiGLU + RoPE + GQA, no bias
# ---------------------------------------------------------------------------


def _rope_scaling_tuple(hf_config):
    """HF ``rope_scaling`` dict -> our hashable scaling tuple (or None).

    Supports "linear" (position interpolation) and "llama3" (Llama-3.1's
    piecewise NTK frequency scaling). "default" means none."""
    rs = getattr(hf_config, "rope_scaling", None)
    if not rs:
        return None
    kind = rs.get("rope_type", rs.get("type", "default"))
    if kind == "default":
        return None
    if kind == "linear":
        return ("linear", float(rs["factor"]))
    if kind == "llama3":
        return ("llama3", float(rs["factor"]),
                float(rs["low_freq_factor"]), float(rs["high_freq_factor"]),
                float(rs["original_max_position_embeddings"]))
    if kind == "yarn":
        import math
        factor = float(rs["factor"])
        af = rs.get("attention_factor")
        if af is None:
            def get_mscale(scale, ms=1.0):
                return (1.0 if scale <= 1
                        else 0.1 * ms * math.log(scale) + 1.0)
            ms, msad = rs.get("mscale"), rs.get("mscale_all_dim")
            af = (get_mscale(factor, ms) / get_mscale(factor, msad)
                  if ms and msad else get_mscale(factor))
        orig = (rs.get("original_max_position_embeddings")
                or hf_config.max_position_embeddings)
        return ("yarn", factor, float(rs.get("beta_fast") or 32),
                float(rs.get("beta_slow") or 1), float(orig), float(af))
    raise NotImplementedError(
        f"rope_scaling type {kind!r} (supported: linear, llama3, yarn)")


def llama_config(hf_config, **overrides):
    """``transformers.LlamaConfig`` -> :class:`GPTConfig`."""
    from np_modeling_tpu.models import GPTConfig

    kw = dict(
        rope_scaling=_rope_scaling_tuple(hf_config),
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=hf_config.num_key_value_heads,
        head_dim=getattr(hf_config, "head_dim", None),
        num_layers=hf_config.num_hidden_layers,
        hidden_units=hf_config.intermediate_size,
        max_len=hf_config.max_position_embeddings,
        drop_rate=0.0,
        norm_first=True,
        tie_embeddings=bool(hf_config.tie_word_embeddings),
        positional="rope",
        rope_base=float(hf_config.rope_theta),
        norm="rms",
        ffn="swiglu",
        use_bias=False,
        ln_eps=hf_config.rms_norm_eps,
    )
    kw.update(overrides)
    return GPTConfig(**kw)


def _rope_perm(dk: int):
    """HF LLaMA applies RoPE to half-split pairs (i, i + dk/2); our kernel
    rotates interleaved pairs (2i, 2i+1) with the SAME angles. Permuting
    the q/k projections' output features converts exactly (scores are
    invariant to a common feature permutation of q and k)."""
    half = np.arange(dk // 2)
    return np.ravel(np.column_stack([half, half + dk // 2]))


def llama_params(state_dict, config) -> dict:
    """LlamaForCausalLM state dict -> GPT params pytree."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    c = config
    d = c.d_model
    hq = c.num_heads
    hkv = c.num_kv_heads or hq
    dk = c.head_dim or d // hq     # Gemma decouples head_dim from d // hq
    perm = _rope_perm(dk)

    def heads(prefix, h):
        w = _np(sd[f"{prefix}.weight"]).T.reshape(d, h, dk)  # torch: [out,in]
        return w[..., perm]                                  # rope pairing

    def gamma(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"])}

    params = {
        "embedding": {"table": _np(sd["embed_tokens.weight"])},
        "final_norm": gamma("norm"),
    }
    if not c.tie_embeddings:
        params["lm_head"] = {"w": _np(state_dict["lm_head.weight"]).T}
    for i in range(c.num_layers):
        p = f"layers.{i}"
        params[f"layer_{i}"] = {
            "self_attention": {
                "wq": heads(f"{p}.self_attn.q_proj", hq),
                "wk": heads(f"{p}.self_attn.k_proj", hkv),
                "wv": _np(sd[f"{p}.self_attn.v_proj.weight"]).T.reshape(
                    d, hkv, dk),
                "wo": _np(sd[f"{p}.self_attn.o_proj.weight"]).T.reshape(
                    hq, dk, d),
            },
            "norm1": gamma(f"{p}.input_layernorm"),
            "norm2": gamma(f"{p}.post_attention_layernorm"),
        }
        if not c.moe_experts:       # Mixtral fills "moe" instead
            params[f"layer_{i}"]["swiglu"] = {
                "w_gate": _np(sd[f"{p}.mlp.gate_proj.weight"]).T,
                "w_up": _np(sd[f"{p}.mlp.up_proj.weight"]).T,
                "w_down": _np(sd[f"{p}.mlp.down_proj.weight"]).T,
            }
    return params


def import_llama(model, **config_overrides):
    """``transformers.LlamaForCausalLM`` -> (GPTConfig, params).

    Covers the LLaMA-architecture family (RMSNorm, SwiGLU, RoPE, GQA, no
    biases) — the de-facto open-model standard. RoPE pairing is converted
    from HF's half-split to our interleaved form by permuting the q/k
    projection features (see :func:`_rope_perm`).
    """
    cfg = llama_config(model.config, **config_overrides)
    return cfg, llama_params(model.state_dict(), cfg)


def export_llama_state_dict(params, config) -> dict:
    """GPT params pytree -> a HuggingFace LlamaForCausalLM state dict.

    Inverse of :func:`llama_params` (q/k features un-permuted back to HF's
    half-split RoPE pairing)."""
    c = config
    assert c.norm == "rms" and c.ffn == "swiglu" and not c.use_bias
    assert c.positional == "rope"
    assert c.attention_window is None, (
        "LlamaConfig has no sliding window — exporting a window model "
        "would silently change attention semantics under torch")
    assert not c.rms_offset and not c.embed_scale, (
        "Gemma-style knobs have no LLaMA state-dict representation")
    assert c.head_dim in (None, c.d_model // c.num_heads), (
        "a decoupled head_dim has no LLaMA state-dict representation")
    assert not c.qkv_bias, "Qwen2-style qkv biases are not LLaMA weights"
    d = c.d_model
    hq = c.num_heads
    hkv = c.num_kv_heads or hq
    dk = d // hq
    inv = np.argsort(_rope_perm(dk))

    def proj(w, h):                      # [d, h, dk] -> torch [h*dk, d]
        return np.ascontiguousarray(_np(w).reshape(d, h * dk).T)

    sd = {
        "model.embed_tokens.weight": _np(params["embedding"]["table"]),
        "model.norm.weight": _np(params["final_norm"]["gamma"]),
    }
    if not c.tie_embeddings:
        sd["lm_head.weight"] = np.ascontiguousarray(
            _np(params["lm_head"]["w"]).T)
    else:
        sd["lm_head.weight"] = _np(params["embedding"]["table"])
    for i in range(c.num_layers):
        lp = params[f"layer_{i}"]
        ap = lp["self_attention"]
        sp = lp["swiglu"]
        p = f"model.layers.{i}"
        sd.update({
            f"{p}.self_attn.q_proj.weight": proj(_np(ap["wq"])[..., inv],
                                                 hq),
            f"{p}.self_attn.k_proj.weight": proj(_np(ap["wk"])[..., inv],
                                                 hkv),
            f"{p}.self_attn.v_proj.weight": proj(ap["wv"], hkv),
            f"{p}.self_attn.o_proj.weight": np.ascontiguousarray(
                _np(ap["wo"]).reshape(hq * dk, d).T),
            f"{p}.input_layernorm.weight": _np(lp["norm1"]["gamma"]),
            f"{p}.post_attention_layernorm.weight": _np(lp["norm2"]["gamma"]),
            f"{p}.mlp.gate_proj.weight": np.ascontiguousarray(
                _np(sp["w_gate"]).T),
            f"{p}.mlp.up_proj.weight": np.ascontiguousarray(
                _np(sp["w_up"]).T),
            f"{p}.mlp.down_proj.weight": np.ascontiguousarray(
                _np(sp["w_down"]).T),
        })
    return sd


def import_mistral(model, **config_overrides):
    """``transformers.MistralForCausalLM`` -> (GPTConfig, params).

    Mistral is the LLaMA architecture plus sliding-window attention: the
    weight layout converts identically (:func:`llama_params`), and
    ``sliding_window`` maps onto ``GPTConfig.attention_window`` (our
    window semantics — attend to the last W positions inclusive — match
    HF's). ``sliding_window=None`` (e.g. later Mistral variants) imports
    as full attention."""
    hc = model.config
    window = getattr(hc, "sliding_window", None)
    cfg = llama_config(hc, attention_window=window, **config_overrides)
    return cfg, llama_params(model.state_dict(), cfg)


def import_qwen2(model, **config_overrides):
    """``transformers.Qwen2ForCausalLM`` -> (GPTConfig, params).

    Qwen2 is the LLaMA architecture with BIASED q/k/v projections (o and
    the FFN stay biasless): ``qkv_bias=True`` on the config, and the bias
    vectors get the same RoPE feature permutation as the weights (the
    bias adds before rotation)."""
    hc = model.config
    cfg = llama_config(hc, qkv_bias=True,
                       attention_window=(hc.sliding_window
                                         if getattr(hc, "use_sliding_window",
                                                    False) else None),
                       **config_overrides)
    state_dict = model.state_dict()
    params = llama_params(state_dict, cfg)
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    hq = cfg.num_heads
    hkv = cfg.num_kv_heads or hq
    dk = cfg.head_dim or cfg.d_model // hq
    perm = _rope_perm(dk)
    for i in range(cfg.num_layers):
        ap = params[f"layer_{i}"]["self_attention"]
        p = f"layers.{i}.self_attn"
        ap["bq"] = _np(sd[f"{p}.q_proj.bias"]).reshape(hq, dk)[:, perm]
        ap["bk"] = _np(sd[f"{p}.k_proj.bias"]).reshape(hkv, dk)[:, perm]
        ap["bv"] = _np(sd[f"{p}.v_proj.bias"]).reshape(hkv, dk)
    return cfg, params


def import_gemma(model, **config_overrides):
    """``transformers.GemmaForCausalLM`` -> (GPTConfig, params).

    Gemma = LLaMA layout plus: zero-centered RMSNorm ``(1 + w)`` scaling
    (``rms_offset``), a gelu-gated FFN (``ffn="geglu"``), embeddings
    scaled by sqrt(d_model) (``embed_scale``), a decoupled ``head_dim``,
    and tied embeddings. The weight conversion is :func:`llama_params`
    unchanged."""
    hc = model.config
    act = getattr(hc, "hidden_activation", None) or getattr(
        hc, "hidden_act", None)
    assert act in (None, "gelu_pytorch_tanh"), (
        f"unsupported Gemma activation {act!r} (ops.gelu is the tanh form; "
        "the exact-erf 'gelu' checkpoints would silently drift)")
    cfg = llama_config(hc, rms_offset=True, ffn="geglu", embed_scale=True,
                       **config_overrides)
    return cfg, llama_params(model.state_dict(), cfg)


def import_mixtral(model, **config_overrides):
    """``transformers.MixtralForCausalLM`` -> (GPTConfig, params).

    Mixtral is the LLaMA/Mistral architecture with the FFN replaced by a
    top-2 routed MoE of SwiGLU experts. HF's routing — softmax over the
    router logits, top-k, renormalize the kept weights, NO capacity
    limit — is exactly our GShard path with ``moe_capacity_factor=None``
    (the no-drop dispatch), so logits match token-for-token.

    Weight map per layer (torch stores [out, in]; ours [in, out]):

    | HF Mixtral                                | ours                    |
    |-------------------------------------------|-------------------------|
    | ``block_sparse_moe.gate.weight`` [E, d]   | ``moe/router`` [d, E]   |
    | ``...experts.{e}.w1.weight`` [ff, d]      | ``moe/w_gate[e]``       |
    | ``...experts.{e}.w3.weight`` [ff, d]      | ``moe/w_up[e]``         |
    | ``...experts.{e}.w2.weight`` [d, ff]      | ``moe/w_down[e]``       |
    """
    hc = model.config
    assert hc.num_experts_per_tok == 2, (
        f"top-{hc.num_experts_per_tok} Mixtral unsupported: HF renormalizes "
        "the kept weights (top-1 -> 1.0) but our top-1 is Switch semantics "
        "(raw softmax gate) — only top-2 maps exactly")
    cfg = llama_config(
        hc,
        attention_window=getattr(hc, "sliding_window", None),
        moe_experts=hc.num_local_experts,
        moe_top_k=hc.num_experts_per_tok,
        moe_capacity_factor=None,        # HF routes every token: no-drop
        moe_aux_weight=float(getattr(hc, "router_aux_loss_coef", 0.01)),
        **config_overrides)
    state_dict = model.state_dict()
    params = llama_params(state_dict, cfg)
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    for i in range(cfg.num_layers):
        p = f"layers.{i}.block_sparse_moe"
        params[f"layer_{i}"]["moe"] = {
            "router": _np(sd[f"{p}.gate.weight"]).T,
            "w_gate": np.stack([
                _np(sd[f"{p}.experts.{e}.w1.weight"]).T
                for e in range(cfg.moe_experts)]),
            "w_up": np.stack([
                _np(sd[f"{p}.experts.{e}.w3.weight"]).T
                for e in range(cfg.moe_experts)]),
            "w_down": np.stack([
                _np(sd[f"{p}.experts.{e}.w2.weight"]).T
                for e in range(cfg.moe_experts)]),
        }
    return cfg, params


# ---------------------------------------------------------------------------
# T5 import: encoder-decoder, relative position bias, unscaled attention
# ---------------------------------------------------------------------------


def t5_config(hf_config, **overrides):
    """``transformers.T5Config`` -> :class:`T5Config`."""
    from np_modeling_tpu.models import T5Config

    kw = dict(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.d_model,
        d_kv=hf_config.d_kv,
        num_heads=hf_config.num_heads,
        num_encoder_layers=hf_config.num_layers,
        num_decoder_layers=(hf_config.num_decoder_layers
                            or hf_config.num_layers),
        d_ff=hf_config.d_ff,
        relpos_buckets=hf_config.relative_attention_num_buckets,
        relpos_max_distance=getattr(hf_config,
                                    "relative_attention_max_distance", 128),
        gated_act=bool(getattr(hf_config, "is_gated_act", False)),
        tie_embeddings=bool(hf_config.tie_word_embeddings),
        drop_rate=0.0,
        ln_eps=hf_config.layer_norm_epsilon,
    )
    kw.update(overrides)
    return T5Config(**kw)


def t5_params(state_dict, config) -> dict:
    """T5ForConditionalGeneration state dict -> T5 params pytree."""
    c = config
    sd = state_dict
    hq, dk, d = c.num_heads, c.d_kv, c.d_model

    def attn(prefix):
        # torch stores [out, in]; q/k/v out = heads*d_kv, o in = heads*d_kv.
        p = {
            "wq": _np(sd[f"{prefix}.q.weight"]).T.reshape(d, hq, dk),
            "wk": _np(sd[f"{prefix}.k.weight"]).T.reshape(d, hq, dk),
            "wv": _np(sd[f"{prefix}.v.weight"]).T.reshape(d, hq, dk),
            "wo": _np(sd[f"{prefix}.o.weight"]).T.reshape(hq, dk, d),
        }
        return p

    def ffn(prefix):
        if c.gated_act:
            return {"wi_0": _np(sd[f"{prefix}.wi_0.weight"]).T,
                    "wi_1": _np(sd[f"{prefix}.wi_1.weight"]).T,
                    "wo": _np(sd[f"{prefix}.wo.weight"]).T}
        return {"wi": _np(sd[f"{prefix}.wi.weight"]).T,
                "wo": _np(sd[f"{prefix}.wo.weight"]).T}

    def gamma(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"])}

    params = {
        "embedding": {"table": _np(sd["shared.weight"])},
        "enc_relpos": _np(sd["encoder.block.0.layer.0.SelfAttention"
                             ".relative_attention_bias.weight"]),
        "dec_relpos": _np(sd["decoder.block.0.layer.0.SelfAttention"
                             ".relative_attention_bias.weight"]),
        "enc_norm": gamma("encoder.final_layer_norm"),
        "dec_norm": gamma("decoder.final_layer_norm"),
    }
    if not c.tie_embeddings:
        params["lm_head"] = {"w": _np(sd["lm_head.weight"]).T}
    for i in range(c.num_encoder_layers):
        p = f"encoder.block.{i}"
        params[f"enc_{i}"] = {
            "self_attention": attn(f"{p}.layer.0.SelfAttention"),
            "norm1": gamma(f"{p}.layer.0.layer_norm"),
            "norm2": gamma(f"{p}.layer.1.layer_norm"),
            "ffn": ffn(f"{p}.layer.1.DenseReluDense"),
        }
    for i in range(c.num_decoder_layers):
        p = f"decoder.block.{i}"
        params[f"dec_{i}"] = {
            "self_attention": attn(f"{p}.layer.0.SelfAttention"),
            "cross_attention": attn(f"{p}.layer.1.EncDecAttention"),
            "norm1": gamma(f"{p}.layer.0.layer_norm"),
            "norm2": gamma(f"{p}.layer.1.layer_norm"),
            "norm3": gamma(f"{p}.layer.2.layer_norm"),
            "ffn": ffn(f"{p}.layer.2.DenseReluDense"),
        }
    return params


def import_t5(model, **config_overrides):
    """``transformers.T5ForConditionalGeneration`` -> (T5Config, params).

    The first ENCODER-DECODER family: bucketed relative-position bias
    (block-0-owned, shared down each stack — streamed into the flash
    kernels as an additive score bias), UNSCALED attention (T5 sets
    softmax scale to 1), T5LayerNorm == our RMSNorm, biasless projections,
    relu or gated-gelu FFNs, and the tied head's d_model^-0.5 rescale."""
    cfg = t5_config(model.config, **config_overrides)
    return cfg, t5_params(model.state_dict(), cfg)


# ---------------------------------------------------------------------------
# GPT-NeoX / Pythia import: parallel residual, partial rotary, fused QKV
# ---------------------------------------------------------------------------


def _partial_rope_perm(dk: int, rot: int):
    """Half-split -> interleaved permutation on the FIRST ``rot`` features
    only (partial rotary: the pass-through tail keeps its order)."""
    perm = np.arange(dk)
    perm[:rot] = _rope_perm(rot)
    return perm


def neox_config(hf_config, **overrides):
    """``transformers.GPTNeoXConfig`` -> :class:`GPTConfig`."""
    from np_modeling_tpu.models import GPTConfig

    dk = hf_config.hidden_size // hf_config.num_attention_heads
    kw = dict(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        num_heads=hf_config.num_attention_heads,
        num_layers=hf_config.num_hidden_layers,
        hidden_units=hf_config.intermediate_size,
        max_len=hf_config.max_position_embeddings,
        drop_rate=0.0,
        norm_first=True,
        tie_embeddings=bool(hf_config.tie_word_embeddings),
        positional="rope",
        rope_base=float(getattr(hf_config, "rope_theta", None)
                        or getattr(hf_config, "rotary_emb_base", 10000.0)),
        rope_dim=int(dk * hf_config.rotary_pct),
        norm="layer",
        ffn="mlp",
        use_bias=True,
        # HF "gelu" is the exact erf form; "gelu_new" the tanh one (ours).
        activation=("gelu_exact" if hf_config.hidden_act == "gelu"
                    else "gelu"),
        ln_eps=hf_config.layer_norm_eps,
        parallel_residual=bool(hf_config.use_parallel_residual),
    )
    kw.update(overrides)
    return GPTConfig(**kw)


def neox_params(state_dict, config) -> dict:
    """GPTNeoXForCausalLM state dict -> GPT params pytree.

    NeoX packs q/k/v PER HEAD in one ``query_key_value`` matrix
    ([..., heads, 3*dk] output layout) and applies rotary to the first
    ``rotary_pct * dk`` head features (half-split pairing) — unpacked and
    permuted to our interleaved convention here."""
    sd = {k.removeprefix("gpt_neox."): v for k, v in state_dict.items()}
    c = config
    d, hq = c.d_model, c.num_heads
    dk = d // hq
    perm = _partial_rope_perm(dk, c.rope_dim or dk)

    def ln(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"]),
                "beta": _np(sd[f"{prefix}.bias"])}

    params = {
        "embedding": {"table": _np(sd["embed_in.weight"])},
        "final_norm": ln("final_layer_norm"),
    }
    if not c.tie_embeddings:
        params["lm_head"] = {"w": _np(state_dict["embed_out.weight"]).T}
    for i in range(c.num_layers):
        p = f"layers.{i}"
        w = _np(sd[f"{p}.attention.query_key_value.weight"])   # [3d, d]
        b = _np(sd[f"{p}.attention.query_key_value.bias"])     # [3d]
        w = w.T.reshape(d, hq, 3, dk)
        b = b.reshape(hq, 3, dk)
        params[f"layer_{i}"] = {
            "self_attention": {
                "wq": w[:, :, 0][..., perm], "bq": b[:, 0][..., perm],
                "wk": w[:, :, 1][..., perm], "bk": b[:, 1][..., perm],
                "wv": w[:, :, 2], "bv": b[:, 2],
                "wo": _np(sd[f"{p}.attention.dense.weight"]).T.reshape(
                    hq, dk, d),
                "bo": _np(sd[f"{p}.attention.dense.bias"]),
            },
            "norm1": ln(f"{p}.input_layernorm"),
            "norm2": ln(f"{p}.post_attention_layernorm"),
            "dense1": {"linear": {
                "w": _np(sd[f"{p}.mlp.dense_h_to_4h.weight"]).T,
                "b": _np(sd[f"{p}.mlp.dense_h_to_4h.bias"])}},
            "dense2": {"w": _np(sd[f"{p}.mlp.dense_4h_to_h.weight"]).T,
                       "b": _np(sd[f"{p}.mlp.dense_4h_to_h.bias"])},
        }
    return params


def import_gpt_neox(model, **config_overrides):
    """``transformers.GPTNeoXForCausalLM`` (Pythia family) ->
    (GPTConfig, params).

    Brings in the PARALLEL-RESIDUAL block form
    (``x + attn(ln1(x)) + mlp(ln2(x))``, ``use_parallel_residual``) and
    PARTIAL rotary embeddings (``rotary_pct``) — both first-class GPTConfig
    knobs (``parallel_residual``, ``rope_dim``)."""
    cfg = neox_config(model.config, **config_overrides)
    return cfg, neox_params(model.state_dict(), cfg)


# ---------------------------------------------------------------------------
# Phi import: shared-LN parallel residual, partial rotary, biased everything
# ---------------------------------------------------------------------------


def phi_config(hf_config, **overrides):
    """``transformers.PhiConfig`` -> :class:`GPTConfig`."""
    from np_modeling_tpu.models import GPTConfig

    dk = hf_config.hidden_size // hf_config.num_attention_heads
    assert hf_config.hidden_act == "gelu_new", (
        f"unsupported Phi activation {hf_config.hidden_act!r}")
    kw = dict(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=hf_config.num_key_value_heads,
        num_layers=hf_config.num_hidden_layers,
        hidden_units=hf_config.intermediate_size,
        max_len=hf_config.max_position_embeddings,
        drop_rate=0.0,
        norm_first=True,
        tie_embeddings=False,
        lm_head_bias=True,
        positional="rope",
        rope_base=float(hf_config.rope_theta),
        rope_dim=int(dk * hf_config.partial_rotary_factor),
        norm="layer",
        ffn="mlp",
        use_bias=True,
        activation="gelu",            # tanh form == HF "gelu_new"
        ln_eps=hf_config.layer_norm_eps,
        parallel_residual=True,
        parallel_shared_norm=True,    # ONE input_layernorm feeds both
    )
    kw.update(overrides)
    return GPTConfig(**kw)


def phi_params(state_dict, config) -> dict:
    """PhiForCausalLM state dict -> GPT params pytree."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    c = config
    d, hq = c.d_model, c.num_heads
    hkv = c.num_kv_heads or hq
    dk = d // hq
    perm = _partial_rope_perm(dk, c.rope_dim or dk)

    def ln(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"]),
                "beta": _np(sd[f"{prefix}.bias"])}

    def heads(prefix, h):
        w = _np(sd[f"{prefix}.weight"]).T.reshape(d, h, dk)
        b = _np(sd[f"{prefix}.bias"]).reshape(h, dk)
        return w[..., perm], b[..., perm]

    params = {
        "embedding": {"table": _np(sd["embed_tokens.weight"])},
        "final_norm": ln("final_layernorm"),
        "lm_head": {"w": _np(state_dict["lm_head.weight"]).T,
                    "b": _np(state_dict["lm_head.bias"])},
    }
    for i in range(c.num_layers):
        p = f"layers.{i}"
        wq, bq = heads(f"{p}.self_attn.q_proj", hq)
        wk, bk = heads(f"{p}.self_attn.k_proj", hkv)
        params[f"layer_{i}"] = {
            "self_attention": {
                "wq": wq, "bq": bq, "wk": wk, "bk": bk,
                "wv": _np(sd[f"{p}.self_attn.v_proj.weight"]).T.reshape(
                    d, hkv, dk),
                "bv": _np(sd[f"{p}.self_attn.v_proj.bias"]).reshape(hkv, dk),
                "wo": _np(sd[f"{p}.self_attn.dense.weight"]).T.reshape(
                    hq, dk, d),
                "bo": _np(sd[f"{p}.self_attn.dense.bias"]),
            },
            "norm1": ln(f"{p}.input_layernorm"),   # shared: no norm2
            "dense1": {"linear": {
                "w": _np(sd[f"{p}.mlp.fc1.weight"]).T,
                "b": _np(sd[f"{p}.mlp.fc1.bias"])}},
            "dense2": {"w": _np(sd[f"{p}.mlp.fc2.weight"]).T,
                       "b": _np(sd[f"{p}.mlp.fc2.bias"])},
        }
    return params


def import_phi(model, **config_overrides):
    """``transformers.PhiForCausalLM`` (phi-1/phi-1.5/phi-2) ->
    (GPTConfig, params).

    Phi is the shared-norm parallel-residual form: ONE LayerNorm feeds
    both the attention and FFN branches (``parallel_shared_norm``), with
    partial rotary (``partial_rotary_factor``), biases on every
    projection, and an untied, BIASED LM head (``lm_head_bias``)."""
    cfg = phi_config(model.config, **config_overrides)
    return cfg, phi_params(model.state_dict(), cfg)


# ---- BERT (bidirectional encoder — the tenth family, first encoder-only) --

def bert_config(hf_config, **overrides):
    """``transformers.BertConfig`` -> :class:`models.BertConfig`.

    HF ``hidden_act="gelu"`` is the exact erf GELU (our ``gelu_exact``);
    ``gelu_new`` is the tanh approximation (our ``gelu``)."""
    from np_modeling_tpu.models.bert import BertConfig
    act = {"gelu": "gelu_exact", "gelu_new": "gelu",
           "relu": "relu"}[hf_config.hidden_act]
    kw = dict(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        num_heads=hf_config.num_attention_heads,
        num_layers=hf_config.num_hidden_layers,
        hidden_units=hf_config.intermediate_size,
        max_len=hf_config.max_position_embeddings,
        norm_first=False,                       # classic BERT is post-norm
        activation=act,
        ln_eps=hf_config.layer_norm_eps,
        type_vocab_size=hf_config.type_vocab_size,
        num_classes=getattr(hf_config, "num_labels", 2),
        mlm_head=False,
    )
    kw.update(overrides)
    return BertConfig(**kw)


def bert_params(state_dict, config) -> dict:
    """BERT state dict -> :class:`models.BertEncoder` params pytree.

    Accepts ``BertModel`` (bare), ``BertForMaskedLM`` (``bert.`` prefix +
    ``cls.predictions`` head) and ``BertForSequenceClassification``
    (``classifier``) key layouts. torch ``nn.Linear`` stores [out, in] —
    transposed here (unlike GPT-2's Conv1D [in, out])."""
    sd = {k.removeprefix("bert."): v for k, v in state_dict.items()}
    d, h = config.d_model, config.num_heads
    dk = d // h

    def lin(prefix):                              # torch Linear -> ours
        return {"w": _np(sd[f"{prefix}.weight"]).T,
                "b": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"]),
                "beta": _np(sd[f"{prefix}.bias"])}

    params = {
        "embedding": {"table": _np(sd["embeddings.word_embeddings.weight"])},
        "pos_embedding": {
            "table": _np(sd["embeddings.position_embeddings.weight"])},
        "embed_norm": ln("embeddings.LayerNorm"),
    }
    if config.type_vocab_size:
        params["type_embedding"] = {
            "table": _np(sd["embeddings.token_type_embeddings.weight"])}
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        a = f"{p}.attention"
        params[f"layer_{i}"] = {
            "self_attention": {
                "wq": _np(sd[f"{a}.self.query.weight"]).T.reshape(d, h, dk),
                "bq": _np(sd[f"{a}.self.query.bias"]).reshape(h, dk),
                "wk": _np(sd[f"{a}.self.key.weight"]).T.reshape(d, h, dk),
                "bk": _np(sd[f"{a}.self.key.bias"]).reshape(h, dk),
                "wv": _np(sd[f"{a}.self.value.weight"]).T.reshape(d, h, dk),
                "bv": _np(sd[f"{a}.self.value.bias"]).reshape(h, dk),
                "wo": _np(sd[f"{a}.output.dense.weight"]).T.reshape(h, dk, d),
                "bo": _np(sd[f"{a}.output.dense.bias"]),
            },
            "norm1": ln(f"{a}.output.LayerNorm"),
            "norm2": ln(f"{p}.output.LayerNorm"),
            "dense1": {"linear": lin(f"{p}.intermediate.dense")},
            "dense2": lin(f"{p}.output.dense"),
        }
    # Heads: present in the checkpoint or zero-filled (tanh(0) pooler and
    # zero classifier are inert; MLM import keeps them unused).
    params["pooler"] = (lin("pooler.dense") if "pooler.dense.weight" in sd
                        else {"w": np.zeros((d, d), np.float32),
                              "b": np.zeros((d,), np.float32)})
    params["classifier"] = (
        lin("classifier") if "classifier.weight" in sd
        else {"w": np.zeros((d, config.num_classes), np.float32),
              "b": np.zeros((config.num_classes,), np.float32)})
    if config.mlm_head:
        cp = "cls.predictions"
        params["mlm_transform"] = lin(f"{cp}.transform.dense")
        params["mlm_norm"] = ln(f"{cp}.transform.LayerNorm")
        params["mlm_bias"] = _np(sd[f"{cp}.bias"])
    return params


def import_bert(model, **config_overrides):
    """``transformers.BertModel`` / ``BertForMaskedLM`` /
    ``BertForSequenceClassification`` -> (BertConfig, params) for
    :class:`models.BertEncoder`.

    The reference has no encoder-only pretraining surface at all; this
    lands HF's canonical bidirectional encoder on the same
    TransformerEncoderBlock the GPT stack uses
    (/root/reference/layers/transformer.py:8-92 lineage)."""
    sd = model.state_dict()
    if any(k.startswith("cls.predictions") for k in sd):
        config_overrides.setdefault("mlm_head", True)
    cfg = bert_config(model.config, **config_overrides)
    return cfg, bert_params(sd, cfg)


# ---- ViT (vision transformer — the eleventh family, first vision) --------

def vit_config(hf_config, **overrides):
    """``transformers.ViTConfig`` -> :class:`models.ViTConfig`."""
    from np_modeling_tpu.models.vit import ViTConfig
    act = {"gelu": "gelu_exact", "gelu_new": "gelu",
           "relu": "relu"}[hf_config.hidden_act]
    kw = dict(
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        num_channels=hf_config.num_channels,
        d_model=hf_config.hidden_size,
        num_heads=hf_config.num_attention_heads,
        num_layers=hf_config.num_hidden_layers,
        hidden_units=hf_config.intermediate_size,
        activation=act,
        ln_eps=hf_config.layer_norm_eps,
        num_classes=getattr(hf_config, "num_labels", 1000),
    )
    kw.update(overrides)
    return ViTConfig(**kw)


def vit_params(state_dict, config) -> dict:
    """ViT state dict -> :class:`models.ViT` params pytree.

    Accepts ``ViTModel`` (bare, optional pooler) and
    ``ViTForImageClassification`` (``vit.`` prefix + ``classifier``).
    The HF stride-p conv patch kernel [d, c, p, p] becomes our single
    patch matmul: permuted to HWIO [p, p, c, d] then flattened to
    [p*p*c, d] — exactly the (ph, pw, c) order :func:`models.patchify`
    emits, so the two are numerically identical."""
    sd = {k.removeprefix("vit."): v for k, v in state_dict.items()}
    d, h = config.d_model, config.num_heads
    dk = d // h
    p = config.patch_size

    def lin(prefix):
        return {"w": _np(sd[f"{prefix}.weight"]).T,
                "b": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"]),
                "beta": _np(sd[f"{prefix}.bias"])}

    conv_w = _np(sd["embeddings.patch_embeddings.projection.weight"])
    params = {
        "cls_token": _np(sd["embeddings.cls_token"]),
        "pos_embedding": _np(sd["embeddings.position_embeddings"]),
        "patch_proj": {
            "w": conv_w.transpose(2, 3, 1, 0).reshape(-1, d),
            "b": _np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "final_norm": ln("layernorm"),
    }
    for i in range(config.num_layers):
        pre = f"encoder.layer.{i}"
        a = f"{pre}.attention.attention"
        params[f"layer_{i}"] = {
            "self_attention": {
                "wq": _np(sd[f"{a}.query.weight"]).T.reshape(d, h, dk),
                "bq": _np(sd[f"{a}.query.bias"]).reshape(h, dk),
                "wk": _np(sd[f"{a}.key.weight"]).T.reshape(d, h, dk),
                "bk": _np(sd[f"{a}.key.bias"]).reshape(h, dk),
                "wv": _np(sd[f"{a}.value.weight"]).T.reshape(d, h, dk),
                "bv": _np(sd[f"{a}.value.bias"]).reshape(h, dk),
                "wo": _np(sd[f"{pre}.attention.output.dense.weight"])
                      .T.reshape(h, dk, d),
                "bo": _np(sd[f"{pre}.attention.output.dense.bias"]),
            },
            "norm1": ln(f"{pre}.layernorm_before"),
            "norm2": ln(f"{pre}.layernorm_after"),
            "dense1": {"linear": lin(f"{pre}.intermediate.dense")},
            "dense2": lin(f"{pre}.output.dense"),
        }
    params["classifier"] = (
        lin("classifier") if "classifier.weight" in sd
        else {"w": np.zeros((d, config.num_classes), np.float32),
              "b": np.zeros((config.num_classes,), np.float32)})
    if config.pooler:
        params["pooler"] = lin("pooler.dense")
    return params


def import_vit(model, **config_overrides):
    """``transformers.ViTModel`` / ``ViTForImageClassification`` ->
    (ViTConfig, params) for :class:`models.ViT`.

    NOTE on inputs: HF ViT takes NCHW pixel_values; our ViT takes NHWC
    (TPU-native layout) — transpose with ``x.transpose(0, 2, 3, 1)``."""
    sd = model.state_dict()
    if any(k.startswith(("pooler.", "vit.pooler.")) for k in sd):
        config_overrides.setdefault("pooler", True)
    cfg = vit_config(model.config, **config_overrides)
    return cfg, vit_params(sd, cfg)


def clip_vision_config(hf_config, **overrides):
    """``transformers.CLIPVisionConfig`` -> :class:`models.ViTConfig`.

    CLIP towers are ViTs with a pre-encoder LayerNorm, a biasless patch
    conv, and quick-gelu MLPs."""
    from np_modeling_tpu.models.vit import ViTConfig
    act = {"gelu": "gelu_exact", "quick_gelu": "quick_gelu",
           "gelu_new": "gelu"}[hf_config.hidden_act]
    kw = dict(
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        num_channels=hf_config.num_channels,
        d_model=hf_config.hidden_size,
        num_heads=hf_config.num_attention_heads,
        num_layers=hf_config.num_hidden_layers,
        hidden_units=hf_config.intermediate_size,
        activation=act,
        ln_eps=hf_config.layer_norm_eps,
        pre_norm=True,
        patch_bias=False,
        num_classes=1,      # no classification head in a tower
    )
    kw.update(overrides)
    return ViTConfig(**kw)


def clip_vision_params(sd, config) -> dict:
    """CLIPVisionModel state dict (``vision_model.`` prefix stripped) ->
    :class:`models.ViT` params. Same conv-to-matmul patch re-layout as
    :func:`vit_params`."""
    d, h = config.d_model, config.num_heads
    dk = d // h

    def lin(prefix):
        return {"w": _np(sd[f"{prefix}.weight"]).T,
                "b": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"]),
                "beta": _np(sd[f"{prefix}.bias"])}

    conv_w = _np(sd["embeddings.patch_embedding.weight"])  # [d, c, p, p]
    params = {
        "cls_token": _np(sd["embeddings.class_embedding"]).reshape(1, 1, d),
        "pos_embedding": _np(
            sd["embeddings.position_embedding.weight"])[None],
        "patch_proj": {"w": conv_w.transpose(2, 3, 1, 0).reshape(-1, d)},
        "pre_norm": ln("pre_layrnorm"),          # [sic] HF's spelling
        "final_norm": ln("post_layernorm"),
    }
    for i in range(config.num_layers):
        pre = f"encoder.layers.{i}"
        a = f"{pre}.self_attn"
        params[f"layer_{i}"] = {
            "self_attention": {
                "wq": _np(sd[f"{a}.q_proj.weight"]).T.reshape(d, h, dk),
                "bq": _np(sd[f"{a}.q_proj.bias"]).reshape(h, dk),
                "wk": _np(sd[f"{a}.k_proj.weight"]).T.reshape(d, h, dk),
                "bk": _np(sd[f"{a}.k_proj.bias"]).reshape(h, dk),
                "wv": _np(sd[f"{a}.v_proj.weight"]).T.reshape(d, h, dk),
                "bv": _np(sd[f"{a}.v_proj.bias"]).reshape(h, dk),
                "wo": _np(sd[f"{a}.out_proj.weight"]).T.reshape(h, dk, d),
                "bo": _np(sd[f"{a}.out_proj.bias"]),
            },
            "norm1": ln(f"{pre}.layer_norm1"),
            "norm2": ln(f"{pre}.layer_norm2"),
            "dense1": {"linear": lin(f"{pre}.mlp.fc1")},
            "dense2": lin(f"{pre}.mlp.fc2"),
        }
    return params


def clip_text_config(hf_config, **overrides):
    """``transformers.CLIPTextConfig`` -> :class:`models.GPTConfig`.

    The CLIP text encoder is exactly our GPT shape: causal attention,
    learned positions, pre-LN blocks, biased projections, quick-gelu MLP.
    (``tie_embeddings`` stays True so init allocates no LM head — CLIP
    never computes token logits.)"""
    from np_modeling_tpu.models.transformer_lm import GPTConfig
    act = {"gelu": "gelu_exact", "quick_gelu": "quick_gelu",
           "gelu_new": "gelu"}[hf_config.hidden_act]
    kw = dict(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        num_heads=hf_config.num_attention_heads,
        num_layers=hf_config.num_hidden_layers,
        hidden_units=hf_config.intermediate_size,
        max_len=hf_config.max_position_embeddings,
        positional="learned",
        activation=act,
        ln_eps=hf_config.layer_norm_eps,
        norm_first=True,
        tie_embeddings=True,
    )
    kw.update(overrides)
    return GPTConfig(**kw)


def clip_text_params(sd, config) -> dict:
    """CLIPTextModel state dict (``text_model.`` prefix stripped) ->
    :class:`models.GPT` params. Same per-layer layout as
    :func:`clip_vision_params` (q/k/v/out projections, fc1/fc2 MLP)."""
    d, h = config.d_model, config.num_heads
    dk = d // h

    def lin(prefix):
        return {"w": _np(sd[f"{prefix}.weight"]).T,
                "b": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"]),
                "beta": _np(sd[f"{prefix}.bias"])}

    params = {
        "embedding": {"table": _np(sd["embeddings.token_embedding.weight"])},
        "pos_embedding": {"table": _np(
            sd["embeddings.position_embedding.weight"])},
        "final_norm": ln("final_layer_norm"),
    }
    for i in range(config.num_layers):
        pre = f"encoder.layers.{i}"
        a = f"{pre}.self_attn"
        params[f"layer_{i}"] = {
            "self_attention": {
                "wq": _np(sd[f"{a}.q_proj.weight"]).T.reshape(d, h, dk),
                "bq": _np(sd[f"{a}.q_proj.bias"]).reshape(h, dk),
                "wk": _np(sd[f"{a}.k_proj.weight"]).T.reshape(d, h, dk),
                "bk": _np(sd[f"{a}.k_proj.bias"]).reshape(h, dk),
                "wv": _np(sd[f"{a}.v_proj.weight"]).T.reshape(d, h, dk),
                "bv": _np(sd[f"{a}.v_proj.bias"]).reshape(h, dk),
                "wo": _np(sd[f"{a}.out_proj.weight"]).T.reshape(h, dk, d),
                "bo": _np(sd[f"{a}.out_proj.bias"]),
            },
            "norm1": ln(f"{pre}.layer_norm1"),
            "norm2": ln(f"{pre}.layer_norm2"),
            "dense1": {"linear": lin(f"{pre}.mlp.fc1")},
            "dense2": lin(f"{pre}.mlp.fc2"),
        }
    return params


def import_clip(model, **config_overrides):
    """``transformers.CLIPModel`` -> (CLIPConfig, params) for
    :class:`models.CLIP`.

    Contrastive two-tower family: CLIP vision tower + causal text
    encoder behind biasless projections and a learned log temperature.

    Pooling parity: HF's text encoder pools at ``argmax(input_ids)`` when
    ``eos_token_id == 2`` (the legacy path — original CLIP's EOS is the
    highest vocab id) and at the first EOS occurrence otherwise; we map
    the former to ``eos_token=None``. NOTE on inputs: HF takes NCHW
    ``pixel_values``; our ViT takes NHWC — transpose with
    ``pixel_values.transpose(0, 2, 3, 1)``. Overrides prefixed
    ``text_``/``vision_`` route to the tower configs."""
    from np_modeling_tpu.models.clip import CLIPConfig
    hc = model.config
    text_over = {k[5:]: config_overrides.pop(k)
                 for k in list(config_overrides) if k.startswith("text_")}
    vis_over = {k[7:]: config_overrides.pop(k)
                for k in list(config_overrides) if k.startswith("vision_")}
    eos = hc.text_config.eos_token_id
    cfg = CLIPConfig(
        vision=clip_vision_config(hc.vision_config, **vis_over),
        text=clip_text_config(hc.text_config, **text_over),
        projection_dim=hc.projection_dim,
        eos_token=None if eos == 2 else eos,
        **config_overrides)

    sd = model.state_dict()
    vis_sd = {k.removeprefix("vision_model."): v for k, v in sd.items()
              if k.startswith("vision_model.")}
    txt_sd = {k.removeprefix("text_model."): v for k, v in sd.items()
              if k.startswith("text_model.")}
    params = {
        "vision": clip_vision_params(vis_sd, cfg.vision),
        "text": clip_text_params(txt_sd, cfg.text),
        "visual_projection": {"w": _np(sd["visual_projection.weight"]).T},
        "text_projection": {"w": _np(sd["text_projection.weight"]).T},
        "logit_scale": _np(sd["logit_scale"]),
    }
    return cfg, params


def import_mamba(model, **config_overrides):
    """``transformers.MambaForCausalLM`` -> (MambaConfig, params) for
    :class:`models.Mamba` (first non-transformer family).

    Torch-parity vs HF's sequential ``slow_forward`` path; our forward
    runs the same recurrence as an associative-scan parallel prefix.
    Layout notes: HF conv1d weight is [d_inner, 1, k] (depthwise) -> our
    [k, d_inner]; all projections transpose torch's [out, in]."""
    from np_modeling_tpu.models.mamba import MambaConfig
    hc = model.config
    assert not getattr(hc, "use_bias", False), (
        "in/out_proj biases are not represented (HF default use_bias="
        "False)")
    rank = hc.time_step_rank
    if rank == "auto":
        rank = -(-hc.hidden_size // 16)
    cfg_kw = dict(
        vocab_size=hc.vocab_size,
        d_model=hc.hidden_size,
        num_layers=hc.num_hidden_layers,
        d_state=hc.state_size,
        d_conv=hc.conv_kernel,
        expand=hc.expand,
        dt_rank=int(rank),
        ln_eps=hc.layer_norm_epsilon,
        tie_embeddings=getattr(hc, "tie_word_embeddings", True),
    )
    cfg_kw.update(config_overrides)
    cfg = MambaConfig(**cfg_kw)

    sd = {k.removeprefix("backbone."): v for k, v in model.state_dict()
          .items()}
    di = cfg.d_inner
    params = {
        "embedding": {"table": _np(sd["embeddings.weight"])},
        "final_norm": {"gamma": _np(sd["norm_f.weight"])},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {"w": _np(sd["lm_head.weight"]).T}
    for i in range(cfg.num_layers):
        p = f"layers.{i}.mixer"
        conv_w = _np(sd[f"{p}.conv1d.weight"])         # [d_inner, 1, k]
        conv_b = (_np(sd[f"{p}.conv1d.bias"])
                  if f"{p}.conv1d.bias" in sd else np.zeros(di, np.float32))
        params[f"layer_{i}"] = {
            "norm": {"gamma": _np(sd[f"layers.{i}.norm.weight"])},
            "mixer": {
                "A_log": _np(sd[f"{p}.A_log"]),
                "D": _np(sd[f"{p}.D"]),
                "conv_w": conv_w[:, 0, :].T,           # -> [k, d_inner]
                "conv_b": conv_b,
                "in_proj": {"w": _np(sd[f"{p}.in_proj.weight"]).T},
                "x_proj": {"w": _np(sd[f"{p}.x_proj.weight"]).T},
                "dt_proj": {"w": _np(sd[f"{p}.dt_proj.weight"]).T,
                            "b": _np(sd[f"{p}.dt_proj.bias"])},
                "out_proj": {"w": _np(sd[f"{p}.out_proj.weight"]).T},
            },
        }
    return cfg, params


def import_mamba2(model, **config_overrides):
    """``transformers.Mamba2ForCausalLM`` -> (Mamba2Config, params) for
    :class:`models.Mamba2`.

    Torch-parity vs HF's chunked ``torch_forward`` path; our forward
    runs the same SSD decomposition as MXU einsums (``ops.ssd``).
    Layout notes: HF conv1d weight is [conv_dim, 1, k] (depthwise over
    the shared x|B|C channels) -> our [k, conv_dim]; projections
    transpose torch's [out, in]. HF's optional d_mlp split (extra gated
    MLP columns in in_proj) is not represented — zero for every
    published Mamba-2 checkpoint."""
    from np_modeling_tpu.models.mamba2 import Mamba2Config
    hc = model.config
    assert not getattr(hc, "use_bias", False), (
        "in/out_proj biases are not represented (HF default use_bias="
        "False)")
    assert hc.expand * hc.hidden_size == hc.num_heads * hc.head_dim, (
        "d_mlp != 0 (in_proj carries extra gated-MLP columns) is not "
        "supported")
    cfg_kw = dict(
        vocab_size=hc.vocab_size,
        d_model=hc.hidden_size,
        num_layers=hc.num_hidden_layers,
        d_state=hc.state_size,
        d_conv=hc.conv_kernel,
        expand=hc.expand,
        head_dim=hc.head_dim,
        n_groups=hc.n_groups,
        chunk_size=hc.chunk_size,
        dt_limit=tuple(getattr(hc, "time_step_limit", (0.0, float("inf")))),
        ln_eps=hc.layer_norm_epsilon,
        tie_embeddings=getattr(hc, "tie_word_embeddings", True),
    )
    cfg_kw.update(config_overrides)
    cfg = Mamba2Config(**cfg_kw)

    sd = {k.removeprefix("backbone."): v for k, v in model.state_dict()
          .items()}
    params = {
        "embedding": {"table": _np(sd["embeddings.weight"])},
        "final_norm": {"gamma": _np(sd["norm_f.weight"])},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {"w": _np(sd["lm_head.weight"]).T}
    for i in range(cfg.num_layers):
        p = f"layers.{i}.mixer"
        conv_w = _np(sd[f"{p}.conv1d.weight"])         # [conv_dim, 1, k]
        conv_b = (_np(sd[f"{p}.conv1d.bias"]) if f"{p}.conv1d.bias" in sd
                  else np.zeros(cfg.conv_dim, np.float32))
        params[f"layer_{i}"] = {
            "norm": {"gamma": _np(sd[f"layers.{i}.norm.weight"])},
            "mixer": {
                "A_log": _np(sd[f"{p}.A_log"]),
                "D": _np(sd[f"{p}.D"]),
                "dt_bias": _np(sd[f"{p}.dt_bias"]),
                "conv_w": conv_w[:, 0, :].T,           # -> [k, conv_dim]
                "conv_b": conv_b,
                "in_proj": {"w": _np(sd[f"{p}.in_proj.weight"]).T},
                "norm": {"gamma": _np(sd[f"{p}.norm.weight"])},
                "out_proj": {"w": _np(sd[f"{p}.out_proj.weight"]).T},
            },
        }
    return cfg, params


def import_llava(model, **config_overrides):
    """``transformers.LlavaForConditionalGeneration`` ->
    (LLaVAConfig, params) for :class:`models.LLaVA`.

    First multimodal family: CLIP vision tower (read at
    ``vision_feature_layer``, [CLS] dropped under the "default" select
    strategy) -> 2-layer gelu projector -> features spliced at
    ``image_token_index`` placeholders -> LLaMA-architecture LM.

    NOTE on inputs: HF takes NCHW ``pixel_values``; our ViT takes NHWC —
    transpose with ``pixel_values.transpose(0, 2, 3, 1)``. Config
    overrides prefixed ``text_``/``vision_`` are routed to the LM /
    tower configs (e.g. ``text_dtype=jnp.bfloat16``)."""
    from np_modeling_tpu.models.multimodal import LLaVAConfig
    hc = model.config
    act = {"gelu": "gelu_exact", "gelu_new": "gelu",
           "quick_gelu": "quick_gelu"}[hc.projector_hidden_act]
    text_over = {k[5:]: config_overrides.pop(k)
                 for k in list(config_overrides) if k.startswith("text_")}
    vis_over = {k[7:]: config_overrides.pop(k)
                for k in list(config_overrides) if k.startswith("vision_")}
    vcfg = clip_vision_config(hc.vision_config, **vis_over)
    tcfg = llama_config(hc.text_config, **text_over)
    cfg = LLaVAConfig(
        vision=vcfg, text=tcfg, image_token=hc.image_token_index,
        vision_feature_layer=hc.vision_feature_layer,
        vision_select=hc.vision_feature_select_strategy,
        projector_act=act,
        projector_bias=hc.multimodal_projector_bias,
        **config_overrides)

    sd = model.state_dict()
    vis_sd = {k.removeprefix("model.vision_tower.vision_model."): v
              for k, v in sd.items()
              if k.startswith("model.vision_tower.")}
    lm_sd = {k.removeprefix("model.language_model."): v
             for k, v in sd.items()
             if k.startswith("model.language_model.")}
    if "lm_head.weight" in sd:
        lm_sd["lm_head.weight"] = sd["lm_head.weight"]

    def plin(name):
        p = {"w": _np(sd[f"model.multi_modal_projector.{name}.weight"]).T}
        if cfg.projector_bias:
            p["b"] = _np(sd[f"model.multi_modal_projector.{name}.bias"])
        return p

    params = {
        "vision": clip_vision_params(vis_sd, vcfg),
        "projector": {"linear_1": plin("linear_1"),
                      "linear_2": plin("linear_2")},
        "lm": llama_params(lm_sd, tcfg),
    }
    return cfg, params


# ---- Gemma 2 (softcapped, sandwich-norm, alternating-window family) ------

def import_gemma2(model, **config_overrides):
    """``transformers.Gemma2ForCausalLM`` -> (GPTConfig, params).

    Gemma 2 = Gemma (zero-centered RMSNorm, geglu, embed scaling,
    decoupled head_dim, tied embeddings) plus four new architecture knobs,
    all first-class here:

    - ``attn_logit_softcap``: cap*tanh(s/cap) on the scaled attention
      scores — runs INSIDE the flash kernels (fwd + both backwards);
    - ``final_logit_softcap`` on the LM-head logits;
    - ``query_pre_attn_scalar``: attention scale q_p**-0.5 instead of
      head_dim**-0.5;
    - sandwich norms (``sandwich_norm``): a second RMSNorm on each
      sublayer OUTPUT before its residual add — HF's
      ``post_attention_layernorm`` is that post-norm (NOT the LLaMA
      pre-FFN norm llama_params assumes), and ``pre/post_feedforward
      _layernorm`` bracket the FFN;
    - alternating local/global attention (``window_pattern=2``: even
      layers slide, odd attend globally — HF masks sliding on
      ``not bool(layer_idx % 2)``).
    """
    hc = model.config
    act = getattr(hc, "hidden_activation", None)
    assert act in (None, "gelu_pytorch_tanh"), act
    kw = dict(rms_offset=True, ffn="geglu", embed_scale=True,
              sandwich_norm=True,
              attention_window=hc.sliding_window, window_pattern=2,
              attn_logit_softcap=hc.attn_logit_softcapping,
              final_logit_softcap=hc.final_logit_softcapping,
              query_pre_attn_scalar=float(hc.query_pre_attn_scalar))
    kw.update(config_overrides)
    cfg = llama_config(hc, **kw)
    state_dict = model.state_dict()
    params = llama_params(state_dict, cfg)
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    for i in range(cfg.num_layers):
        p = f"layers.{i}"
        lp = params[f"layer_{i}"]
        # llama_params put HF post_attention_layernorm into norm2; in
        # Gemma 2 that weight is the attention POST-norm.
        lp["post_norm1"] = lp.pop("norm2")
        lp["norm2"] = {
            "gamma": _np(sd[f"{p}.pre_feedforward_layernorm.weight"])}
        lp["post_norm2"] = {
            "gamma": _np(sd[f"{p}.post_feedforward_layernorm.weight"])}
    return cfg, params


# ---- Qwen3 (QK-norm family) -----------------------------------------------

def import_qwen3(model, **config_overrides):
    """``transformers.Qwen3ForCausalLM`` -> (GPTConfig, params).

    Qwen3 = the LLaMA layout (biasless, GQA, decoupled head_dim) plus
    per-head RMSNorm on q and k over head_dim BEFORE RoPE (``qk_norm``;
    eps = rms_norm_eps). The q/k projections get the usual half-split ->
    interleaved RoPE feature permutation — and so must the norm gammas:
    the RMS reduction is permutation-invariant, but the elementwise gamma
    multiply must follow its feature (gamma_ours = gamma_hf[perm])."""
    hc = model.config
    kw = dict(qk_norm=True,
              attention_window=(hc.sliding_window
                                if getattr(hc, "use_sliding_window", False)
                                else None))
    kw.update(config_overrides)
    cfg = llama_config(hc, **kw)
    state_dict = model.state_dict()
    params = llama_params(state_dict, cfg)
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    dk = cfg.head_dim or cfg.d_model // cfg.num_heads
    perm = _rope_perm(dk)
    for i in range(cfg.num_layers):
        ap = params[f"layer_{i}"]["self_attention"]
        p = f"layers.{i}.self_attn"
        ap["q_norm"] = {"gamma": _np(sd[f"{p}.q_norm.weight"])[perm]}
        ap["k_norm"] = {"gamma": _np(sd[f"{p}.k_norm.weight"])[perm]}
    return cfg, params


# ---- DeepSeek-V2 (MLA: multi-head latent attention + shared-expert MoE) ---

def import_deepseek_v2(model, **config_overrides):
    """``transformers.DeepseekV2ForCausalLM`` -> (GPTConfig, params).

    DeepSeek-V2 brings TWO architecture families in one checkpoint:

    - MLA (``mla=`` on the config -> nn.mla.MLAttention): low-rank q
      (optional), a per-token latent cache of kv_lora_rank + rope numbers,
      per-head (k_nope, v) expanded from the latent, a SHARED rope key.
      HF's rotary here is the complex/interleaved form — exactly our
      apply_rope pairing, so q_pe/k_pe import with NO feature permutation
      (unlike LLaMA's half-split layout).
    - DeepSeek MoE: softmax router, top-k with RAW gate weights
      (``router_weights="softmax"``) scaled by routed_scaling_factor,
      always-on shared experts, and the first ``first_k_dense_replace``
      layers dense (``moe_first_dense``). No-drop dispatch: exact.

    Both ``topk_method="greedy"`` (-Lite) and ``"group_limited_greedy"``
    (the full V2/V2-Chat device-grouped routing, ``moe_router_groups=
    (n_group, topk_group)``) are supported and parity tested. The
    production checkpoints' YaRN ``rope_scaling`` is supported (the
    mscale/mscale_all_dim pair cancels to attention_factor 1.0 for
    DeepSeek's configs; parity tested)."""
    hc = model.config
    assert not getattr(hc, "attention_bias", False)
    moe = hc.n_routed_experts is not None
    if moe:
        assert hc.topk_method in ("greedy", "group_limited_greedy"), (
            f"topk_method {hc.topk_method!r} unsupported")
        assert not getattr(hc, "norm_topk_prob", False), (
            "norm_topk_prob=True checkpoints renormalize the kept gate "
            "weights; map with moe_router_weights='softmax_norm' "
            "explicitly after checking the target's actual semantics")
    kw = dict(
        ffn="swiglu",
        tie_embeddings=bool(hc.tie_word_embeddings),
        mla=dict(kv_lora_rank=hc.kv_lora_rank,
                 q_lora_rank=hc.q_lora_rank,
                 qk_nope_head_dim=hc.qk_nope_head_dim,
                 qk_rope_head_dim=hc.qk_rope_head_dim,
                 v_head_dim=hc.v_head_dim),
    )
    if moe:
        kw.update(
            moe_experts=hc.n_routed_experts,
            moe_top_k=hc.num_experts_per_tok,
            moe_capacity_factor=None,            # exact no-drop routing
            moe_router_weights="softmax",
            moe_routed_scaling=float(hc.routed_scaling_factor),
            moe_shared_units=(hc.moe_intermediate_size
                              * (hc.n_shared_experts or 0)),
            moe_hidden_units=hc.moe_intermediate_size,
            moe_first_dense=hc.first_k_dense_replace,
            moe_router_groups=((hc.n_group, hc.topk_group)
                               if hc.topk_method == "group_limited_greedy"
                               else None),
        )
    kw.update(config_overrides)
    cfg = llama_config(hc, **kw)
    return cfg, _deepseek_params(model, cfg, moe)


def _deepseek_params(model, c, moe):
    """Shared DeepSeek-V2/V3 state-dict mapping (MLA + MoE layers)."""
    sd = {k.removeprefix("model."): v for k, v in model.state_dict().items()}
    hq = c.num_heads
    m = c.mla
    nope, rope = m["qk_nope_head_dim"], m["qk_rope_head_dim"]
    vd, rank = m["v_head_dim"], m["kv_lora_rank"]

    def gamma(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"])}

    params = {
        "embedding": {"table": _np(sd["embed_tokens.weight"])},
        "final_norm": gamma("norm"),
    }
    if not c.tie_embeddings:
        params["lm_head"] = {"w": _np(model.state_dict()["lm_head.weight"]).T}

    def swiglu(prefix):
        return {"w_gate": _np(sd[f"{prefix}.gate_proj.weight"]).T,
                "w_up": _np(sd[f"{prefix}.up_proj.weight"]).T,
                "w_down": _np(sd[f"{prefix}.down_proj.weight"]).T}

    for i in range(c.num_layers):
        p = f"layers.{i}"
        a = f"{p}.self_attn"
        attn = {
            "kv_a": _np(sd[f"{a}.kv_a_proj_with_mqa.weight"]).T,
            "kv_a_norm": gamma(f"{a}.kv_a_layernorm"),
            "kv_b": _np(sd[f"{a}.kv_b_proj.weight"]).T.reshape(
                rank, hq, nope + vd),
            "wo": _np(sd[f"{a}.o_proj.weight"]).T.reshape(hq, vd, -1),
        }
        if m["q_lora_rank"] is None:
            attn["wq"] = _np(sd[f"{a}.q_proj.weight"]).T.reshape(
                -1, hq, nope + rope)
        else:
            attn["q_a"] = _np(sd[f"{a}.q_a_proj.weight"]).T
            attn["q_a_norm"] = gamma(f"{a}.q_a_layernorm")
            attn["q_b"] = _np(sd[f"{a}.q_b_proj.weight"]).T.reshape(
                m["q_lora_rank"], hq, nope + rope)
        lp = {
            "self_attention": attn,
            "norm1": gamma(f"{p}.input_layernorm"),
            "norm2": gamma(f"{p}.post_attention_layernorm"),
        }
        if moe and i >= c.moe_first_dense:
            moe_p = {
                "router": _np(sd[f"{p}.mlp.gate.weight"]).T,   # [d, E]
                **({"router_sb": _np(
                        sd[f"{p}.mlp.gate.e_score_correction_bias"])}
                   if c.moe_router_select_bias else {}),
                "w_gate": np.stack([
                    _np(sd[f"{p}.mlp.experts.{e}.gate_proj.weight"]).T
                    for e in range(c.moe_experts)]),
                "w_up": np.stack([
                    _np(sd[f"{p}.mlp.experts.{e}.up_proj.weight"]).T
                    for e in range(c.moe_experts)]),
                "w_down": np.stack([
                    _np(sd[f"{p}.mlp.experts.{e}.down_proj.weight"]).T
                    for e in range(c.moe_experts)]),
            }
            if c.moe_shared_units:
                moe_p["shared"] = swiglu(f"{p}.mlp.shared_experts")
            lp["moe"] = moe_p
        else:
            lp["swiglu"] = swiglu(f"{p}.mlp")
        params[f"layer_{i}"] = lp
    return params


def import_deepseek_v3(model, **config_overrides):
    """``transformers.DeepseekV3ForCausalLM`` -> (GPTConfig, params).

    DeepSeek-V3/R1 architecture = the V2 body (MLA latent attention,
    shared experts, first-k-dense) with the noaux-tc router: SIGMOID
    expert scores, a per-expert selection-only correction bias
    (``e_score_correction_bias`` — DeepSeek's aux-free load balancing
    adjusts it online instead of a gradient aux loss), group-limited
    routing scored by the SUM OF THE TOP-2 biased scores per group, and
    renormalized kept weights (``norm_topk_prob``) times
    ``routed_scaling_factor``. Maps onto ``moe_router_score="sigmoid"``,
    ``moe_router_select_bias=True``, ``moe_group_metric="top2sum"``,
    ``moe_router_weights="softmax_norm"``. No-drop dispatch: exact.

    HF reference: DeepseekV3TopkRouter.get_topk_indices/forward
    (transformers 4.57). Only ``rope_interleave=True`` checkpoints (the
    published ones) are supported — that is exactly our apply_rope
    pairing, so q_pe/k_pe import with no feature permutation."""
    hc = model.config
    assert not getattr(hc, "attention_bias", False)
    assert getattr(hc, "rope_interleave", True), (
        "rope_interleave=False would need the LLaMA half-split feature "
        "permutation on q_pe/k_pe")
    kw = dict(
        ffn="swiglu",
        tie_embeddings=bool(hc.tie_word_embeddings),
        mla=dict(kv_lora_rank=hc.kv_lora_rank,
                 q_lora_rank=hc.q_lora_rank,
                 qk_nope_head_dim=hc.qk_nope_head_dim,
                 qk_rope_head_dim=hc.qk_rope_head_dim,
                 v_head_dim=hc.v_head_dim),
        moe_experts=hc.n_routed_experts,
        moe_top_k=hc.num_experts_per_tok,
        moe_capacity_factor=None,            # exact no-drop routing
        moe_router_weights=("softmax_norm" if hc.norm_topk_prob
                            else "softmax"),
        moe_router_score="sigmoid",
        moe_router_select_bias=True,
        moe_group_metric="top2sum",
        moe_routed_scaling=float(hc.routed_scaling_factor),
        moe_shared_units=(hc.moe_intermediate_size
                          * (hc.n_shared_experts or 0)),
        moe_hidden_units=hc.moe_intermediate_size,
        moe_first_dense=hc.first_k_dense_replace,
        moe_router_groups=(hc.n_group, hc.topk_group),
    )
    kw.update(config_overrides)
    cfg = llama_config(hc, **kw)
    return cfg, _deepseek_params(model, cfg, moe=True)


# ---- Whisper (speech-to-text encoder-decoder — the first audio family) ---

def import_whisper(model, **config_overrides):
    """``transformers.WhisperForConditionalGeneration`` ->
    (WhisperConfig, params) for :class:`models.Whisper`.

    Input layout: HF takes [b, n_mels, frames]; ours is time-major
    [b, frames, n_mels] (transpose with ``mel.swapaxes(1, 2)``). torch
    Conv1d kernels [out, in, k] become our height-1 HWIO [1, k, in, out].
    HF's k_proj has NO bias — imported as zeros (exact). The sinusoidal
    encoder position table is stored in the checkpoint and loaded
    verbatim."""
    from np_modeling_tpu.models.whisper import WhisperConfig
    hc = model.config
    kw = dict(
        vocab_size=hc.vocab_size,
        n_mels=hc.num_mel_bins,
        num_audio_positions=hc.max_source_positions,
        max_target_positions=hc.max_target_positions,
        d_model=hc.d_model,
        num_heads=hc.encoder_attention_heads,
        num_encoder_layers=hc.encoder_layers,
        num_decoder_layers=hc.decoder_layers,
        d_ff=hc.encoder_ffn_dim,
    )
    kw.update(config_overrides)
    cfg = WhisperConfig(**kw)
    assert hc.activation_function == "gelu", hc.activation_function
    assert hc.decoder_attention_heads == hc.encoder_attention_heads, (
        "our Whisper shares one head count across stacks; a divergent "
        "decoder_attention_heads would silently regroup q/k/v")
    assert hc.decoder_ffn_dim == hc.encoder_ffn_dim

    sd = {k.removeprefix("model."): v for k, v in model.state_dict().items()}
    d, h = cfg.d_model, cfg.num_heads
    dk = d // h

    def conv(prefix):                        # torch [out, in, k] -> HWIO
        w = _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0)
        return {"w": w[None], "b": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"]),
                "beta": _np(sd[f"{prefix}.bias"])}

    def attn(prefix):
        def wmat(name):
            return _np(sd[f"{prefix}.{name}.weight"]).T.reshape(d, h, dk)

        def bvec(name):                      # k_proj carries no bias in HF
            key = f"{prefix}.{name}.bias"
            b = (_np(sd[key]) if key in sd
                 else np.zeros((d,), np.float32))
            return b.reshape(h, dk)

        return {
            "wq": wmat("q_proj"), "bq": bvec("q_proj"),
            "wk": wmat("k_proj"), "bk": bvec("k_proj"),
            "wv": wmat("v_proj"), "bv": bvec("v_proj"),
            "wo": _np(sd[f"{prefix}.out_proj.weight"]).T.reshape(h, dk, d),
            "bo": _np(sd[f"{prefix}.out_proj.bias"]),
        }

    def ffn(prefix):
        return {"wi": _np(sd[f"{prefix}.fc1.weight"]).T,
                "bi": _np(sd[f"{prefix}.fc1.bias"]),
                "wo": _np(sd[f"{prefix}.fc2.weight"]).T,
                "bo": _np(sd[f"{prefix}.fc2.bias"])}

    params = {
        "embedding": {"table": _np(sd["decoder.embed_tokens.weight"])},
        "conv1": conv("encoder.conv1"),
        "conv2": conv("encoder.conv2"),
        "enc_positions": _np(sd["encoder.embed_positions.weight"]),
        "dec_positions": _np(sd["decoder.embed_positions.weight"]),
        "enc_norm": ln("encoder.layer_norm"),
        "dec_norm": ln("decoder.layer_norm"),
    }
    for i in range(cfg.num_encoder_layers):
        p = f"encoder.layers.{i}"
        params[f"enc_{i}"] = {
            "self_attention": attn(f"{p}.self_attn"),
            "norm1": ln(f"{p}.self_attn_layer_norm"),
            "norm2": ln(f"{p}.final_layer_norm"),
            "ffn": ffn(p),
        }
    for i in range(cfg.num_decoder_layers):
        p = f"decoder.layers.{i}"
        params[f"dec_{i}"] = {
            "self_attention": attn(f"{p}.self_attn"),
            "cross_attention": attn(f"{p}.encoder_attn"),
            "norm1": ln(f"{p}.self_attn_layer_norm"),
            "norm2": ln(f"{p}.encoder_attn_layer_norm"),
            "norm3": ln(f"{p}.final_layer_norm"),
            "ffn": ffn(p),
        }
    return cfg, params


def import_qwen3_moe(model, **config_overrides):
    """``transformers.Qwen3MoeForCausalLM`` -> (GPTConfig, params).

    Qwen3 attention (QK-norm, permuted gammas — see :func:`import_qwen3`)
    with Mixtral-layout SwiGLU experts and RENORMALIZED top-k routing:
    HF softmaxes the router logits, takes top-k, then (norm_topk_prob,
    True for the published checkpoints) divides the kept weights by
    their sum — exactly ``moe_router_weights="softmax_norm"`` on the
    no-drop dispatch. Only the all-sparse layout is supported
    (``decoder_sparse_step == 1``, no ``mlp_only_layers``)."""
    hc = model.config
    assert getattr(hc, "decoder_sparse_step", 1) == 1, (
        "interleaved dense/sparse layers (decoder_sparse_step > 1) are "
        "not mapped")
    assert not getattr(hc, "mlp_only_layers", []), (
        "mlp_only_layers (per-index dense layers) is not mapped")
    kw = dict(
        qk_norm=True,
        moe_experts=hc.num_experts,
        moe_top_k=hc.num_experts_per_tok,
        moe_capacity_factor=None,          # exact no-drop routing
        moe_router_weights=("softmax_norm" if hc.norm_topk_prob
                            else "softmax"),
        moe_hidden_units=hc.moe_intermediate_size,
        attention_window=(hc.sliding_window
                          if getattr(hc, "use_sliding_window", False)
                          else None),
    )
    kw.update(config_overrides)
    cfg = llama_config(hc, **kw)
    state_dict = model.state_dict()
    params = llama_params(state_dict, cfg)
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    dk = cfg.head_dim or cfg.d_model // cfg.num_heads
    perm = _rope_perm(dk)
    for i in range(cfg.num_layers):
        ap = params[f"layer_{i}"]["self_attention"]
        a = f"layers.{i}.self_attn"
        ap["q_norm"] = {"gamma": _np(sd[f"{a}.q_norm.weight"])[perm]}
        ap["k_norm"] = {"gamma": _np(sd[f"{a}.k_norm.weight"])[perm]}
        p = f"layers.{i}.mlp"
        params[f"layer_{i}"]["moe"] = {
            "router": _np(sd[f"{p}.gate.weight"]).T,
            "w_gate": np.stack([
                _np(sd[f"{p}.experts.{e}.gate_proj.weight"]).T
                for e in range(cfg.moe_experts)]),
            "w_up": np.stack([
                _np(sd[f"{p}.experts.{e}.up_proj.weight"]).T
                for e in range(cfg.moe_experts)]),
            "w_down": np.stack([
                _np(sd[f"{p}.experts.{e}.down_proj.weight"]).T
                for e in range(cfg.moe_experts)]),
        }
    return cfg, params


# ---- gpt-oss (attention sinks + clamped-GLU MoE) --------------------------

def import_gpt_oss(model, **config_overrides):
    """``transformers.GptOssForCausalLM`` -> (GPTConfig, params).

    OpenAI's open-weight architecture, all parts first-class here:

    - ATTENTION SINKS (``attn_sinks``): a learnable per-head logit joins
      every row's softmax as a virtual no-value key. Runs as a
      post-flash-kernel rescale ``o * sigmoid(lse - sink)`` with the
      standard FA2 backward exact against the sink-inclusive lse
      (ops.attention._attn_sinks) — fully differentiable incl. dsinks.
    - Alternating sliding/full attention (``layer_types``: even layers
      slide — our ``window_pattern=2``), biased q/k/v/o projections
      (RoPE feature permutation applied to weights AND biases), YaRN
      rope scaling.
    - MoE with a BIASED router, top-k over the raw LOGITS then softmax
      over the kept k (``router_weights="topk_softmax"``), and
      clamped-GLU experts (``ffn="glu_clamp"``: gate clamped at +7, up
      at +-7, ``(up+1) * gate*sigmoid(1.702*gate)``, biased matmuls).
      HF stores gate/up INTERLEAVED in one [E, d, 2ff] tensor —
      deinterleaved here. No-drop dispatch: exact.
    """
    hc = model.config
    lt = list(getattr(hc, "layer_types", []))
    assert lt and all(
        t == ("sliding_attention" if i % 2 == 0 else "full_attention")
        for i, t in enumerate(lt)), (
        f"unexpected layer_types {lt} (expected even-sliding alternation)")
    kw = dict(
        use_bias=True,                    # q/k/v/o biased (FFN is MoE)
        ffn="glu_clamp",
        attn_sinks=True,
        attention_window=hc.sliding_window, window_pattern=2,
        moe_experts=hc.num_local_experts,
        moe_top_k=hc.num_experts_per_tok,
        moe_capacity_factor=None,
        moe_router_weights="topk_softmax",
        moe_router_bias=True,
        moe_hidden_units=hc.intermediate_size,
    )
    kw.update(config_overrides)
    cfg = llama_config(hc, **kw)
    c = cfg

    # llama_params handles the shared plumbing (embeddings, norms,
    # RoPE-permuted q/k reshapes, wo, lm_head); gpt-oss adds the biases
    # (same permutation), the sinks, and the fused-expert MoE tensors.
    state_dict = model.state_dict()
    params = llama_params(state_dict, cfg)
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    hq = c.num_heads
    hkv = c.num_kv_heads or hq
    dk = c.head_dim or c.d_model // hq
    perm = _rope_perm(dk)
    for i in range(c.num_layers):
        p = f"layers.{i}"
        a = f"{p}.self_attn"
        ap = params[f"layer_{i}"]["self_attention"]
        ap["bq"] = _np(sd[f"{a}.q_proj.bias"]).reshape(hq, dk)[:, perm]
        ap["bk"] = _np(sd[f"{a}.k_proj.bias"]).reshape(hkv, dk)[:, perm]
        ap["bv"] = _np(sd[f"{a}.v_proj.bias"]).reshape(hkv, dk)
        ap["bo"] = _np(sd[f"{a}.o_proj.bias"])
        ap["sinks"] = _np(sd[f"{a}.sinks"])
        gu_w = _np(sd[f"{p}.mlp.experts.gate_up_proj"])      # [E, d, 2ff]
        gu_b = _np(sd[f"{p}.mlp.experts.gate_up_proj_bias"])  # [E, 2ff]
        params[f"layer_{i}"]["moe"] = {
            "router": _np(sd[f"{p}.mlp.router.weight"]).T,
            "router_b": _np(sd[f"{p}.mlp.router.bias"]),
            "w_gate": gu_w[..., 0::2], "b_gate": gu_b[:, 0::2],
            "w_up": gu_w[..., 1::2], "b_up": gu_b[:, 1::2],
            "w_down": _np(sd[f"{p}.mlp.experts.down_proj"]),
            "b_down": _np(sd[f"{p}.mlp.experts.down_proj_bias"]),
        }
    return cfg, params
