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
