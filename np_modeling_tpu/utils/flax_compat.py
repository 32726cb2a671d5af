"""Flax weight-conversion helpers (library surface).

Reference parity: /root/reference/layers/utils.py:27-101 ships reusable
converters (``read_attention_variables_from_flax``, ``bind_encoder``,
``bind_decoder``) that move Flax weights into its layers for oracle tests.
These are the equivalents for this framework's param pytrees.

Unlike the reference — whose attention layout needs [1,2,0]/[2,0,1] kernel
transposes (utils.py:27-38) — our MultiHeadAttention deliberately uses the
Flax ``MultiHeadDotProductAttention`` layout (wq/wk/wv: [d, heads, head_dim];
wo: [heads, head_dim, d_out]), so the attention conversion is a pure
re-keying with no transposes. All converters return NEW pytrees referencing
the same arrays (no copies).
"""

from __future__ import annotations


def mha_params_from_flax(fparams: dict) -> dict:
    """Flax ``MultiHeadDotProductAttention`` params -> nn.MultiHeadAttention.

    ``fparams``: the attention module's subtree, i.e.
    ``flax_variables['params']`` of the bare module (keys query/key/value/out).
    Reference equivalent: utils.py:27-59.
    """
    return {
        "wq": fparams["query"]["kernel"], "bq": fparams["query"]["bias"],
        "wk": fparams["key"]["kernel"], "bk": fparams["key"]["bias"],
        "wv": fparams["value"]["kernel"], "bv": fparams["value"]["bias"],
        "wo": fparams["out"]["kernel"], "bo": fparams["out"]["bias"],
    }


def layernorm_params_from_flax(fparams: dict) -> dict:
    """Flax ``LayerNorm`` {scale, bias} -> nn.LayerNorm {gamma, beta}.
    Reference equivalent: utils.py:62-68. NOTE: match epsilons yourself —
    our default is the reference's 1e-3; Flax's is 1e-6 — and use
    ``use_fast_variance=False`` on the Flax side for 1e-5-level parity."""
    return {"gamma": fparams["scale"], "beta": fparams["bias"]}


def dense_params_from_flax(fparams: dict) -> dict:
    """Flax ``Dense`` {kernel, bias} -> nn.Linear {w, b} (same layout)."""
    out = {"w": fparams["kernel"]}
    if "bias" in fparams:
        out["b"] = fparams["bias"]
    return out


def encoder_block_params_from_flax(fparams: dict, *,
                                   attention="MultiHeadDotProductAttention_0",
                                   norm1="LayerNorm_0", norm2="LayerNorm_1",
                                   dense1="Dense_0", dense2="Dense_1") -> dict:
    """Flax encoder-block params -> nn.TransformerEncoderBlock params.

    Expects the standard auto-generated Flax submodule names of a block
    defined as attention + 2 LayerNorms + 2 Denses (override the kwargs for
    custom names). Reference equivalent: ``bind_encoder``, utils.py:71-84.
    """
    return {
        "self_attention": mha_params_from_flax(fparams[attention]),
        "norm1": layernorm_params_from_flax(fparams[norm1]),
        "norm2": layernorm_params_from_flax(fparams[norm2]),
        "dense1": {"linear": dense_params_from_flax(fparams[dense1])},
        "dense2": dense_params_from_flax(fparams[dense2]),
    }


def decoder_block_params_from_flax(
        fparams: dict, *,
        self_attention="MultiHeadDotProductAttention_0",
        cross_attention="MultiHeadDotProductAttention_1",
        norm1="LayerNorm_0", norm2="LayerNorm_1", norm3="LayerNorm_2",
        dense1="Dense_0", dense2="Dense_1") -> dict:
    """Flax decoder-block params -> nn.TransformerDecoderBlock params.
    Reference equivalent: ``bind_decoder``, utils.py:87-101."""
    return {
        "self_attention": mha_params_from_flax(fparams[self_attention]),
        "cross_attention": mha_params_from_flax(fparams[cross_attention]),
        "norm1": layernorm_params_from_flax(fparams[norm1]),
        "norm2": layernorm_params_from_flax(fparams[norm2]),
        "norm3": layernorm_params_from_flax(fparams[norm3]),
        "dense1": {"linear": dense_params_from_flax(fparams[dense1])},
        "dense2": dense_params_from_flax(fparams[dense2]),
    }
