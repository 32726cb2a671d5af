"""LoRA: low-rank adapter fine-tuning (Hu et al. 2021).

Fine-tuning-side extension (the reference trains from scratch only). Each
matched weight ``W [in, ...out]`` gets a pair ``A [in, r]``, ``B [r, ...out]``
with ``B = 0`` at init, and the effective weight is
``W + (alpha / r) * A @ B``. Training differentiates ONLY the adapters: the
train step computes ``loss(merge(frozen_base, lora))`` and takes
``jax.grad`` w.r.t. the lora tree — the base stays frozen by construction
(it is a closed-over constant, not a grad argument). Adapter states are
tiny pytrees: checkpoint/optimizer machinery works on them unchanged.

Functional-JAX shape: merging materializes effective weights inside the
jitted step (XLA fuses the rank-r update into the parameter load; no
layer-code changes needed, every model in the zoo is LoRA-able).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

from np_modeling_tpu.parallel.sharding import _path_str

# Attention projections — the standard LoRA target set for transformers.
ATTENTION_TARGETS = r".*/w[qkvo]$"
# Attention + all FFN matmuls (mlp dense1/dense2 and swiglu/geglu
# w_gate/w_up/w_down — LLaMA-family imports get full-coverage adapters).
ALL_LINEAR_TARGETS = (
    r".*(/w[qkvo]|dense1/linear/w|dense2/w|swiglu/w_(gate|up|down))$")


def lora_init(key, params, rank: int, match: str = ATTENTION_TARGETS):
    """Build the adapter pytree for every param path matching ``match``.

    Matched leaves must be >=2-D; ``A`` is Gaussian ``(0, 1/rank)``,
    ``B`` zeros (so the merged model initially EQUALS the base model).
    Returns ``{path: {"a": ..., "b": ...}}`` keyed by '/'-joined path.
    """
    pat = re.compile(match)
    leaves = [(p, l) for p, l in
              jax.tree_util.tree_flatten_with_path(params)[0]
              if pat.match(_path_str(p)) and l.ndim >= 2]
    if not leaves:
        raise ValueError(f"no params match {match!r}")
    adapters = {}
    for i, (path, leaf) in enumerate(leaves):
        k = jax.random.fold_in(key, i)
        fan_in = leaf.shape[0]
        adapters[_path_str(path)] = {
            "a": (jax.random.normal(k, (fan_in, rank), jnp.float32)
                  / jnp.sqrt(rank)),
            "b": jnp.zeros((rank, *leaf.shape[1:]), jnp.float32),
        }
    return adapters


def lora_merge(params, adapters, alpha: float | None = None):
    """Effective params: ``W + (alpha / r) * A @ B`` for adapted leaves.

    Differentiable in ``adapters`` (the fine-tune path) and in ``params``
    (if you want joint training). ``alpha`` defaults to ``rank`` (scale 1).
    """

    def f(path, leaf):
        ad = adapters.get(_path_str(path))
        if ad is None:
            return leaf
        r = ad["a"].shape[1]
        scale = (alpha if alpha is not None else r) / r
        delta = jnp.tensordot(ad["a"], ad["b"], axes=1)  # [in, ...out]
        return leaf + scale * delta.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(f, params)


def lora_finalize(params, adapters, alpha: float | None = None):
    """Bake adapters into a plain param pytree (deploy without LoRA code)."""
    return lora_merge(params, adapters, alpha)
