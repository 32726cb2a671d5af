"""Param/data sharding rules -> NamedSharding over a Mesh.

Usage: ``params = shard_params(params, mesh, TRANSFORMER_RULES)`` then run the
ordinary jitted train step — GSPMD propagates the shardings and inserts the
ICI collectives (all-reduce for dp grads, all-gather/reduce-scatter around tp
matmuls). Optimizer state created from sharded params inherits their layout.
"""

from __future__ import annotations

import re
from typing import Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Rules: (path regex, PartitionSpec). First match wins; default = replicate.
# Paths are '/'-joined dict keys, e.g. 'layer_0/self_attention/wq'.
TRANSFORMER_RULES: Sequence[tuple[str, P]] = (
    # Attention projections [d_model, heads, head_dim]: shard heads on tp.
    (r".*/w[qkv]$", P(None, "tp", None)),
    (r".*/b[qkv]$", P("tp", None)),
    # Output projection [heads, head_dim, d_model]: heads on tp (contracting
    # dim sharded -> XLA emits a reduce-scatter/all-reduce).
    (r".*/wo$", P("tp", None, None)),
    # FFN: up-projection columns on tp, down-projection rows on tp.
    (r".*dense1/linear/w$", P(None, "tp")),
    (r".*dense1/linear/b$", P("tp",)),
    (r".*dense2/w$", P("tp", None)),
    # SwiGLU (LLaMA-style) FFN: gate/up columns on tp, down rows on tp.
    (r".*swiglu/w_(gate|up)$", P(None, "tp")),
    (r".*swiglu/w_down$", P("tp", None)),
    # Embedding/vocab-head: shard features.
    (r".*embedding/table$", P(None, "tp")),
    (r".*lm_head/w$", P(None, "tp")),
)

# Mamba (selective SSM) tensor parallelism: Megatron-shaped — in_proj
# column-parallel, out_proj row-parallel (contracting dim sharded -> one
# all-reduce per block), and EVERYTHING between is per-d_inner-channel
# (conv, dt/B/C, the selective scan itself), so the recurrence runs fully
# local on each shard. x_proj contracts the sharded d_inner to the small
# replicated (rank+2N) basis -> one more all-reduce.
MAMBA_RULES: Sequence[tuple[str, P]] = (
    (r".*mixer/A_log$", P("tp", None)),
    (r".*mixer/D$", P("tp")),
    (r".*mixer/conv_w$", P(None, "tp")),
    (r".*mixer/conv_b$", P("tp")),
    (r".*mixer/in_proj/w$", P(None, "tp")),
    (r".*mixer/x_proj/w$", P("tp", None)),
    (r".*mixer/dt_proj/w$", P(None, "tp")),
    (r".*mixer/dt_proj/b$", P("tp")),
    (r".*mixer/out_proj/w$", P("tp", None)),
    (r".*embedding/table$", P(None, "tp")),
    (r".*lm_head/w$", P(None, "tp")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path_s: str, leaf, rules, mesh_axes) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path_s):
            # Drop axes the mesh doesn't have / that don't divide the dim.
            fixed = []
            for dim, ax in zip(leaf.shape, tuple(spec) + (None,) * leaf.ndim):
                if ax is None or ax not in mesh_axes:
                    fixed.append(None)
                elif dim % mesh_axes[ax] != 0:
                    fixed.append(None)
                else:
                    fixed.append(ax)
            return P(*fixed)
    return P()


def partition_specs(params, rules=TRANSFORMER_RULES, mesh: Mesh | None = None):
    """Pytree of PartitionSpecs matching ``params``."""
    mesh_axes = dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh else {}

    def f(path, leaf):
        return _spec_for(_path_str(path), leaf, rules, mesh_axes)

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params, mesh: Mesh, rules=TRANSFORMER_RULES):
    """device_put params onto the mesh according to the rules."""
    specs = partition_specs(params, rules, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_batch(batch, mesh: Mesh, spec: P | None = None):
    """Shard inputs: batch axis on dp (and fsdp — under FSDP the batch is
    data-parallel over BOTH axes), sequence axis on sp (if present)."""
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    bax = tuple(a for a in ("dp", "fsdp") if a in axes)
    bax = bax if len(bax) > 1 else (bax + ("dp",))[0]

    def f(x):
        if spec is not None:
            s = spec
        elif x.ndim >= 2 and "sp" in mesh.axis_names:
            s = P(bax, "sp")
        else:
            s = P(bax)
        # Trim spec axes that don't divide (tuple entries shard one dim
        # over several mesh axes: every axis must exist, product divides).
        fixed = []
        for dim, ax in zip(x.shape, tuple(s) + (None,) * x.ndim):
            group = ax if isinstance(ax, tuple) else (ax,)
            ok = (ax is not None and all(a in axes for a in group)
                  and dim % int(np.prod([axes[a] for a in group])) == 0)
            fixed.append(ax if ok else None)
        return jax.device_put(x, NamedSharding(mesh, P(*fixed)))

    return jax.tree_util.tree_map(f, batch)


def constrain(x, mesh: Mesh, *spec_axes):
    """with_sharding_constraint shorthand for use inside jitted code."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec_axes)))
