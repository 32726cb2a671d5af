"""Numeric sanitizers (the TPU analogue of a race detector for math bugs —
SURVEY.md §5: the reference has no sanitizers at all)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_checks(enabled: bool = True) -> None:
    """Make any NaN-producing jitted computation raise (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", enabled)


def all_finite(tree) -> jax.Array:
    """Scalar bool: every leaf of the pytree is finite."""
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            ok = ok & jnp.all(jnp.isfinite(leaf))
    return ok


def tree_norm(tree) -> jax.Array:
    """Global L2 norm across all floating leaves (grad-norm logging)."""
    total = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(tree):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return jnp.sqrt(total)


def print_tree_stats(tree, prefix: str = "") -> None:
    """Host-side min/max/mean per leaf (debugging helper, not jittable)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        leaf = jax.device_get(leaf)
        print(f"{prefix}{name}: shape={leaf.shape} min={leaf.min():.4g} "
              f"max={leaf.max():.4g} mean={leaf.mean():.4g}")
