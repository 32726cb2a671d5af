"""Embedding lookup with a hand-written VJP (scatter-add gradient)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table: [vocab, d]; ids: int array; returns ids.shape + (d,)."""
    return jnp.take(table, ids, axis=0)


def _emb_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (table, ids)


def _emb_bwd(res, dy):
    table, ids = res
    flat_ids = ids.reshape(-1)
    flat_dy = dy.reshape(-1, table.shape[-1])
    dtable = jnp.zeros_like(table).at[flat_ids].add(
        flat_dy.astype(table.dtype))
    return dtable, None


embedding_lookup.defvjp(_emb_fwd, _emb_bwd)
