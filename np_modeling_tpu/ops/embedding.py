"""Embedding lookup with a hand-written VJP (scatter-add gradient).

The gradient of a gather is a scatter-add. The classic TPU alternative
(t5x/flaxformer style) computes the same dtable as a ONE-HOT MATMUL —
onehot(ids)^T @ dy on the MXU with fp32 accumulation — and is kept here as
a tested option, but it LOST the r5 A/B (exp_embed_fix.py, slope-timed
same-process, v5e, b4 s4096 d1024 v8192): isolated fwd+bwd 885us (scatter)
vs 1629us (one-hot matmul), and in the full train step 61.87ms vs 62.12ms
— XLA's TPU scatter lowering handles duplicate indices fine at this shape,
while the matmul pays 2*N*V*d FLOPs. (An earlier 5.5ms "embedding bucket"
in the r5 step breakdown was an ablation confound, not real scatter cost.)

EMB_GRAD_MATMUL: None = measured auto policy (scatter), True/False = force.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Measured r5 (see module docstring): scatter wins at the headline shape;
# the matmul path stays available for shapes/toolchains where scatter
# regresses (force with EMB_GRAD_MATMUL=True).
EMB_GRAD_MATMUL = None


def _use_matmul_grad(vocab: int, d: int) -> bool:
    if EMB_GRAD_MATMUL is not None:
        return EMB_GRAD_MATMUL
    return False


@jax.custom_vjp
def embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table: [vocab, d]; ids: int array; returns ids.shape + (d,)."""
    return jnp.take(table, ids, axis=0)


def _emb_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (table, ids)


def _emb_bwd(res, dy):
    table, ids = res
    vocab, d = table.shape
    flat_ids = ids.reshape(-1)
    flat_dy = dy.reshape(-1, d)
    if _use_matmul_grad(vocab, d):
        oh = jax.nn.one_hot(flat_ids, vocab, dtype=jnp.bfloat16)
        dtable = jax.lax.dot_general(
            oh, flat_dy.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dtable.astype(table.dtype), None
    dtable = jnp.zeros_like(table).at[flat_ids].add(
        flat_dy.astype(table.dtype))
    return dtable, None


embedding_lookup.defvjp(_emb_fwd, _emb_bwd)
