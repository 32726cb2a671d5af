"""Context parallelism: attention over a sequence-sharded KV cache.

The reference has no distributed code at all (SURVEY.md §2.3); its test-only
blockwise online-softmax attention (attentions_test.py:158-265) is exactly
the math that generalizes across chips: here the "tiles" are other devices'
KV shards, rotated around the ICI ring with `jax.lax.ppermute` while each
chip computes partial attention with running (m, l, acc) statistics.

Two implementations:
- ``ring``: N-1 point-to-point rotations, communication overlapped with
  compute by XLA; O(seq/N) bytes per step per chip.
- ``gather``: all-gather KV then run the local flash kernel; simpler, best
  when seq/N is small or ICI is fast relative to the attention compute.

Both are differentiable (the VJP of ppermute is the reverse permute; the
VJP of all_gather is reduce-scatter) and numerically equal to full attention.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from np_modeling_tpu.ops.attention import DEFAULT_MASK_VALUE, flash_attention


def _local_scores(q, k, scale):
    return jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale


def ring_attention(q, k, v, axis_name: str, causal: bool = False,
                   scale=None):
    """Attention with seq-sharded q/k/v — call INSIDE shard_map.

    q, k, v: [b, h, s_local, d] (this chip's sequence shard). Every chip sees
    every KV block after N-1 rotations; causal masking accounts for which
    source chip each block came from.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    s_local = q.shape[2]

    def block_mask(step):
        """[s_local, s_local] mask of local q vs the step's kv block."""
        src = (my_idx - step) % n
        q_pos = my_idx * s_local + jax.lax.broadcasted_iota(
            jnp.int32, (s_local, s_local), 0)
        kv_pos = src * s_local + jax.lax.broadcasted_iota(
            jnp.int32, (s_local, s_local), 1)
        return kv_pos <= q_pos

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step_fn(carry, step):
        m, l, acc, k_blk, v_blk = carry
        s = _local_scores(q, k_blk, scale)
        if causal:
            s = jnp.where(block_mask(step)[None, None], s, DEFAULT_MASK_VALUE)
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_next, l, acc, k_blk, v_blk), None

    b, h = q.shape[:2]
    m0 = jnp.full((b, h, s_local, 1), DEFAULT_MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((b, h, s_local, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, s_local, d), jnp.float32)
    (m, l, acc, _, _), _ = jax.lax.scan(
        step_fn, (m0, l0, acc0, k, v), jnp.arange(n))
    l = jnp.where(l == 0.0, 1.0, l)
    return (acc / l).astype(q.dtype)


def gather_attention(q, k, v, axis_name: str, causal: bool = False,
                     scale=None):
    """All-gather the KV shards, run local flash attention on the q shard —
    call INSIDE shard_map. Causal masking uses the q shard's global offset."""
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    s_local = q.shape[2]
    k_full = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
    if not causal:
        return flash_attention(q, k_full, v_full, scale=scale)
    # Local q rows live at global positions my_idx*s_local + i.
    s_total = s_local * n
    q_pos = my_idx * s_local + jax.lax.broadcasted_iota(
        jnp.int32, (s_local, s_total), 0)
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (s_local, s_total), 1)
    mask = (kv_pos <= q_pos)[None, None]
    return flash_attention(q, k_full, v_full, mask=mask, scale=scale)


def make_context_parallel_attention(mesh: Mesh, axis: str = "sp",
                                    impl: str = "ring", causal: bool = False):
    """Build attention over globally seq-sharded [b, h, S, d] arrays.

    Returns fn(q, k, v) usable under jit; internally a shard_map over
    ``axis`` with q/k/v sequence-sharded and batch/head replicated on it.
    """
    inner = ring_attention if impl == "ring" else gather_attention
    spec = P(None, None, axis, None)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec,
                       check_vma=False)
    def fn(q, k, v):
        return inner(q, k, v, axis_name=axis, causal=causal)

    return fn
