"""Context parallelism: attention over a sequence-sharded KV cache.

The reference has no distributed code at all (SURVEY.md §2.3); its test-only
blockwise online-softmax attention (attentions_test.py:158-265) is exactly
the math that generalizes across chips: here the "tiles" are other devices'
KV shards, rotated around the ICI ring with `jax.lax.ppermute` while each
chip merges per-block FLASH KERNEL outputs by their log-sum-exp.

Two implementations:
- ``ring``: N-1 point-to-point rotations, communication overlapped with
  compute by XLA; O(seq/N) bytes per step per chip. Each rotation step runs
  the Pallas flash kernel (ops/attention.py) on the local q shard vs the
  visiting KV block — no [s_local, s_local] fp32 score tensor is ever
  materialized on the kernel path — and partial outputs merge by LSE:
  ``o = o1*exp(lse1-lse) + o2*exp(lse2-lse)``. The backward is a manual
  second ring (jax.custom_vjp): with the FINAL lse saved, each visiting
  block's (dq+, dk, dv) comes from the FlashAttention-2 backward kernels
  directly; dk/dv accumulators travel around the ring with their blocks.
- ``gather``: all-gather KV then run the local flash kernel once; simpler,
  best when seq/N is small or ICI is fast relative to the attention compute.

Both support CAUSAL, sliding WINDOW, packed-sequence SEGMENT masking, and
GQA (q heads a multiple of kv heads), and both are numerically equal to
full attention — forward and grads (tests at s=32k on the CPU mesh).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from np_modeling_tpu.ops.attention import (DEFAULT_MASK_VALUE,
                                           _attn_bwd_jnp, _attn_fwd_impl,
                                           _flash_bwd_pallas,
                                           _use_flash_kernel,
                                           flash_attention)

_NEG = DEFAULT_MASK_VALUE


def _block_fwd(q, k_blk, v_blk, mask, scale, block_q, block_kv):
    """(o, lse) of the local q shard vs one KV block — Pallas kernel when
    the dispatch policy picks it, jnp otherwise (ops/attention.py seams)."""
    return _attn_fwd_impl(q, k_blk, v_blk, mask, None, None, None, False,
                          None, scale, block_q, block_kv, None)


def _block_bwd(q, k_blk, v_blk, o, lse, do, mask, scale, block_q, block_kv):
    """FA2 backward of one block given the GLOBAL lse: returns
    (dq_partial, dk_blk, dv_blk)."""
    if _use_flash_kernel(q, k_blk, mask, None):
        dq, dk, dv, _ = _flash_bwd_pallas(q, k_blk, v_blk, o, lse, do, mask,
                                          None, None, None, False, None,
                                          scale, block_q, block_kv)
    else:
        dq, dk, dv, _ = _attn_bwd_jnp(q, k_blk, v_blk, o, lse, do, mask,
                                      None, False, None, scale)
    return dq, dk, dv


def _ring_block_mask(step, axis_name, s_local, batch, causal, window,
                     q_seg, kv_seg_blk):
    """Boolean [b|1, 1, s_local, s_local] mask of local q rows vs the KV
    block visiting at ``step`` (None if nothing masks)."""
    if not causal and window is None and q_seg is None:
        return None
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    src = (my_idx - step) % n
    shape = (s_local, s_local)
    q_pos = my_idx * s_local + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    kv_pos = src * s_local + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    keep = jnp.ones(shape, bool)
    if causal:
        keep = keep & (kv_pos <= q_pos)
        if window is not None:
            keep = keep & (kv_pos > q_pos - window)
    keep = jnp.broadcast_to(keep[None, None], (1, 1, *shape))
    if q_seg is not None:
        seg_keep = (q_seg[:, None, :, None] == kv_seg_blk[:, None, None, :])
        keep = keep & seg_keep
    return keep


def ring_attention(q, k, v, axis_name: str, causal: bool = False,
                   scale=None, window=None, segment_ids=None,
                   block_q: int | None = None, block_kv: int | None = None):
    """Attention with seq-sharded q/k/v — call INSIDE shard_map.

    q: [b, hq, s_local, d]; k/v: [b, hkv, s_local, d] (GQA when hkv < hq);
    every chip sees every KV block after N-1 rotations; causal / sliding
    ``window`` / packed-sequence ``segment_ids`` masking accounts for which
    source chip each block came from. ``segment_ids``: (q_seg [b, s_local],
    kv_seg [b, s_local]) or a single [b, s_local] for self-attention.
    Differentiable: hand-written two-ring VJP (see module docstring).
    """
    d = q.shape[-1]
    scale = float(scale if scale is not None else 1.0 / math.sqrt(d))
    assert window is None or causal, "window requires causal=True"
    if segment_ids is not None and not isinstance(segment_ids, (tuple, list)):
        segment_ids = (segment_ids, segment_ids)
    q_seg, kv_seg = segment_ids if segment_ids is not None else (None, None)
    return _ring(q, k, v, q_seg, kv_seg, axis_name, causal, window, scale,
                 block_q, block_kv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _ring(q, k, v, q_seg, kv_seg, axis_name, causal, window, scale,
          block_q, block_kv):
    o, _ = _ring_fwd_impl(q, k, v, q_seg, kv_seg, axis_name, causal, window,
                          scale, block_q, block_kv)
    return o


def _ring_fwd_impl(q, k, v, q_seg, kv_seg, axis_name, causal, window, scale,
                   block_q, block_kv):
    n = jax.lax.psum(1, axis_name)
    b, hq, s_local, d = q.shape
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]

    def rotate(t):
        return jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis_name, perm_fwd), t)

    has_seg = kv_seg is not None    # no seg: don't ring a dummy tensor

    def step_fn(carry, step):
        if has_seg:
            o_run, lse_run, k_blk, v_blk, seg_blk = carry
        else:
            (o_run, lse_run, k_blk, v_blk), seg_blk = carry, None
        mask = _ring_block_mask(step, axis_name, s_local, b, causal, window,
                                q_seg, seg_blk)
        o_blk, lse_blk = _block_fwd(q, k_blk, v_blk, mask, scale,
                                    block_q, block_kv)
        # LSE merge of normalized partial outputs.
        m_new = jnp.maximum(lse_run, lse_blk)
        lse_new = m_new + jnp.log(jnp.exp(lse_run - m_new)
                                  + jnp.exp(lse_blk - m_new))
        w_old = jnp.exp(lse_run - lse_new)[..., None]
        w_blk = jnp.exp(lse_blk - lse_new)[..., None]
        o_run = o_run * w_old + o_blk.astype(jnp.float32) * w_blk
        if has_seg:
            k_blk, v_blk, seg_blk = rotate((k_blk, v_blk, seg_blk))
            return (o_run, lse_new, k_blk, v_blk, seg_blk), None
        k_blk, v_blk = rotate((k_blk, v_blk))
        return (o_run, lse_new, k_blk, v_blk), None

    o0 = jnp.zeros((b, hq, s_local, d), jnp.float32)
    lse0 = jnp.full((b, hq, s_local), _NEG, jnp.float32)
    carry0 = ((o0, lse0, k, v, kv_seg) if has_seg else (o0, lse0, k, v))
    out_carry, _ = jax.lax.scan(step_fn, carry0, jnp.arange(n))
    o, lse = out_carry[0], out_carry[1]
    return o.astype(q.dtype), lse


def _ring_fwd(q, k, v, q_seg, kv_seg, axis_name, causal, window, scale,
              block_q, block_kv):
    o, lse = _ring_fwd_impl(q, k, v, q_seg, kv_seg, axis_name, causal,
                            window, scale, block_q, block_kv)
    return o, (q, k, v, q_seg, kv_seg, o, lse)


def _ring_bwd(axis_name, causal, window, scale, block_q, block_kv, res, do):
    q, k, v, q_seg, kv_seg, o, lse = res
    n = jax.lax.psum(1, axis_name)
    b, hq, s_local, d = q.shape
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]

    def rotate(t):
        return jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis_name, perm_fwd), t)

    has_seg = kv_seg is not None    # no seg: don't ring a dummy tensor

    def step_fn(carry, step):
        if has_seg:
            dq_acc, k_blk, v_blk, seg_blk, dk_blk, dv_blk = carry
        else:
            (dq_acc, k_blk, v_blk, dk_blk, dv_blk), seg_blk = carry, None
        mask = _ring_block_mask(step, axis_name, s_local, b, causal, window,
                                q_seg, seg_blk)
        dq_b, dk_b, dv_b = _block_bwd(q, k_blk, v_blk, o, lse, do, mask,
                                      scale, block_q, block_kv)
        dq_acc = dq_acc + dq_b.astype(jnp.float32)
        dk_blk = dk_blk + dk_b.astype(jnp.float32)
        dv_blk = dv_blk + dv_b.astype(jnp.float32)
        # dk/dv accumulators TRAVEL with their blocks: after n rotations
        # both are back home carrying every device's contribution.
        if has_seg:
            k_blk, v_blk, seg_blk, dk_blk, dv_blk = rotate(
                (k_blk, v_blk, seg_blk, dk_blk, dv_blk))
            return (dq_acc, k_blk, v_blk, seg_blk, dk_blk, dv_blk), None
        k_blk, v_blk, dk_blk, dv_blk = rotate(
            (k_blk, v_blk, dk_blk, dv_blk))
        return (dq_acc, k_blk, v_blk, dk_blk, dv_blk), None

    dq0 = jnp.zeros((b, hq, s_local, d), jnp.float32)
    dkv0 = jnp.zeros_like(k, jnp.float32), jnp.zeros_like(v, jnp.float32)
    carry0 = ((dq0, k, v, kv_seg, *dkv0) if has_seg
              else (dq0, k, v, *dkv0))
    out_carry, _ = jax.lax.scan(step_fn, carry0, jnp.arange(n))
    dq, dk, dv = out_carry[0], out_carry[-2], out_carry[-1]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


_ring.defvjp(_ring_fwd, _ring_bwd)


def gather_attention(q, k, v, axis_name: str, causal: bool = False,
                     scale=None, window=None, segment_ids=None):
    """All-gather the KV shards, run local flash attention on the q shard —
    call INSIDE shard_map. Causal/window masking uses the q shard's global
    offset (streamed into the kernel as an int8 tile mask, not a
    materialized fp32 score tensor); packed-sequence ``segment_ids`` ride
    the kernel's native in-kernel segment masking. GQA supported."""
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    s_local = q.shape[2]
    if segment_ids is not None and not isinstance(segment_ids, (tuple, list)):
        segment_ids = (segment_ids, segment_ids)
    q_seg, kv_seg = segment_ids if segment_ids is not None else (None, None)
    k_full = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
    segs = None
    if q_seg is not None:
        segs = (q_seg, jax.lax.all_gather(kv_seg, axis_name, axis=1,
                                          tiled=True))
    mask = None
    if causal:
        # Local q rows live at global positions my_idx*s_local + i.
        s_total = s_local * n
        q_pos = my_idx * s_local + jax.lax.broadcasted_iota(
            jnp.int32, (s_local, s_total), 0)
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (s_local, s_total), 1)
        keep = kv_pos <= q_pos
        if window is not None:
            keep = keep & (kv_pos > q_pos - window)
        mask = keep[None, None]
    return flash_attention(q, k_full, v_full, mask=mask, segment_ids=segs,
                           scale=scale)


def make_context_parallel_attention(mesh: Mesh, axis: str = "sp",
                                    impl: str = "ring", causal: bool = False,
                                    window=None):
    """Build attention over globally seq-sharded [b, h, S, d] arrays.

    Returns fn(q, k, v, segment_ids=None) usable under jit; internally a
    shard_map over ``axis`` with q/k/v sequence-sharded and batch/head
    replicated on it. ``segment_ids``: optional [b, S] (self-attention) for
    packed-sequence masking.

    Sequence lengths that don't divide the mesh axis are padded at the END
    with segment-id -1 keys/queries: the in-kernel segment mask removes pad
    keys for every real query (exact for causal and bidirectional alike)
    and the pad query rows are sliced off the output.
    """
    assert impl in ("ring", "gather"), impl
    spec = P(None, None, axis, None)
    seg_spec = P(None, axis)

    def fn(q, k, v, segment_ids=None):
        n_shards = mesh.shape[axis]
        s = q.shape[2]
        pad = (-s) % n_shards
        if pad:
            widths = ((0, 0), (0, 0), (0, pad), (0, 0))
            q, k, v = (jnp.pad(t, widths) for t in (q, k, v))
            if segment_ids is None:
                segment_ids = jnp.zeros((q.shape[0], s), jnp.int32)
            segment_ids = jnp.pad(segment_ids, ((0, 0), (0, pad)),
                                  constant_values=-1)
            return fn(q, k, v, segment_ids)[:, :, :s]
        if segment_ids is None:
            @functools.partial(jax.shard_map, mesh=mesh,
                               in_specs=(spec, spec, spec), out_specs=spec,
                               check_vma=False)
            def run(q, k, v):
                inner = ring_attention if impl == "ring" else gather_attention
                return inner(q, k, v, axis_name=axis, causal=causal,
                             window=window)
            return run(q, k, v)

        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(spec, spec, spec, seg_spec),
                           out_specs=spec, check_vma=False)
        def run_seg(q, k, v, seg):
            inner = ring_attention if impl == "ring" else gather_attention
            return inner(q, k, v, axis_name=axis, causal=causal,
                         window=window, segment_ids=seg)
        return run_seg(q, k, v, segment_ids)

    return fn
