"""Paged attention for autoregressive decode (serving path).

During decoding the KV cache lives in non-contiguous fixed-size pages in HBM;
each sequence owns a list of page indices. The kernel walks a sequence's
pages with the page table scalar-prefetched (pltpu.PrefetchScalarGridSpec),
so the BlockSpec index_maps themselves chase ``page_indices`` and Pallas's
pipeline streams exactly the right pages HBM->VMEM.

Each grid step processes ``pages_per_block`` pages at once: the same page
array is passed N times with per-page index maps (one pipelined DMA per
page — the BlockSpec-native form of the multi-page async-copy pattern),
concatenated in VMEM into one [N*page_size, d] block for the MXU. This
matters because one-page steps are grid-overhead bound (measured 2.2ms for
b8/ctx8k/64-token pages; multi-page blocks amortize the per-step cost).

Online softmax accumulates across blocks; GQA folds the q-head group for a
kv head into the tile's sublanes (one MXU matmul per block for the whole
group). Int8 caches pass per-token scales, dequantized after the VMEM load
(halves page-load HBM bandwidth).

Shapes:
  q            [batch, num_q_heads, head_dim]        (one decode token)
               or [batch, sq, num_q_heads, head_dim] (multi-token queries:
               speculative verification / chunked append; sq small, the
               sq*group rows fold into the score tile's sublanes)
  k_pages      [num_kv_heads, total_pages, page_size, head_dim]
  v_pages      [num_kv_heads, total_pages, page_size, head_dim]
  lengths      [batch] int32   (tokens in cache INCLUDING the sq query
               tokens — query token i sits at position lengths - sq + i
               and attends causally to positions <= its own)
  page_indices [batch, pages_per_seq] int32
  k/v_scales   [num_kv_heads, total_pages, page_size, 1] fp32 (int8 mode)
Returns: [batch, num_q_heads, head_dim] (3-D q) or
         [batch, sq, num_q_heads, head_dim] (4-D q).

No backward: decode is inference-only (training uses ops.flash_attention).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from np_modeling_tpu.ops import dispatch
from np_modeling_tpu.ops.attention import DEFAULT_MASK_VALUE
from np_modeling_tpu.ops.matmul import round_up


def _normalize_bias(bias, b, hq, sq):
    """Broadcast a [b, hq, kv_len] bias over the query axis -> 4-D
    [b, hq, sq, kv_len] (the decode-step case: one bias row per head)."""
    if bias is None:
        return None
    if bias.ndim == 3:
        bias = bias[:, :, None]
    assert bias.shape[:3] == (b, hq, sq) or bias.shape[2] == 1, bias.shape
    return jnp.broadcast_to(
        bias.astype(jnp.float32),
        (b, hq, sq, bias.shape[-1]))


def paged_attention_reference(q, k_pages, v_pages, lengths, page_indices,
                              scale=None, window=None, bias=None,
                              softcap=None, sinks=None):
    """Pure-jnp oracle: gather each sequence's pages, masked attention.

    ``window``: sliding-window width W — query token at position p attends
    to cache positions [p-W+1, p], matching training-time
    ops.flash_attention(causal=True, window=W). ``bias``: additive score
    bias [b, hq, kv_len] (or [b, hq, sq, kv_len]) over ABSOLUTE cache
    positions 0..kv_len-1 — the serving form of T5-style relative-position
    bias (kv_len >= the covered positions; extra columns are masked).
    Accepts 3-D (single-token) or 4-D (multi-token) q; see module
    docstring for length semantics."""
    squeeze = q.ndim == 3
    if squeeze:
        q = q[:, None]
    b, sq, hq, d = q.shape
    hkv, _, psize, _ = k_pages.shape
    g = hq // hkv
    pages_per_seq = page_indices.shape[1]
    max_len = pages_per_seq * psize

    k_seq = k_pages[:, page_indices]          # [hkv, b, pages, psize, d]
    v_seq = v_pages[:, page_indices]
    k_seq = jnp.moveaxis(k_seq, 1, 0).reshape(b, hkv, max_len, d)
    v_seq = jnp.moveaxis(v_seq, 1, 0).reshape(b, hkv, max_len, d)

    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    qg = jnp.moveaxis(q.reshape(b, sq, hkv, g, d), 1, 2)  # [b,hkv,sq,g,d]
    s = jnp.einsum("bhtgd,bhkd->bhtgk", qg, k_seq,
                   preferred_element_type=jnp.float32) * scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    bias = _normalize_bias(bias, b, hq, sq)
    if bias is not None:
        kv = min(max_len, bias.shape[-1])
        bg = jnp.moveaxis(bias.reshape(b, hkv, g, sq, -1), 2, 3)
        s = s.at[..., :kv].add(bg[..., :kv])  # [b, hkv, sq, g, kv]
    pos = jnp.arange(max_len)[None, None, None, None, :]
    # Query token t's own absolute position: lengths - sq + t.
    own = (lengths[:, None, None, None, None] - sq
           + jnp.arange(sq)[None, None, :, None, None])
    keep = pos <= own
    if window is not None:
        keep = keep & (pos > own - window)
    s = jnp.where(keep, s, DEFAULT_MASK_VALUE)
    if sinks is not None:
        # gpt-oss attention sinks: a per-q-head no-value logit joins the
        # softmax. s is [b, hkv, sq, g, kv]; head = hkv_idx * g + g_idx.
        sk = sinks.reshape(hkv, g)[None, :, None, :, None]
        comb = jnp.concatenate(
            [s, jnp.broadcast_to(sk, (*s.shape[:-1], 1))], axis=-1)
        p = jax.nn.softmax(comb, axis=-1)[..., :-1]
    else:
        p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhtgk,bhkd->bhtgd", p, v_seq,
                   preferred_element_type=jnp.float32)
    o = jnp.moveaxis(o, 2, 1).reshape(b, sq, hq, d).astype(q.dtype)
    return o[:, 0] if squeeze else o


def _paged_kernel(lengths_ref, page_idx_ref, q_ref, *rest, scale, page_size,
                  n_blocks, npb, quantized, window, sq, g, has_bias=False,
                  softcap=None, has_sinks=False):
    """rest = k_0..k_{npb-1}, [ks_0..], v_0.., [vs_0..], [bias], [sinks],
    o_ref, m, l, acc."""
    del page_idx_ref
    if quantized:
        k_refs, rest = rest[:npb], rest[npb:]
        ks_refs, rest = rest[:npb], rest[npb:]
        v_refs, rest = rest[:npb], rest[npb:]
        vs_refs, rest = rest[:npb], rest[npb:]
        k = jnp.concatenate(
            [r[0, 0].astype(jnp.float32) * s[0, 0]
             for r, s in zip(k_refs, ks_refs)], axis=0)
        v = jnp.concatenate(
            [r[0, 0].astype(jnp.float32) * s[0, 0]
             for r, s in zip(v_refs, vs_refs)], axis=0)
    else:
        k_refs, rest = rest[:npb], rest[npb:]
        v_refs, rest = rest[:npb], rest[npb:]
        k = jnp.concatenate([r[0, 0] for r in k_refs], axis=0)
        v = jnp.concatenate([r[0, 0] for r in v_refs], axis=0)
    bias_ref = None
    if has_bias:
        bias_ref, rest = rest[0], rest[1:]
    sinks_ref = None
    if has_sinks:
        sinks_ref, rest = rest[0], rest[1:]
    o_ref, m_scr, l_scr, acc_scr = rest

    b_idx, blk = pl.program_id(0), pl.program_id(2)
    block_tokens = npb * page_size

    @pl.when(blk == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lengths_ref[b_idx]

    should_run = blk * block_tokens < length
    if window is not None:
        # Whole blocks below the FIRST query row's sliding-window band are
        # skipped (later rows allow strictly more).
        should_run = jnp.logical_and(
            should_run,
            (blk + 1) * block_tokens > length - sq + 1 - window)

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]                        # [sq*g (padded), d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if softcap is not None:    # Gemma-2 logit soft-capping, in-kernel
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        if bias_ref is not None:
            s = s + bias_ref[0, 0]             # [rows (padded), block]
        pos = blk * block_tokens + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        # Row r is query token r // g at absolute position length - sq + t;
        # it attends causally to pos <= its own position.
        own = (length - sq
               + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // g)
        keep = pos <= own
        if window is not None:
            keep = jnp.logical_and(keep, pos > own - window)
        s = jnp.where(keep, s, DEFAULT_MASK_VALUE)

        m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, 0:1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + pv

    @pl.when(blk == n_blocks - 1)
    def _store():
        l = l_scr[...]
        if sinks_ref is not None:
            # Sink joins the denominator: l_tot = l + exp(sink - m). Rows
            # are token-major (row t*g + j -> q head h_i*g + j); the input
            # tile is pre-broadcast to [rows, lanes].
            l = l + jnp.exp(sinks_ref[0] - m_scr[...])
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv[:, 0:1]).astype(o_ref.dtype)


def _paged_kernel_folded(lengths_ref, page_idx_ref, q_ref, *rest, scale,
                         page_size, n_blocks, npb, quantized, window, sq, g,
                         hkv, has_bias=False, softcap=None, has_sinks=False):
    """Head-FOLDED variant: grid is (batch, page_block) — every kv head of
    a page block rides ONE grid step (the page index is head-invariant, so
    the hkv per-head DMAs batch into one pipelined transfer and the 8-odd
    tiny per-head matmuls run back-to-back without paying a grid-step
    boundary each). At decode shapes the unfolded kernel is GRID-OVERHEAD
    bound — b*hkv*n_blocks steps of ~2us around ~1us of work; folding
    divides the step count by hkv. rest = k_0..k_{npb-1}, [ks_0..],
    v_0.., [vs_0..], [bias], [sinks], o_ref, m, l, acc (scratch carries a
    leading hkv axis)."""
    del page_idx_ref
    if quantized:
        k_refs, rest = rest[:npb], rest[npb:]
        ks_refs, rest = rest[:npb], rest[npb:]
        v_refs, rest = rest[:npb], rest[npb:]
        vs_refs, rest = rest[:npb], rest[npb:]
    else:
        k_refs, rest = rest[:npb], rest[npb:]
        v_refs, rest = rest[:npb], rest[npb:]
        ks_refs = vs_refs = None
    bias_ref = None
    if has_bias:
        bias_ref, rest = rest[0], rest[1:]
    sinks_ref = None
    if has_sinks:
        sinks_ref, rest = rest[0], rest[1:]
    o_ref, m_scr, l_scr, acc_scr = rest

    b_idx, blk = pl.program_id(0), pl.program_id(1)
    block_tokens = npb * page_size

    @pl.when(blk == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lengths_ref[b_idx]

    should_run = blk * block_tokens < length
    if window is not None:
        should_run = jnp.logical_and(
            should_run,
            (blk + 1) * block_tokens > length - sq + 1 - window)

    @pl.when(should_run)
    def _run():
        pos = None
        for h in range(hkv):
            if quantized:
                k = jnp.concatenate(
                    [r[h, 0].astype(jnp.float32) * s[h, 0]
                     for r, s in zip(k_refs, ks_refs)], axis=0)
                v = jnp.concatenate(
                    [r[h, 0].astype(jnp.float32) * s[h, 0]
                     for r, s in zip(v_refs, vs_refs)], axis=0)
            else:
                k = jnp.concatenate([r[h, 0] for r in k_refs], axis=0)
                v = jnp.concatenate([r[h, 0] for r in v_refs], axis=0)
            qh = q_ref[0, h]                   # [sq*g (padded), d]
            s = jax.lax.dot_general(qh, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ) * scale
            if softcap is not None:
                s = softcap * jnp.tanh(s * (1.0 / softcap))
            if bias_ref is not None:
                s = s + bias_ref[0, h]
            if pos is None:
                pos = blk * block_tokens + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1)
                own = (length - sq
                       + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                       // g)
                keep = pos <= own
                if window is not None:
                    keep = jnp.logical_and(keep, pos > own - window)
            s = jnp.where(keep, s, DEFAULT_MASK_VALUE)

            m_prev, l_prev = m_scr[h], l_scr[h]
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, 0:1])
            l_scr[h] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
            m_scr[h] = m_next
            pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_scr[h] = acc_scr[h] * alpha[:, 0:1] + pv

    @pl.when(blk == n_blocks - 1)
    def _store():
        for h in range(hkv):
            l = l_scr[h]
            if sinks_ref is not None:
                l = l + jnp.exp(sinks_ref[h] - m_scr[h])
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, h] = (acc_scr[h] * l_inv[:, 0:1]).astype(o_ref.dtype)


def paged_attention(q, k_pages, v_pages, lengths, page_indices, scale=None,
                    k_scales=None, v_scales=None, pages_per_block=16,
                    window=None, bias=None, softcap=None, sinks=None,
                    fold_heads=None):
    """Paged-KV decode attention (Pallas on TPU, jnp oracle elsewhere).

    ``bias``: optional additive score bias over absolute cache positions —
    [b, hq, kv_len] (broadcast over query tokens) or [b, hq, sq, kv_len].
    Streams through the kernel as a position-blocked input riding the same
    grid as the page walk (page block i covers positions [i*block,
    (i+1)*block), so the bias tile is a PLAIN blocked load — no
    scalar-prefetch indirection needed). This is how T5-style relative-
    position bias reaches the serving decode path
    (serving.seq2seq_engine)."""
    quantized = k_scales is not None
    if dispatch.forced() is False or not (dispatch.forced() or
                                          dispatch.on_tpu()):
        if quantized:
            k_pages = k_pages.astype(jnp.float32) * k_scales
            v_pages = v_pages.astype(jnp.float32) * v_scales
        return paged_attention_reference(q, k_pages, v_pages, lengths,
                                         page_indices, scale, window, bias,
                                         softcap, sinks)

    squeeze = q.ndim == 3
    if squeeze:
        q = q[:, None]
    b, sq, hq, d = q.shape
    hkv, n_pages, psize, _ = k_pages.shape
    g = hq // hkv
    pages_per_seq = page_indices.shape[1]
    scale = float(scale if scale is not None else 1.0 / math.sqrt(d))

    # ---- head-folding policy + VMEM plan ---------------------------------
    # MEASURED (exp_paged_fold.py, r5, slope-timed same-process, v5e,
    # probes 173-174 TF/s): the unfolded kernel is grid-overhead bound at
    # decode shapes — b*hkv*n_blocks tiny steps. Folding all kv heads into
    # one step per page block (b8/hkv8/d128/psize64, bf16): 2.6x at ctx1k
    # (42.1 vs 110.5 us, npb8) and 2.9x at ctx4k (162.7 vs 469.4 us,
    # npb16); outputs bit-identical. It can only lose when hkv == 1 (no
    # fold) or when the folded working set exceeds scoped VMEM (large
    # sq*g prefill chunks: q/out/scratch all scale by hkv — seen 18.2MB >
    # the 16MB limit at sq=256/hkv=8), where we fall back to the unfolded
    # grid.
    rows_ = sq * (hq // hkv)
    g_pad_ = max(-(-rows_ // 8) * 8, 8)
    d_pad_ = max(d, 128)
    isz = k_pages.dtype.itemsize
    # Double-buffered q + out blocks, m/l/acc scratch (fp32), per-page kv.
    fixed = (4 * hkv * g_pad_ * d_pad_ * max(isz, 2)          # q + out x2
             + hkv * g_pad_ * (2 * 128 + d_pad_) * 4)         # m, l, acc
    per_page = 2 * 2 * hkv * psize * d_pad_ * isz             # k+v, 2-buf
    budget = 10 << 20
    if fold_heads is None:
        fold_heads = hkv > 1 and fixed + per_page <= budget
    if fold_heads:
        pages_per_block = max(1, min(pages_per_block,
                                     (budget - fixed) // per_page))

    npb = max(1, min(pages_per_block, pages_per_seq))
    pps_pad = round_up(pages_per_seq, npb)
    if pps_pad != pages_per_seq:
        # Dummy page 0 for padding; masked out by the length check.
        page_indices = jnp.pad(page_indices, ((0, 0), (0, pps_pad - pages_per_seq)))
    n_blocks = pps_pad // npb

    rows = sq * g
    g_pad = max(round_up(rows, 8), 8)
    d_pad = round_up(d, 128)
    # Token-major row folding: row t*g + j = (query token t, group member j).
    qg = jnp.moveaxis(q.reshape(b, sq, hkv, g, d), 1, 2).reshape(
        b, hkv, rows, d)
    if (g_pad, d_pad) != (rows, d):
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - rows),
                          (0, d_pad - d)))
    if d_pad != d:
        k_pages = jnp.pad(k_pages, ((0, 0),) * 3 + ((0, d_pad - d),))
        v_pages = jnp.pad(v_pages, ((0, 0),) * 3 + ((0, d_pad - d),))

    if fold_heads:
        return _paged_call_folded(qg, k_pages, v_pages, k_scales, v_scales,
                                  lengths, page_indices, bias, sinks, scale,
                                  window, softcap, quantized, b, sq, hq, hkv,
                                  g, rows, g_pad, d, d_pad, psize, npb,
                                  n_blocks, squeeze)

    grid = (b, hkv, n_blocks)

    def q_map(b_i, h_i, blk, lengths_ref, page_idx_ref):
        del blk, lengths_ref, page_idx_ref
        return (b_i, h_i, 0, 0)

    def kv_map_at(j):
        def kv_map(b_i, h_i, blk, lengths_ref, page_idx_ref):
            del lengths_ref
            return (h_i, page_idx_ref[b_i, blk * npb + j], 0, 0)
        return kv_map

    kv_specs = [pl.BlockSpec((1, 1, psize, d_pad), kv_map_at(j))
                for j in range(npb)]
    scale_specs = [pl.BlockSpec((1, 1, psize, 1), kv_map_at(j))
                   for j in range(npb)]
    in_specs = [pl.BlockSpec((1, 1, g_pad, d_pad), q_map)]
    inputs = [qg]
    if quantized:
        in_specs += kv_specs + scale_specs + kv_specs + scale_specs
        inputs += ([k_pages] * npb + [k_scales] * npb
                   + [v_pages] * npb + [v_scales] * npb)
    else:
        in_specs += kv_specs + kv_specs
        inputs += [k_pages] * npb + [v_pages] * npb

    bias = _normalize_bias(bias, b, hq, sq)
    if bias is not None:
        block_tokens = npb * psize
        # Fold to the kernel's row layout (row t*g + j = token t, group
        # member j) and pad rows/positions to the tile grid.
        bg = jnp.moveaxis(bias.reshape(b, hkv, g, sq, -1), 2, 3).reshape(
            b, hkv, rows, -1)
        cover = n_blocks * block_tokens
        pad_pos = cover - bg.shape[-1]
        assert pad_pos >= 0, (
            f"bias covers {bg.shape[-1]} positions > page table's {cover}")
        bg = jnp.pad(bg, ((0, 0), (0, 0), (0, g_pad - rows), (0, pad_pos)))

        def bias_map(b_i, h_i, blk, lengths_ref, page_idx_ref):
            del lengths_ref, page_idx_ref
            return (b_i, h_i, 0, blk)

        in_specs.append(pl.BlockSpec((1, 1, g_pad, block_tokens), bias_map))
        inputs.append(bg)

    if sinks is not None:
        # Per-row sink logits, token-major fold (row t*g + j -> head
        # h_i*g + j), pre-broadcast to the [rows, 128] residual tile.
        sk = jnp.asarray(sinks, jnp.float32).reshape(hkv, g)
        rows_sink = jnp.tile(sk[:, None, :], (1, sq, 1)).reshape(hkv, rows)
        rows_sink = jnp.pad(rows_sink, ((0, 0), (0, g_pad - rows)))
        rows_sink = jnp.broadcast_to(rows_sink[:, :, None],
                                     (hkv, g_pad, 128))

        def sink_map(b_i, h_i, blk, lengths_ref, page_idx_ref):
            del b_i, blk, lengths_ref, page_idx_ref
            return (h_i, 0, 0)

        in_specs.append(pl.BlockSpec((1, g_pad, 128), sink_map))
        inputs.append(rows_sink)

    kernel = functools.partial(_paged_kernel, scale=scale, page_size=psize,
                               n_blocks=n_blocks, npb=npb,
                               quantized=quantized, window=window, sq=sq,
                               g=g, has_bias=bias is not None,
                               softcap=softcap, has_sinks=sinks is not None)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, g_pad, d_pad), q_map),
            scratch_shapes=[
                pltpu.VMEM((g_pad, 128), jnp.float32),
                pltpu.VMEM((g_pad, 128), jnp.float32),
                pltpu.VMEM((g_pad, d_pad), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=dispatch.interpret_mode(),
    )(lengths.astype(jnp.int32), page_indices.astype(jnp.int32), *inputs)
    o = jnp.moveaxis(out[:, :, :rows, :d].reshape(b, hkv, sq, g, d), 2, 1)
    o = o.reshape(b, sq, hq, d)
    return o[:, 0] if squeeze else o


def _paged_call_folded(qg, k_pages, v_pages, k_scales, v_scales, lengths,
                       page_indices, bias, sinks, scale, window, softcap,
                       quantized, b, sq, hq, hkv, g, rows, g_pad, d, d_pad,
                       psize, npb, n_blocks, squeeze):
    """pallas_call assembly for the head-folded kernel: grid (b, n_blocks);
    every input block carries the FULL hkv axis (one pipelined DMA per page
    covers all heads — the page index is head-invariant)."""
    grid = (b, n_blocks)

    def q_map(b_i, blk, lengths_ref, page_idx_ref):
        del blk, lengths_ref, page_idx_ref
        return (b_i, 0, 0, 0)

    def kv_map_at(j):
        def kv_map(b_i, blk, lengths_ref, page_idx_ref):
            del lengths_ref
            return (0, page_idx_ref[b_i, blk * npb + j], 0, 0)
        return kv_map

    kv_specs = [pl.BlockSpec((hkv, 1, psize, d_pad), kv_map_at(j))
                for j in range(npb)]
    scale_specs = [pl.BlockSpec((hkv, 1, psize, 1), kv_map_at(j))
                   for j in range(npb)]
    in_specs = [pl.BlockSpec((1, hkv, g_pad, d_pad), q_map)]
    inputs = [qg]
    if quantized:
        in_specs += kv_specs + scale_specs + kv_specs + scale_specs
        inputs += ([k_pages] * npb + [k_scales] * npb
                   + [v_pages] * npb + [v_scales] * npb)
    else:
        in_specs += kv_specs + kv_specs
        inputs += [k_pages] * npb + [v_pages] * npb

    bias = _normalize_bias(bias, b, hq, sq)
    if bias is not None:
        block_tokens = npb * psize
        bg = jnp.moveaxis(bias.reshape(b, hkv, g, sq, -1), 2, 3).reshape(
            b, hkv, rows, -1)
        cover = n_blocks * block_tokens
        pad_pos = cover - bg.shape[-1]
        assert pad_pos >= 0, (
            f"bias covers {bg.shape[-1]} positions > page table's {cover}")
        bg = jnp.pad(bg, ((0, 0), (0, 0), (0, g_pad - rows), (0, pad_pos)))

        def bias_map(b_i, blk, lengths_ref, page_idx_ref):
            del lengths_ref, page_idx_ref
            return (b_i, 0, 0, blk)

        in_specs.append(
            pl.BlockSpec((1, hkv, g_pad, block_tokens), bias_map))
        inputs.append(bg)

    if sinks is not None:
        sk = jnp.asarray(sinks, jnp.float32).reshape(hkv, g)
        rows_sink = jnp.tile(sk[:, None, :], (1, sq, 1)).reshape(hkv, rows)
        rows_sink = jnp.pad(rows_sink, ((0, 0), (0, g_pad - rows)))
        rows_sink = jnp.broadcast_to(rows_sink[:, :, None],
                                     (hkv, g_pad, 128))

        def sink_map(b_i, blk, lengths_ref, page_idx_ref):
            del b_i, blk, lengths_ref, page_idx_ref
            return (0, 0, 0)

        in_specs.append(pl.BlockSpec((hkv, g_pad, 128), sink_map))
        inputs.append(rows_sink)

    kernel = functools.partial(
        _paged_kernel_folded, scale=scale, page_size=psize,
        n_blocks=n_blocks, npb=npb, quantized=quantized, window=window,
        sq=sq, g=g, hkv=hkv, has_bias=bias is not None, softcap=softcap,
        has_sinks=sinks is not None)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hkv, g_pad, d_pad), q_map),
            scratch_shapes=[
                pltpu.VMEM((hkv, g_pad, 128), jnp.float32),
                pltpu.VMEM((hkv, g_pad, 128), jnp.float32),
                pltpu.VMEM((hkv, g_pad, d_pad), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g_pad, d_pad), qg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=dispatch.interpret_mode(),
    )(lengths.astype(jnp.int32), page_indices.astype(jnp.int32), *inputs)
    o = jnp.moveaxis(out[:, :, :rows, :d].reshape(b, hkv, sq, g, d), 2, 1)
    o = o.reshape(b, sq, hq, d)
    return o[:, 0] if squeeze else o
