"""Paged attention for autoregressive decode (serving path).

During decoding the KV cache lives in non-contiguous fixed-size pages in HBM;
each sequence owns a list of page indices. The kernel walks a sequence's
pages with the page table scalar-prefetched (pltpu.PrefetchScalarGridSpec),
so the BlockSpec index_map itself chases ``page_indices`` — Pallas's pipeline
then streams exactly the right pages HBM->VMEM. Online softmax accumulates
across pages; GQA folds the q-head group for a kv head into the tile's
sublanes (the "commute sum and matmul" trick — one MXU matmul per page for
all grouped heads).

Shapes:
  q            [batch, num_q_heads, head_dim]        (one decode token)
  k_pages      [num_kv_heads, total_pages, page_size, head_dim]
  v_pages      [num_kv_heads, total_pages, page_size, head_dim]
  lengths      [batch] int32   (tokens already in cache, per sequence)
  page_indices [batch, pages_per_seq] int32
Returns: [batch, num_q_heads, head_dim].

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


def paged_attention_reference(q, k_pages, v_pages, lengths, page_indices,
                              scale=None):
    """Pure-jnp oracle: gather each sequence's pages, masked attention."""
    b, hq, d = q.shape
    hkv, _, psize, _ = k_pages.shape
    g = hq // hkv
    pages_per_seq = page_indices.shape[1]
    max_len = pages_per_seq * psize

    k_seq = k_pages[:, page_indices]          # [hkv, b, pages, psize, d]
    v_seq = v_pages[:, page_indices]
    k_seq = jnp.moveaxis(k_seq, 1, 0).reshape(b, hkv, max_len, d)
    v_seq = jnp.moveaxis(v_seq, 1, 0).reshape(b, hkv, max_len, d)

    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    qg = q.reshape(b, hkv, g, d)
    s = jnp.einsum("bhgd,bhkd->bhgk", qg, k_seq,
                   preferred_element_type=jnp.float32) * scale
    pos = jnp.arange(max_len)[None, None, None, :]
    s = jnp.where(pos < lengths[:, None, None, None], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgk,bhkd->bhgd", p, v_seq,
                   preferred_element_type=jnp.float32)
    return o.reshape(b, hq, d).astype(q.dtype)


def _paged_body(lengths_ref, q_ref, k, v, o_ref, m_scr, l_scr, acc_scr,
                scale, page_size, n_blocks):
    """Shared online-softmax page step. k/v are dequantized fp tiles."""
    b_idx, blk = pl.program_id(0), pl.program_id(2)

    @pl.when(blk == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lengths_ref[b_idx]

    @pl.when(blk * page_size < length)
    def _run():
        q = q_ref[0, 0]                        # [g_pad, d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        pos = blk * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(pos < length, s, DEFAULT_MASK_VALUE)

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
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv[:, 0:1]).astype(o_ref.dtype)


def _paged_kernel(lengths_ref, page_idx_ref,   # scalar prefetch
                  q_ref, k_ref, v_ref, o_ref,
                  m_scr, l_scr, acc_scr, *,
                  scale, page_size, n_blocks, g_pad):
    del page_idx_ref, g_pad
    _paged_body(lengths_ref, q_ref, k_ref[0, 0], v_ref[0, 0], o_ref,
                m_scr, l_scr, acc_scr, scale, page_size, n_blocks)


def _paged_kernel_q(lengths_ref, page_idx_ref,  # scalar prefetch
                    q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
                    m_scr, l_scr, acc_scr, *,
                    scale, page_size, n_blocks, g_pad):
    """Int8-quantized KV pages: dequantize per-token after the VMEM load
    (halves page-load HBM bandwidth vs fp32/bf16 caches)."""
    del page_idx_ref, g_pad
    k = k_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0]   # [psize,d]*[psize,1]
    v = v_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0]
    _paged_body(lengths_ref, q_ref, k, v, o_ref, m_scr, l_scr, acc_scr,
                scale, page_size, n_blocks)


def paged_attention(q, k_pages, v_pages, lengths, page_indices, scale=None,
                    k_scales=None, v_scales=None):
    """Paged-KV decode attention (Pallas on TPU, jnp oracle elsewhere).

    Int8 cache: pass int8 ``k_pages/v_pages`` plus fp32 per-token
    ``k_scales/v_scales`` of shape [hkv, total_pages, page_size, 1].
    """
    quantized = k_scales is not None
    if dispatch.forced() is False or not (dispatch.forced() or
                                          dispatch.on_tpu()):
        if quantized:
            k_pages = k_pages.astype(jnp.float32) * k_scales
            v_pages = v_pages.astype(jnp.float32) * v_scales
        return paged_attention_reference(q, k_pages, v_pages, lengths,
                                         page_indices, scale)

    b, hq, d = q.shape
    hkv, n_pages, psize, _ = k_pages.shape
    g = hq // hkv
    pages_per_seq = page_indices.shape[1]
    scale = float(scale if scale is not None else 1.0 / math.sqrt(d))

    g_pad = max(round_up(g, 8), 8)
    d_pad = round_up(d, 128)
    qg = q.reshape(b, hkv, g, d)
    if (g_pad, d_pad) != (g, d):
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - g), (0, d_pad - d)))
    if d_pad != d:
        k_pages = jnp.pad(k_pages, ((0, 0),) * 3 + ((0, d_pad - d),))
        v_pages = jnp.pad(v_pages, ((0, 0),) * 3 + ((0, d_pad - d),))

    grid = (b, hkv, pages_per_seq)

    def q_map(b_i, h_i, blk, lengths_ref, page_idx_ref):
        del blk, lengths_ref, page_idx_ref
        return (b_i, h_i, 0, 0)

    def kv_map(b_i, h_i, blk, lengths_ref, page_idx_ref):
        del lengths_ref
        return (h_i, page_idx_ref[b_i, blk], 0, 0)

    kv_spec = pl.BlockSpec((1, 1, psize, d_pad), kv_map)
    scale_spec = pl.BlockSpec((1, 1, psize, 1), kv_map)
    if quantized:
        kernel_fn = _paged_kernel_q
        in_specs = [pl.BlockSpec((1, 1, g_pad, d_pad), q_map),
                    kv_spec, scale_spec, kv_spec, scale_spec]
        inputs = (qg, k_pages, k_scales, v_pages, v_scales)
    else:
        kernel_fn = _paged_kernel
        in_specs = [pl.BlockSpec((1, 1, g_pad, d_pad), q_map),
                    kv_spec, kv_spec]
        inputs = (qg, k_pages, v_pages)

    kernel = functools.partial(kernel_fn, scale=scale, page_size=psize,
                               n_blocks=pages_per_seq, g_pad=g_pad)
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
    return out[:, :, :g, :d].reshape(b, hq, d)
