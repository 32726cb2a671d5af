"""MXU-tiled Pallas matmul with optional fused bias epilogue.

This is the raw compute primitive under `ops.linear` (which owns the manual
VJP). On TPU it runs as a Pallas kernel tiled for the 128x128 MXU with an
fp32 VMEM accumulator; off-TPU it falls back to `lax.dot_general`.

TPU-native replacement for the reference's `np.matmul` hot loops
(/root/reference/layers/mlp.py:23, conv.py:100-107).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from np_modeling_tpu.ops import dispatch


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, dims, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        a_ref[...], b_ref[...], dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _mm_bias_kernel(a_ref, b_ref, bias_ref, o_ref, acc_ref, *, dims, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        a_ref[...], b_ref[...], dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _store():
        o_ref[...] = (acc_ref[...] +
                      bias_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _block(dim: int, target: int) -> int:
    return min(round_up(dim, 128), target)


def matmul(a: jax.Array,
           b: jax.Array,
           bias: jax.Array | None = None,
           *,
           trans_a: bool = False,
           trans_b: bool = False,
           out_dtype=None,
           block_m: int = 512,
           block_n: int = 512,
           block_k: int = 512) -> jax.Array:
    """2-D matmul ``op(a) @ op(b) (+ bias)`` with fp32 accumulation.

    ``trans_a``/``trans_b`` transpose the operands *logically* (handled by the
    kernel's BlockSpec index maps — no materialized transpose).
    """
    assert a.ndim == 2 and b.ndim == 2
    m, ka = (a.shape[1], a.shape[0]) if trans_a else a.shape
    kb, n = (b.shape[1], b.shape[0]) if trans_b else b.shape
    assert ka == kb, f"contraction mismatch: {a.shape} x {b.shape}"
    out_dtype = out_dtype or jnp.result_type(a.dtype, b.dtype)

    # Default to XLA's dot_general: on TPU it fuses surrounding elementwise
    # ops, which a pallas_call boundary would block (measured: hand-kernel
    # matmuls in the train step cost ~10% end-to-end vs XLA at transformer
    # shapes). The kernel plateaus at ~78-80 TF/s at 8192³ bf16 on a
    # healthy chip (probe 145; block retune across 6 VMEM-safe configs
    # moved it only 72-80 — the per-k-step fp32 VMEM accumulator round
    # trip is the structural ceiling XLA's native MXU accumulation
    # avoids). It still beats XLA at 4096³ (39 vs 25 — XLA is
    # dispatch/HBM-bound there). It runs under force_pallas(); the
    # default path optimizes for fusion, not the lone op.
    if dispatch.forced() is not True:
        dims = ((0,) if trans_a else (1,), (1,) if trans_b else (0,))
        out = jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                                  preferred_element_type=jnp.float32)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(out_dtype)

    bm, bn, bk = _block(m, block_m), _block(n, block_n), _block(ka, block_k)
    mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(ka, bk)

    pad_a = ((0, kp - ka), (0, mp - m)) if trans_a else ((0, mp - m), (0, kp - ka))
    pad_b = ((0, np_ - n), (0, kp - ka)) if trans_b else ((0, kp - ka), (0, np_ - n))
    a_p = jnp.pad(a, pad_a) if any(p for pr in pad_a for p in pr) else a
    b_p = jnp.pad(b, pad_b) if any(p for pr in pad_b for p in pr) else b

    if trans_a:
        a_spec = pl.BlockSpec((bk, bm), lambda i, j, k: (k, i))
        dims_a = (0,)
    else:
        a_spec = pl.BlockSpec((bm, bk), lambda i, j, k: (i, k))
        dims_a = (1,)
    if trans_b:
        b_spec = pl.BlockSpec((bn, bk), lambda i, j, k: (j, k))
        dims_b = (1,)
    else:
        b_spec = pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))
        dims_b = (0,)

    nk = kp // bk
    grid = (mp // bm, np_ // bn, nk)
    out_spec = pl.BlockSpec((bm, bn), lambda i, j, k: (i, j))
    common = dict(
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid=grid,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_ + mp * np_) * 4,
            transcendentals=0),
        interpret=dispatch.interpret_mode(),
    )

    if bias is not None:
        bias_p = jnp.pad(bias, (0, np_ - n)).reshape(1, np_)
        bias_spec = pl.BlockSpec((1, bn), lambda i, j, k: (0, j))
        kernel = functools.partial(_mm_bias_kernel, dims=(dims_a, dims_b),
                                   nk=nk)
        out = pl.pallas_call(kernel, in_specs=[a_spec, b_spec, bias_spec],
                             **common)(a_p, b_p, bias_p)
    else:
        kernel = functools.partial(_mm_kernel, dims=(dims_a, dims_b), nk=nk)
        out = pl.pallas_call(kernel, in_specs=[a_spec, b_spec],
                             **common)(a_p, b_p)

    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out
