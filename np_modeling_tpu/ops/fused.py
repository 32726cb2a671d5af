"""Fused VPU/reduction Pallas kernels: LayerNorm, softmax-cross-entropy,
PRNG-in-kernel dropout.

These are the TPU-kernel forms of the reference's hand-derived elementwise /
reduction passes (north star in BASELINE.json:5):
- LayerNorm: /root/reference/layers/normalizations.py:33-75 (its backward
  builds an [n,n] Jacobian; here a fused two-reduction kernel).
- Softmax+CrossEntropy composition: /root/reference/loss_test.py:49-66 —
  fused over vocab tiles with an online max/sum (flash-style), saving only
  the per-row LSE as residual; backward recomputes probs in-kernel.
- Dropout: /root/reference/layers/normalizations.py:9-30 — the mask is
  REGENERATED from the TPU PRNG (pltpu.prng_seed / prng_random_bits) in the
  backward kernel instead of being stored: zero HBM residual for the mask
  while keeping the reference's fwd/bwd mask-identity contract.

Dispatch note (measured on TPU v5e): XLA's fused codegen WINS for LayerNorm
and softmax-xent at production shapes (softmax-xent fused kernel: 0.70x at
n=4k/v=32k, 0.47x at n=8k/v=50k vs the jnp path — these ops are HBM-bound
and XLA pipelines them better). The kernels therefore run only under
dispatch.force_pallas(); the always-on win is the flash-attention kernel
(ops/attention.py, 1.4-1.9x) and the PRNG dropout's memory saving.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from np_modeling_tpu.ops import dispatch
from np_modeling_tpu.ops.matmul import round_up

NUM_LANES = 128


def _interp():
    return dispatch.interpret_mode()


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------


def _ln_fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    yhat = (x - mean) * rstd
    out = g_ref[...].astype(jnp.float32) * yhat + b_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _ln_bwd_kernel(x_ref, g_ref, dz_ref, dx_ref, dg_ref, db_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    dz = dz_ref[...].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    yhat = (x - mean) * rstd
    dyhat = dz * gamma
    m1 = jnp.mean(dyhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dyhat - m1 - yhat * m2)).astype(dx_ref.dtype)
    # Per-row-tile partial sums; reduced across tiles by the caller.
    dg_ref[...] = jnp.sum(dz * yhat, axis=0, keepdims=True)
    db_ref[...] = jnp.sum(dz, axis=0, keepdims=True)


def _ln_block(n):
    # One row-tile per grid step; all of D in-tile (fits VMEM for d <= ~16k).
    bn = min(round_up(n, 8), 1024)
    return bn


def layer_norm_fwd_pallas(x, gamma, beta, eps):
    orig_shape = x.shape
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    bn = _ln_block(n)
    n_p = round_up(n, bn)
    if n_p != n:
        x2 = jnp.pad(x2, ((0, n_p - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(n_p // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_p, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interp(),
    )(x2, gamma.reshape(1, d), beta.reshape(1, d))
    return out[:n].reshape(orig_shape)


def layer_norm_bwd_pallas(x, gamma, dz, eps):
    orig_shape = x.shape
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    dz2 = dz.reshape(-1, d)
    n = x2.shape[0]
    bn = _ln_block(n)
    n_p = round_up(n, bn)
    if n_p != n:
        # Zero-padded rows give zero dz -> zero partials.
        x2 = jnp.pad(x2, ((0, n_p - n), (0, 0)))
        dz2 = jnp.pad(dz2, ((0, n_p - n), (0, 0)))
    nt = n_p // bn
    dx, dg_part, db_part = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_p, d), x.dtype),
            jax.ShapeDtypeStruct((nt, d), jnp.float32),
            jax.ShapeDtypeStruct((nt, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interp(),
    )(x2, gamma.reshape(1, d), dz2)
    dx = dx[:n].reshape(orig_shape)
    dgamma = jnp.sum(dg_part, axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(db_part, axis=0).astype(gamma.dtype)
    return dx, dgamma, dbeta


# ---------------------------------------------------------------------------
# Fused softmax cross-entropy (integer labels), tiled over the vocab axis
# ---------------------------------------------------------------------------


def _sxe_fwd_kernel(logits_ref, labels_ref, ce_ref, lse_ref,
                    m_scr, l_scr, t_scr, *, n_v, block_v, vocab):
    vi = pl.program_id(1)

    @pl.when(vi == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        t_scr[...] = jnp.zeros_like(t_scr)

    logits = logits_ref[...].astype(jnp.float32)         # [bn, bv]
    bn, bv = logits.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1) + vi * block_v
    valid = col < vocab
    logits = jnp.where(valid, logits, -1e30)

    m_prev, l_prev = m_scr[...], l_scr[...]
    m_curr = jnp.max(logits, axis=1)[:, None]
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(logits - m_next[:, 0:1])
    l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
    m_scr[...] = m_next

    # Accumulate the label logit: sum(logits * onehot) over vocab tiles.
    labels = labels_ref[...]                              # [bn, 128] int32
    hit = (col == labels[:, 0:1]) & valid
    t_scr[...] += jnp.sum(jnp.where(hit, logits, 0.0), axis=1)[:, None]

    @pl.when(vi == n_v - 1)
    def _store():
        lse = m_scr[...] + jnp.log(l_scr[...])
        lse_ref[...] = lse
        ce_ref[...] = lse - t_scr[...]


def _sxe_bwd_kernel(logits_ref, labels_ref, lse_ref, g_ref, dlogits_ref, *,
                    block_v, vocab):
    vi = pl.program_id(1)
    logits = logits_ref[...].astype(jnp.float32)
    bn, bv = logits.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1) + vi * block_v
    valid = col < vocab
    p = jnp.where(valid, jnp.exp(logits - lse_ref[...][:, 0:1]), 0.0)
    onehot = ((col == labels_ref[...][:, 0:1]) & valid).astype(jnp.float32)
    dlogits_ref[...] = ((p - onehot) * g_ref[...][:, 0:1]).astype(
        dlogits_ref.dtype)


def _sxe_blocks(n, v):
    # Keep in+out tiles (x2 pipeline buffers) well under the 16MB scoped VMEM:
    # 256x1024 fp32 = 1MB per buffer.
    bn = min(round_up(n, 8), 256)
    bv = min(round_up(v, 128), 1024)
    return bn, bv


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def softmax_cross_entropy_fused(logits, labels):
    """Per-example CE from logits with int labels — fused Pallas kernel.

    Residual is only the per-row LSE (the probs are recomputed in the
    backward kernel). Equivalent math to ops.softmax_cross_entropy.
    """
    ce, _ = _sxe_fwd_impl(logits, labels)
    return ce


def _sxe_fwd_impl(logits, labels):
    orig = logits.shape[:-1]
    v = logits.shape[-1]
    l2 = logits.reshape(-1, v)
    lab = labels.reshape(-1).astype(jnp.int32)
    n = l2.shape[0]
    bn, bv = _sxe_blocks(n, v)
    n_p, v_p = round_up(n, bn), round_up(v, bv)
    if (n_p, v_p) != (n, v):
        l2 = jnp.pad(l2, ((0, n_p - n), (0, v_p - v)))
        lab = jnp.pad(lab, (0, n_p - n))
    lab2 = jnp.broadcast_to(lab[:, None], (n_p, NUM_LANES))
    n_v = v_p // bv
    ce, lse = pl.pallas_call(
        functools.partial(_sxe_fwd_kernel, n_v=n_v, block_v=bv, vocab=v),
        grid=(n_p // bn, n_v),
        in_specs=[
            pl.BlockSpec((bn, bv), lambda i, j: (i, j)),
            pl.BlockSpec((bn, NUM_LANES), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, NUM_LANES), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, NUM_LANES), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_p, NUM_LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_p, NUM_LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, NUM_LANES), jnp.float32),
            pltpu.VMEM((bn, NUM_LANES), jnp.float32),
            pltpu.VMEM((bn, NUM_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interp(),
    )(l2, lab2)
    return ce[:n, 0].reshape(orig), lse[:n, 0]


def _sxe_fused_fwd(logits, labels):
    ce, lse = _sxe_fwd_impl(logits, labels)
    return ce, (logits, labels, lse)


def _sxe_fused_bwd(res, g):
    logits, labels, lse = res
    orig = logits.shape
    v = orig[-1]
    l2 = logits.reshape(-1, v)
    lab = labels.reshape(-1).astype(jnp.int32)
    g2 = g.reshape(-1).astype(jnp.float32)
    n = l2.shape[0]
    bn, bv = _sxe_blocks(n, v)
    n_p, v_p = round_up(n, bn), round_up(v, bv)
    if (n_p, v_p) != (n, v):
        l2 = jnp.pad(l2, ((0, n_p - n), (0, v_p - v)))
        lab = jnp.pad(lab, (0, n_p - n))
        g2 = jnp.pad(g2, (0, n_p - n))
    lab2 = jnp.broadcast_to(lab[:, None], (n_p, NUM_LANES))
    lse2 = jnp.broadcast_to(
        jnp.pad(lse, (0, n_p - n))[:, None], (n_p, NUM_LANES))
    g_b = jnp.broadcast_to(g2[:, None], (n_p, NUM_LANES))
    dlogits = pl.pallas_call(
        functools.partial(_sxe_bwd_kernel, block_v=bv, vocab=v),
        grid=(n_p // bn, v_p // bv),
        in_specs=[
            pl.BlockSpec((bn, bv), lambda i, j: (i, j)),
            pl.BlockSpec((bn, NUM_LANES), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, NUM_LANES), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, NUM_LANES), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bn, bv), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n_p, v_p), logits.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interp(),
    )(l2, lab2, lse2, g_b)
    return dlogits[:n, :v].reshape(orig), None


softmax_cross_entropy_fused.defvjp(_sxe_fused_fwd, _sxe_fused_bwd)


# ---------------------------------------------------------------------------
# Dropout with in-kernel PRNG (mask never hits HBM)
# ---------------------------------------------------------------------------


def _dropout_kernel(seed_ref, x_ref, o_ref, *, rate):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)   # per-tile independent stream
    bits = pltpu.prng_random_bits(x_ref.shape)
    threshold = jnp.uint32(int((1.0 - rate) * (2 ** 32 - 1)))
    keep = pltpu.bitcast(bits, jnp.uint32) < threshold
    scale = 1.0 / (1.0 - rate)
    o_ref[...] = jnp.where(keep, x_ref[...] * scale, 0.0).astype(o_ref.dtype)


def _dropout_call(x, seed, rate):
    orig = x.shape
    d = x.shape[-1] if x.ndim > 1 else x.shape[0]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    bn = min(round_up(n, 8), 1024)
    n_p = round_up(n, bn)
    if n_p != n:
        x2 = jnp.pad(x2, ((0, n_p - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_dropout_kernel, rate=rate),
        grid=(n_p // bn,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_p, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interp(),
    )(seed, x2)
    return out[:n].reshape(orig)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dropout_prng(x, seed, rate):
    """Inverted dropout; mask derived in-kernel from ``seed`` (int32 [1]).

    The backward kernel re-seeds the same PRNG stream and regenerates the
    identical mask — the reference's cached-mask contract
    (normalizations.py:25-30) with ZERO residual memory for the mask.
    """
    return _dropout_call(x, seed, rate)


def _dropout_prng_fwd(x, seed, rate):
    return _dropout_call(x, seed, rate), seed


def _dropout_prng_bwd(rate, seed, dy):
    return _dropout_call(dy, seed, rate), None


dropout_prng.defvjp(_dropout_prng_fwd, _dropout_prng_bwd)


def seed_from_key(key: jax.Array) -> jax.Array:
    """Derive an int32 [1] kernel seed from a JAX PRNG key."""
    data = jax.random.key_data(key).reshape(-1)
    return (data[-1].astype(jnp.uint32) >> 1).astype(jnp.int32).reshape(1)
