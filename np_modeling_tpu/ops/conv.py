"""Conv2D with hand-written VJP (NHWC / HWIO).

Reference parity: /root/reference/layers/conv.py supports only SAME padding,
stride (1,1), odd square kernels (asserts at conv.py:27-29, 94). We keep the
reference's manual derivations and GENERALIZE them:

- fwd: ``lax.conv_general_dilated`` (XLA emits the MXU conv directly; the
  reference's k*k shifted-matmul decomposition at conv.py:100-107 is what XLA
  generates anyway).
- bwd dx: transposed conv — conv of dy with spatially flipped, I/O-swapped
  filters (reference conv.py:110-153), generalized to strides via lhs
  dilation (insert stride-1 zeros between dy pixels).
- bwd dw: the reference's shifted ``xᵀ@dy`` accumulation (conv.py:156-194)
  is exactly a conv of x with dy as the kernel; strides generalize via rhs
  dilation. Implemented with batch<->feature transposed dimension numbers.

Supports SAME/VALID padding and arbitrary strides; rectangular and even
kernels included.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DIMS = ("NHWC", "HWIO", "NHWC")


def _fwd_pads(x_shape, w_shape, strides, padding):
    """Per-spatial-dim (lo, hi) padding used by the forward conv."""
    if padding == "VALID":
        return [(0, 0), (0, 0)]
    assert padding == "SAME", padding
    pads = []
    for i in range(2):
        in_size = x_shape[1 + i]
        k = w_shape[i]
        out_size = -(-in_size // strides[i])
        total = max((out_size - 1) * strides[i] + k - in_size, 0)
        pads.append((total // 2, total - total // 2))
    return pads


def _conv_fwd_impl(x, w, b, strides, padding):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=DIMS, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
           strides: tuple = (1, 1), padding: str = "SAME") -> jax.Array:
    """2-D convolution. x: [N,H,W,Cin], w: [Kh,Kw,Cin,Cout]."""
    return _conv_fwd_impl(x, w, b, strides, padding)


def _conv2d_fwd(x, w, b, strides, padding):
    return _conv_fwd_impl(x, w, b, strides, padding), (x, w, b is not None)


def _conv2d_bwd(strides, padding, res, dy):
    x, w, has_b = res
    kh, kw = w.shape[0], w.shape[1]
    pads = _fwd_pads(x.shape, w.shape, strides, padding)
    db = jnp.sum(dy, axis=(0, 1, 2)).astype(w.dtype) if has_b else None

    # dx: transposed conv. Dilate dy by the stride (lhs_dilation), convolve
    # with spatially flipped, I/O-swapped filters. Padding for each spatial
    # dim: (k-1-lo, k-1-hi + align) where align recovers rows the forward
    # stride skipped at the input's tail.
    w_flip = jnp.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2))
    dx_pads = []
    for i, k in enumerate((kh, kw)):
        lo, hi = pads[i]
        dilated = (dy.shape[1 + i] - 1) * strides[i] + 1
        align = x.shape[1 + i] + lo + hi - (dilated + k - 1) + (k - 1 - hi)
        dx_pads.append((k - 1 - lo, align))
    dx = jax.lax.conv_general_dilated(
        dy, w_flip, window_strides=(1, 1), padding=dx_pads,
        lhs_dilation=strides, dimension_numbers=DIMS,
        preferred_element_type=jnp.float32).astype(x.dtype)

    # dw[kh,kw,ci,co] = Σ_{n,oh,ow} xpad[n, oh·s+kh, ow·s+kw, ci]·dy[n,oh,ow,co]
    # == conv(x, dy) with batch as the contraction: lhs = x with Cin as
    # "batch", rhs = dy with N as "input channels", rhs dilated by the stride.
    # High padding is recomputed from the USED input extent (oh-1)·s + k —
    # a stride can leave tail rows unread; negative padding crops them.
    dw_pads = []
    for i, k in enumerate((kh, kw)):
        lo, _ = pads[i]
        used = (dy.shape[1 + i] - 1) * strides[i] + k
        dw_pads.append((lo, used - x.shape[1 + i] - lo))
    dw = jax.lax.conv_general_dilated(
        jnp.transpose(x, (3, 1, 2, 0)),        # [Cin, H, W, N]
        jnp.transpose(dy, (1, 2, 0, 3)),       # [Oh, Ow, N, Cout]
        window_strides=(1, 1), padding=dw_pads, rhs_dilation=strides,
        dimension_numbers=DIMS,
        preferred_element_type=jnp.float32)    # [Cin, Kh, Kw, Cout]
    dw = jnp.transpose(dw, (1, 2, 0, 3)).astype(w.dtype)
    return dx, dw, db


conv2d.defvjp(_conv2d_fwd, _conv2d_bwd)


def conv2d_transpose(y: jax.Array, w: jax.Array) -> jax.Array:
    """SAME/stride-1 transposed conv (reference conv.py:110-131 semantics)."""
    w_flip = jnp.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2))
    return jax.lax.conv_general_dilated(
        y, w_flip, window_strides=(1, 1), padding="SAME",
        dimension_numbers=DIMS,
        preferred_element_type=jnp.float32).astype(y.dtype)
