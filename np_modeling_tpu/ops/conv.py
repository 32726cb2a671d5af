"""Conv2D with hand-written VJP (NHWC / HWIO, SAME padding, stride 1).

Reference parity: /root/reference/layers/conv.py.
- fwd: the reference decomposes SAME/stride-1 conv into k*k shifted matmuls
  (conv.py:100-107) — exactly how the MXU wants convs. We lower the forward
  through ``lax.conv_general_dilated`` (XLA emits the MXU conv directly) and
  keep the shifted-matmul decomposition for the filter gradient.
- bwd dx: transposed conv = conv with spatially flipped, I/O-swapped filters
  (conv.py:110-153).
- bwd dw: k*k accumulated shifted ``xᵀ@dy`` matmuls (conv.py:156-194).

Same constraints as the reference for the manual path (asserts at
conv.py:27-29,94): SAME padding, stride (1,1), odd square kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv_fwd_impl(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


@jax.custom_vjp
def conv2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """SAME/stride-1 2-D convolution. x: [N,H,W,C_in], w: [K,K,C_in,C_out]."""
    assert w.shape[0] == w.shape[1] and w.shape[0] % 2 == 1, (
        "odd square kernels only (reference conv.py:94)")
    return _conv_fwd_impl(x, w, b)


def _conv2d_fwd(x, w, b):
    return _conv_fwd_impl(x, w, b), (x, w, b is not None)


def _conv2d_bwd(res, dy):
    x, w, has_b = res
    k = w.shape[0]
    db = jnp.sum(dy, axis=(0, 1, 2)).astype(w.dtype) if has_b else None
    # dx: transposed conv == conv with spatially flipped, I/O-swapped filters.
    w_flip = jnp.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2))
    dx = jax.lax.conv_general_dilated(
        dy, w_flip, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # dw[i,j] = Σ_nhw xpad[n, h+i, w+j, ci] · dy[n, h, w, co]: k² shifted
    # matmuls — each one a big [N·H·W, C_in]ᵀ @ [N·H·W, C_out] MXU matmul.
    n, h, wd, cin = x.shape
    cout = dy.shape[-1]
    p = k // 2
    xpad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    dy2 = dy.reshape(n * h * wd, cout).astype(jnp.float32)
    rows = []
    for i in range(k):
        cols = []
        for j in range(k):
            xs = xpad[:, i:h + i, j:wd + j, :].reshape(n * h * wd, cin)
            cols.append(jax.lax.dot_general(
                xs.astype(jnp.float32), dy2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        rows.append(jnp.stack(cols, axis=0))
    dw = jnp.stack(rows, axis=0).astype(w.dtype)
    return dx, dw, db


conv2d.defvjp(_conv2d_fwd, _conv2d_bwd)


def conv2d_transpose(y: jax.Array, w: jax.Array) -> jax.Array:
    """SAME/stride-1 transposed conv (reference conv.py:110-131 semantics)."""
    w_flip = jnp.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2))
    return jax.lax.conv_general_dilated(
        y, w_flip, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(y.dtype)
