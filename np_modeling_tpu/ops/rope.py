"""Rotary position embeddings (RoPE) with a hand-written VJP.

Rotation is orthogonal, so the VJP is simply the inverse rotation applied to
the cotangent — no residuals beyond the positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _angles(positions, d, base):
    # [**pos, d/2]
    inv_freq = base ** (-jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    return positions.astype(jnp.float32)[..., None] * inv_freq


def _rotate(x, positions, base, sign, rope_dim):
    """x: [b, h, s, d]; positions: [s] or [b, s]. sign=+1 fwd, -1 inverse.
    ``rope_dim``: rotate only the FIRST rope_dim features (partial rotary,
    GPT-NeoX/Phi style); the rest pass through unchanged."""
    d = x.shape[-1]
    rest = None
    if rope_dim is not None and rope_dim < d:
        x, rest = x[..., :rope_dim], x[..., rope_dim:]
        d = rope_dim
    ang = _angles(positions, d, base) * sign
    if ang.ndim == 2:                 # [s, d/2] -> broadcast over b, h
        ang = ang[None, None]
    else:                             # [b, s, d/2] -> broadcast over h
        ang = ang[:, None]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., 0::2], x[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    if rest is not None:
        out = jnp.concatenate([out, rest], axis=-1)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def apply_rope(x: jax.Array, positions: jax.Array,
               base: float = 10000.0,
               rope_dim: int | None = None) -> jax.Array:
    """Rotate interleaved (even, odd) feature pairs by position-dependent
    angles. x: [b, h, s, d] (d even); positions: [s] or [b, s].
    ``rope_dim``: partial rotary — rotate only the first rope_dim features
    (GPT-NeoX rotary_pct / Phi partial_rotary_factor)."""
    return _rotate(x, positions, base, 1.0, rope_dim)


def _rope_fwd(x, positions, base, rope_dim):
    return _rotate(x, positions, base, 1.0, rope_dim), positions


def _rope_bwd(base, rope_dim, positions, dy):
    # Orthogonal map: VJP = inverse rotation of the cotangent.
    return _rotate(dy, positions, base, -1.0, rope_dim), None


apply_rope.defvjp(_rope_fwd, _rope_bwd)
