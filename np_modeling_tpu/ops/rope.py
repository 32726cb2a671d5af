"""Rotary position embeddings (RoPE) with a hand-written VJP.

Rotation is orthogonal, so the VJP is simply the inverse rotation applied to
the cotangent — no residuals beyond the positions.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _scale_inv_freq(inv_freq, scaling, base, d):
    """Apply a RoPE frequency-scaling rule (long-context checkpoints).

    ``scaling`` is a hashable tuple (it rides custom_vjp nondiff args):
    ("linear", factor) — position-interpolation: all frequencies / factor;
    ("llama3", factor, low_freq_factor, high_freq_factor, original_max) —
    Llama-3.1 piecewise NTK: long wavelengths (> original_max /
    low_freq_factor) divide by factor, short ones (< original_max /
    high_freq_factor) stay, the band between interpolates smoothly;
    ("yarn", factor, beta_fast, beta_slow, original_max, mscale) — YaRN
    (DeepSeek-V2 / Qwen long): interpolated and extrapolated frequencies
    mixed by a linear ramp between the beta correction dims, with
    ``mscale`` multiplying the rotated features (HF applies it to
    cos/sin; both q and k are rotated, so scores scale by mscale^2)."""
    kind = scaling[0]
    if kind == "linear":
        return inv_freq / scaling[1]
    if kind == "yarn":
        _, factor, beta_fast, beta_slow, orig, _ = scaling

        def corr_dim(n_rot):          # dim whose wavelength = orig/n_rot
            return (d * math.log(orig / (n_rot * 2.0 * math.pi))
                    / (2.0 * math.log(base)))

        low = max(math.floor(corr_dim(beta_fast)), 0)
        high = min(math.ceil(corr_dim(beta_slow)), d - 1)
        if low == high:
            high = high + 0.001       # HF's singularity guard
        ramp = jnp.clip((jnp.arange(d // 2, dtype=jnp.float32) - low)
                        / (high - low), 0.0, 1.0)
        extrap = 1.0 - ramp           # 1 at low-dim (short-wavelength) end
        return inv_freq / factor * (1.0 - extrap) + inv_freq * extrap
    assert kind == "llama3", f"unknown rope scaling {kind!r}"
    _, factor, low_f, high_f, orig = scaling
    wavelen = 2.0 * jnp.pi / inv_freq
    low_wl = orig / low_f        # longest wavelength left unscaled-ish
    high_wl = orig / high_f
    smooth = (orig / wavelen - low_f) / (high_f - low_f)
    mid = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    out = jnp.where(wavelen > low_wl, inv_freq / factor, mid)
    return jnp.where(wavelen < high_wl, inv_freq, out)


def _angles(positions, d, base, scaling=None):
    # [**pos, d/2]
    inv_freq = base ** (-jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    if scaling is not None:
        inv_freq = _scale_inv_freq(inv_freq, scaling, base, d)
    return positions.astype(jnp.float32)[..., None] * inv_freq


def _rotate(x, positions, base, sign, rope_dim, scaling=None):
    """x: [b, h, s, d]; positions: [s] or [b, s]. sign=+1 fwd, -1 inverse.
    ``rope_dim``: rotate only the FIRST rope_dim features (partial rotary,
    GPT-NeoX/Phi style); the rest pass through unchanged."""
    d = x.shape[-1]
    rest = None
    if rope_dim is not None and rope_dim < d:
        x, rest = x[..., :rope_dim], x[..., rope_dim:]
        d = rope_dim
    ang = _angles(positions, d, base, scaling) * sign
    if ang.ndim == 2:                 # [s, d/2] -> broadcast over b, h
        ang = ang[None, None]
    else:                             # [b, s, d/2] -> broadcast over h
        ang = ang[:, None]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    if scaling is not None and scaling[0] == "yarn" and scaling[5] != 1.0:
        # YaRN attention factor rides cos/sin (HF semantics). The map
        # stays a scaled rotation, so the inverse-rotation VJP only needs
        # the same scalar (d(m*R x)/dx^T = m*R^-1).
        cos, sin = cos * scaling[5], sin * scaling[5]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    if rest is not None:
        out = jnp.concatenate([out, rest], axis=-1)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def apply_rope(x: jax.Array, positions: jax.Array,
               base: float = 10000.0,
               rope_dim: int | None = None,
               scaling: tuple | None = None) -> jax.Array:
    """Rotate interleaved (even, odd) feature pairs by position-dependent
    angles. x: [b, h, s, d] (d even); positions: [s] or [b, s].
    ``rope_dim``: partial rotary — rotate only the first rope_dim features
    (GPT-NeoX rotary_pct / Phi partial_rotary_factor).
    ``scaling``: frequency-scaling tuple for long-context checkpoints —
    ("linear", factor) or ("llama3", factor, low, high, original_max);
    see :func:`_scale_inv_freq`. Scaling is still an orthogonal rotation,
    so the hand-written inverse-rotation VJP is unchanged."""
    return _rotate(x, positions, base, 1.0, rope_dim, scaling)


def _rope_fwd(x, positions, base, rope_dim, scaling):
    return _rotate(x, positions, base, 1.0, rope_dim, scaling), positions


def _rope_bwd(base, rope_dim, scaling, positions, dy):
    # Orthogonal map: VJP = inverse rotation of the cotangent.
    return _rotate(dy, positions, base, -1.0, rope_dim, scaling), None


apply_rope.defvjp(_rope_fwd, _rope_bwd)
