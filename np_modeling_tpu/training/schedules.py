"""Learning-rate schedules as pure step -> lr functions.

The reference has no schedules (constant lr baked into each optimizer,
optimizer.py:26-41). These compose with any optimizer via
``training.scale_by_schedule`` or by passing a callable learning_rate.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

Schedule = Callable


def constant(value: float) -> Schedule:
    return lambda step: jnp.asarray(value, jnp.float32)


def linear_warmup(peak: float, warmup_steps: int) -> Schedule:
    def fn(step):
        frac = jnp.minimum(step.astype(jnp.float32) / max(warmup_steps, 1), 1.0)
        return peak * frac
    return fn


def cosine_decay(peak: float, decay_steps: int, alpha: float = 0.0) -> Schedule:
    def fn(step):
        frac = jnp.clip(step.astype(jnp.float32) / decay_steps, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * frac))
        return peak * ((1 - alpha) * cos + alpha)
    return fn


def warmup_cosine(peak: float, warmup_steps: int, total_steps: int,
                  end_value: float = 0.0) -> Schedule:
    """Linear warmup then cosine decay to end_value — the LLM default."""
    alpha = end_value / peak if peak else 0.0
    decay = cosine_decay(peak, max(total_steps - warmup_steps, 1), alpha)

    def fn(step):
        step = step.astype(jnp.float32)
        warm = peak * step / max(warmup_steps, 1)
        return jnp.where(step < warmup_steps, warm, decay(step - warmup_steps))
    return fn
