"""Backend dispatch for Pallas kernels vs. pure-jnp fallbacks.

Pallas TPU kernels are used when running on TPU; elsewhere (CPU tests, the
8-virtual-device sharding tests) the mathematically identical jnp path runs.
Tests additionally exercise the kernels in Pallas interpret mode on CPU so the
kernel code itself is validated without TPU hardware.
"""

from __future__ import annotations

import contextlib
import threading

import jax

_state = threading.local()


def _flag(name: str, default: bool | None = None):
    return getattr(_state, name, default)


def use_pallas() -> bool:
    """True if ops should call the compiled Pallas TPU kernels."""
    forced = _flag("force_pallas")
    if forced is not None:
        return forced
    return jax.default_backend() == "tpu"


def forced() -> bool | None:
    """Tri-state: True/False if force_pallas() is active, else None."""
    return _flag("force_pallas")


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """True if pallas_call should run in interpreter mode (CPU testing)."""
    return bool(_flag("interpret", False))


@contextlib.contextmanager
def force_pallas(enabled: bool = True, interpret: bool = False):
    """Force Pallas kernels on/off (optionally in interpret mode) in a scope.

    Used by tests to run kernels on CPU: ``force_pallas(True, interpret=True)``.
    """
    prev_force, prev_interp = _flag("force_pallas"), _flag("interpret", False)
    _state.force_pallas, _state.interpret = enabled, interpret
    try:
        yield
    finally:
        _state.force_pallas, _state.interpret = prev_force, prev_interp
