"""Checkpoint save/restore for param/optimizer pytrees.

The reference has NO checkpointing (weights live only as attrs on live
objects, /root/reference/layers/mlp.py:18; SURVEY.md §5). With explicit
pytrees this is a serialization one-liner: msgpack via flax.serialization,
written atomically.
"""

from __future__ import annotations

import os
import tempfile

import jax
from flax import serialization


def save_checkpoint(path: str, tree) -> None:
    """Atomically write a pytree (params, opt state, ...) to ``path``."""
    tree = jax.device_get(tree)
    data = serialization.to_bytes(tree)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, target):
    """Restore into the structure of ``target`` (a template pytree)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())
