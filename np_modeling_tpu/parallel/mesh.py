"""Device mesh construction for dp/fsdp/tp/sp parallelism.

The reference has no distributed code at all (SURVEY.md §2.3); the TPU-native
distributed story is a ``jax.sharding.Mesh`` + NamedSharding annotations with
XLA-inserted collectives over ICI — nothing hand-rolled.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a Mesh. ``axes`` maps axis name -> size; -1 means "remaining".

    Default layout: everything on 'dp' (pure data parallel). Example:
    ``make_mesh({'dp': -1, 'tp': 2})`` on 8 devices -> 4x2 dp×tp mesh.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axes is None:
        axes = {"dp": n}
    names, sizes = list(axes.keys()), list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        assert n % known == 0, f"{n} devices not divisible by {known}"
        sizes = [n // known if s == -1 else s for s in sizes]
    assert int(np.prod(sizes)) == n, (
        f"mesh {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(names))


def auto_mesh(n_devices: int | None = None,
              devices=None) -> Mesh:
    """Mesh with dp/tp(/sp) axes auto-factored from the device count.

    Used by the multi-chip dryrun: 8 devices -> (dp=2, sp=2, tp=2);
    4 -> (dp=2, tp=2); primes/odd -> all-dp.
    """
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % 8 == 0:
        return make_mesh({"dp": n // 4, "sp": 2, "tp": 2}, devices)
    if n % 2 == 0:
        return make_mesh({"dp": n // 2, "sp": 1, "tp": 2}, devices)
    return make_mesh({"dp": n, "sp": 1, "tp": 1}, devices)
