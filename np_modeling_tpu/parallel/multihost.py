"""Multi-host (multi-process) execution: DCN story on top of the ICI one.

The reference has no distributed code at all (SURVEY.md §2.3). The
TPU-native multi-host design is: one JAX process per host, connected by
``jax.distributed.initialize`` (the coordination service rides DCN); the
``Mesh`` then spans ALL hosts' devices and the SAME GSPMD-sharded train
step used single-host runs unchanged — XLA routes collectives over ICI
within a slice and DCN across slices. Host-local code only touches
addressable shards; global arrays are assembled with
``jax.make_array_from_process_local_data``.

Tested without a pod: two local processes, each with N virtual CPU
devices (``--xla_force_host_platform_device_count``), gloo collectives
between them — the driver-style dryrun at
``np_modeling_tpu/parallel/_multihost_dryrun.py`` proves a
dp-across-processes train step and a cross-process sharded checkpoint
save/restore (per-host manifests, ``training/checkpoint.py``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None,
               initialization_timeout: int | None = None) -> None:
    """Join (or form) a multi-process JAX cluster.

    On TPU pods call with NO arguments — the TPU runtime autodetects the
    coordinator and topology. For CPU testing / non-TPU clusters pass
    ``coordinator_address='host:port'``, ``num_processes``, ``process_id``.
    After this returns, ``jax.devices()`` is the GLOBAL device list and
    every jitted computation over a global Mesh is a collective program.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    if initialization_timeout is not None:
        kwargs.update(initialization_timeout=initialization_timeout)
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    """True on exactly one process (rank 0) — gate logging/IO side effects."""
    return jax.process_index() == 0


def global_mesh(axes: dict[str, int] | None = None) -> Mesh:
    """A Mesh over ALL processes' devices (``jax.devices()`` is global).

    Axis sizes follow :func:`np_modeling_tpu.parallel.mesh.make_mesh`
    semantics (-1 = remaining). The FIRST axis varies slowest across the
    device list, so with the default enumeration it is the axis that
    crosses host (DCN) boundaries — put ``dp`` (whose grad all-reduce is
    latency-tolerant and O(params), not O(activations)) first, and keep
    tp/sp inside a host.
    """
    from np_modeling_tpu.parallel.mesh import make_mesh
    return make_mesh(axes, devices=jax.devices())


def host_local_batch_to_global(batch, mesh: Mesh, spec: P | None = None):
    """Assemble per-host input arrays into one dp-sharded global array.

    Each process passes ITS rows (shape ``[local_batch, ...]``); the
    result is a global ``[num_processes * local_batch, ...]`` array
    sharded by ``spec`` (default: first axis on the mesh's first axis
    name). No data moves between hosts — each host's rows land on its own
    devices.
    """
    def f(x):
        s = spec if spec is not None else P(mesh.axis_names[0])
        sharding = NamedSharding(mesh, s)
        global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
        return jax.make_array_from_process_local_data(sharding, np.asarray(x),
                                                      global_shape)

    return jax.tree_util.tree_map(f, batch)


def sync(name: str = "barrier") -> None:
    """Cross-process barrier (rides the same collectives as the step)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def all_processes_equal(x) -> bool:
    """Check a host-local scalar/array agrees bitwise across processes."""
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(x))
    return bool(np.all(gathered == gathered[0]))
