"""ZeRO-1: shard optimizer state over the data-parallel axis.

Under plain dp, params/grads/optimizer moments are replicated on every
device — Adam's two fp32 moments cost 2x the (fp32) param memory on EACH
chip. ZeRO stage 1 shards the OPTIMIZER STATE across the dp axis while
params and grads stay replicated: each device updates only its 1/N slice
of the moments, and GSPMD all-gathers the resulting update slices back to
replicated updates. In JAX this is purely a placement decision — the same
pure optimizer transforms (training/optimizers.py) run unchanged; we pin
the state's sharding and let XLA partition the elementwise update math to
follow it.

Composes with tensor parallelism: pass ``param_specs`` (from
``parallel.partition_specs``) and each moment keeps its param's tp layout
while gaining dp on the first still-replicated divisible dim.

Usage::

    opt = training.adam(1e-3)
    state = zero1_init(opt, params, mesh, axis="dp",
                       param_specs=parallel.partition_specs(params, rules,
                                                            mesh))
    @jax.jit
    def step(p, s, batch):
        loss, g = jax.value_and_grad(model.loss)(p, batch)
        u, s = opt.update(g, s, p)       # XLA partitions along s's layout
        return training.apply_updates(p, u), s, loss

The reference has no distributed training at all (SURVEY §2.3); this
completes the dp story alongside tp/sp/pp/ep.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from np_modeling_tpu.parallel.sharding import _path_str


def zero1_spec(leaf, mesh: Mesh, axis: str = "dp", min_size: int = 16384,
               base: P = P()) -> P:
    """PartitionSpec adding ``axis`` on the first base-replicated divisible
    dim of ``leaf`` (on top of ``base`` — e.g. the param's tp layout).

    Leaves smaller than ``min_size`` elements keep ``base`` unchanged
    (sharding a tiny scalar/bias moment costs an all-gather for no memory
    win); scalar state (step counts) is always left alone.
    """
    if axis not in mesh.axis_names:
        return base
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n = sizes[axis]
    shape = getattr(leaf, "shape", ())
    if not shape or int(np.prod(shape)) < min_size:
        return base
    base_t = tuple(base) + (None,) * (len(shape) - len(tuple(base)))
    for i, (dim, ax) in enumerate(zip(shape, base_t)):
        if ax is not None:
            # Already sharded (tp etc.): dp must divide the LOCAL dim.
            continue
        if dim % n == 0:
            return P(*(base_t[:i] + (axis,) + base_t[i + 1:]))
    return base


def _base_spec_lookup(param_specs):
    """Map '/'-joined param paths -> spec, for suffix matching against
    optimizer-state leaf paths (state subtrees like AdamState.mu mirror
    the param tree, with extra leading path components)."""
    if param_specs is None:
        return {}
    table = {}
    for path, spec in jax.tree_util.tree_flatten_with_path(param_specs,
                                                           is_leaf=lambda
                                                           x: isinstance(
                                                               x, P))[0]:
        table[_path_str(path)] = spec
    return table


def zero1_shardings(state_shapes, mesh: Mesh, axis: str = "dp",
                    min_size: int = 16384, param_specs=None):
    """Pytree of NamedShardings for an optimizer-state pytree (shapes or
    arrays). ``param_specs``: optional pytree of PartitionSpecs matching
    the PARAMS (``parallel.partition_specs``); moment leaves whose path
    ends with a param's path inherit that spec before dp is added (the
    LONGEST matching param path wins — a param path that is a suffix of
    another must not shadow it)."""
    table = _base_spec_lookup(param_specs)
    by_len = sorted(table.items(), key=lambda kv: -len(kv[0]))

    def spec_of(path, leaf):
        ps = _path_str(path)
        base = P()
        for param_path, spec in by_len:
            if ps == param_path or ps.endswith("/" + param_path):
                base = spec
                break
        return NamedSharding(mesh, zero1_spec(leaf, mesh, axis, min_size,
                                              base))

    return jax.tree_util.tree_map_with_path(spec_of, state_shapes)


def zero1_init(optimizer, params, mesh: Mesh, axis: str = "dp",
               min_size: int = 16384, param_specs=None):
    """``optimizer.init(params)`` with the state placed ZeRO-1-sharded.

    The state is computed under jit with ``out_shardings`` pinned, so the
    fully-replicated moments never materialize on any single device.
    """
    shapes = jax.eval_shape(optimizer.init, params)
    shardings = zero1_shardings(shapes, mesh, axis, min_size, param_specs)
    return jax.jit(optimizer.init, out_shardings=shardings)(params)
