"""FSDP (ZeRO-3): shard the PARAMS themselves over a data axis.

ZeRO-1 (parallel/zero.py) shards only the optimizer moments — params and
grads stay replicated on every device. FSDP goes the rest of the way: each
parameter is stored sharded over an ``fsdp`` mesh axis, and the weight is
(all-)gathered only around the layer that uses it. On TPU this is purely a
placement decision: annotate one replicated, divisible dimension of each
param with the ``fsdp`` axis and let GSPMD insert the collectives —
all-gather of the weight right before its matmul (forward, and again in the
backward recompute: the XLA analogue of torch-FSDP's unshard/reshard) and a
reduce-scatter of the weight gradient back to the shard. Because jit
propagates layouts, grads and Adam moments inherit the param sharding with
no further annotation, so per-device memory for params + grads + moments
drops by the fsdp-axis size while the compute stays pure data parallel
(the batch is sharded over dp AND fsdp together).

Composes with tensor parallelism: specs start from the param's tp layout
(``rules``) and the fsdp axis lands on the first still-replicated divisible
dim — the same longest-wins placement ZeRO-1 uses for moments.

Usage::

    mesh = parallel.make_mesh({"fsdp": 8})          # or {"dp":2,"fsdp":2,"tp":2}
    params = parallel.fsdp_params(params, mesh)     # sharded storage
    tokens = parallel.shard_batch(tokens, mesh)     # batch over dp x fsdp
    state = parallel.fsdp_opt_init(opt, params, mesh)   # moments sharded too
    # ... ordinary jitted train step, unchanged.

(``fsdp_opt_init`` matters: a bare ``opt.init`` under jit materializes the
moments REPLICATED — ``zeros_like`` has no data dependence on the param, so
GSPMD has nothing to propagate from and the ZeRO-3 memory win silently
evaporates. Pinning out_shardings to the param specs closes that hole.)

The reference has no distributed training at all (SURVEY.md §2.3); this
completes the ZeRO ladder (1 = moments, 3 = params) alongside dp/tp/sp/pp/ep.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from np_modeling_tpu.parallel.sharding import TRANSFORMER_RULES, partition_specs
from np_modeling_tpu.parallel.zero import zero1_shardings, zero1_spec

# Below this many elements a param stays replicated: gathering a tiny bias
# costs a collective per step for no memory win (same default as ZeRO-1).
_MIN_SIZE = 16384


def fsdp_specs(params, mesh: Mesh, axis: str = "fsdp",
               min_size: int = _MIN_SIZE, rules=TRANSFORMER_RULES):
    """Pytree of PartitionSpecs: the param's ``rules`` (tp) layout plus the
    ``axis`` on its first still-replicated divisible dimension."""
    base = partition_specs(params, rules, mesh)
    return jax.tree.map(
        lambda leaf, b: zero1_spec(leaf, mesh, axis, min_size, b),
        params, base)


def fsdp_params(params, mesh: Mesh, axis: str = "fsdp",
                min_size: int = _MIN_SIZE, rules=TRANSFORMER_RULES):
    """device_put params FSDP-sharded (tp layout from ``rules`` preserved)."""
    specs = fsdp_specs(params, mesh, axis, min_size, rules)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def fsdp_opt_init(optimizer, params, mesh: Mesh, axis: str = "fsdp",
                  min_size: int = _MIN_SIZE, rules=TRANSFORMER_RULES):
    """``optimizer.init(params)`` with each moment pinned to its param's
    FSDP spec (longest-suffix path match, as ZeRO-1 does — here with NO
    extra axis added: the param layout already carries the data axis)."""
    specs = fsdp_specs(params, mesh, axis, min_size, rules)
    shapes = jax.eval_shape(optimizer.init, params)
    shardings = zero1_shardings(shapes, mesh, axis="", param_specs=specs)
    return jax.jit(optimizer.init, out_shardings=shardings)(params)
