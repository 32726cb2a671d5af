"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

Each device on the ``pp`` axis holds ONE stage's parameters (stage-stacked
params sharded on their leading axis). Microbatches flow through the ring:
at tick t, stage s processes microbatch t−s while ``ppermute`` hands its
previous output to stage s+1 — compute and ICI transfer overlap. With M
microbatches and S stages the schedule runs S+M−1 ticks (bubble fraction
(S−1)/(S+M−1)).

Differentiable end-to-end: the VJP of ppermute is the reverse permute, so
``jax.grad`` of a pipelined loss runs the backward pipeline in the opposite
direction automatically.

The reference has no pipeline (or any) parallelism — SURVEY.md §2.3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(stage_fn, stage_params, x, axis_name: str,
                   num_microbatches: int):
    """Run the pipeline — call INSIDE shard_map.

    stage_fn(params, x_mb) -> y_mb (same shape; stage outputs feed the next
    stage's inputs). ``stage_params``: this device's stage params (leading
    stage axis already sharded to size 1; squeezed here). ``x``: full batch
    [B, ...], replicated. Returns [B, ...] replicated (final-stage outputs).
    """
    s_axis = jax.lax.psum(1, axis_name)
    stage = jax.lax.axis_index(axis_name)
    my_params = jax.tree_util.tree_map(lambda a: a[0], stage_params)

    m = num_microbatches
    b = x.shape[0]
    assert b % m == 0, (b, m)
    mb = b // m
    xs = x.reshape(m, mb, *x.shape[1:])
    perm = [(i, (i + 1) % s_axis) for i in range(s_axis)]
    n_ticks = s_axis + m - 1

    def tick(carry, t):
        recv, outputs = carry
        # Stage 0 injects microbatch t (zeros past the end); others consume
        # what arrived from the left neighbor.
        mb_idx = jnp.clip(t, 0, m - 1)
        first_in = jnp.where(t < m, 1.0, 0.0) * jax.lax.dynamic_index_in_dim(
            xs, mb_idx, keepdims=False)
        x_in = jnp.where(stage == 0, first_in, recv)
        y = stage_fn(my_params, x_in)
        # Last stage emits microbatch t-(S-1) into the output buffer.
        out_idx = jnp.clip(t - (s_axis - 1), 0, m - 1)
        emit = (stage == s_axis - 1) & (t >= s_axis - 1)
        cur = jax.lax.dynamic_index_in_dim(outputs, out_idx, keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(emit, y, cur), out_idx, 0)
        recv = jax.lax.ppermute(y, axis_name, perm)
        return (recv, outputs), None

    init = (jnp.zeros((mb, *x.shape[1:]), x.dtype),
            jnp.zeros((m, mb, *x.shape[1:]), x.dtype))
    (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(n_ticks))
    # Only the last stage holds real outputs; psum replicates them.
    outputs = jnp.where(stage == s_axis - 1, outputs, 0.0)
    outputs = jax.lax.psum(outputs, axis_name)
    return outputs.reshape(b, *x.shape[1:])


def pipeline_gpt(mesh: Mesh, gpt, axis: str = "pp",
                 num_microbatches: int = 4):
    """Pipeline a real GPT over ``axis``: blocks are split into
    mesh.shape[axis] stages (embedding and the LM head run outside the
    pipeline, replicated); returns ``(apply_fn, loss_fn)``.

    Params must be in the scan layout (``params['layers']`` leaves stacked
    [num_layers, ...] — GPTConfig(scan_layers=True).init or
    stack_gpt_layers); num_layers % num_stages == 0. Blocks run in eval
    mode inside the pipeline (use dp for dropout-regularized training).
    """
    c = gpt.config
    n_stages = mesh.shape[axis]
    assert c.num_layers % n_stages == 0, (c.num_layers, n_stages)
    assert not c.moe_experts, (
        "pipeline_gpt cannot thread the MoE load-balancing aux loss "
        "through the single-tensor pipeline stages; train MoE models "
        "with dp/ep sharding instead")
    per_stage = c.num_layers // n_stages

    def stage_fn(stage_params, x):
        for i in range(per_stage):
            lp = jax.tree_util.tree_map(lambda a: a[i], stage_params)
            x = gpt.block.apply(lp, x)
        return x

    pipe = make_pipeline(mesh, stage_fn, axis, num_microbatches)

    def apply_fn(params, tokens):
        x = gpt.embed.apply(params["embedding"], tokens)
        if c.positional == "learned":
            pos = jnp.arange(tokens.shape[-1])
            x = x + gpt.pos_embed.apply(params["pos_embedding"], pos)
        if c.dtype is not None:
            x = x.astype(c.dtype)
        staged = jax.tree_util.tree_map(
            lambda a: a.reshape(n_stages, per_stage, *a.shape[1:]),
            params["layers"])
        x = pipe(staged, x)
        x = gpt.final_norm.apply(params["final_norm"], x)
        if c.tie_embeddings:
            table = params["embedding"]["table"]
            if c.dtype is not None:
                table = table.astype(c.dtype)
            logits = jnp.einsum("...d,vd->...v", x, table,
                                preferred_element_type=jnp.float32)
        else:
            logits = gpt.lm_head.apply(params["lm_head"], x)
        return logits.astype(jnp.float32)

    def loss_fn(params, tokens):
        from np_modeling_tpu import ops
        logits = apply_fn(params, tokens[..., :-1])
        ce = ops.softmax_cross_entropy_with_integer_labels(
            logits, tokens[..., 1:])
        return jnp.mean(ce)

    return apply_fn, loss_fn


def stack_gpt_layers(gpt, loop_params: dict) -> dict:
    """Convert loop-layout GPT params (layer_i keys) to the stacked scan
    layout pipeline_gpt expects."""
    n = gpt.config.num_layers
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[loop_params[f"layer_{i}"] for i in range(n)])
    out = {k: v for k, v in loop_params.items() if not k.startswith("layer_")}
    out["layers"] = stacked
    return out


def make_pipeline(mesh: Mesh, stage_fn, axis: str = "pp",
                  num_microbatches: int = 4):
    """Build fn(stage_params, x) -> y running the pipeline over ``axis``.

    ``stage_params``: pytree with leading stage axis of size mesh[axis]
    (sharded onto the axis by shard_map). ``x``/output are replicated.
    """

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(),
        check_vma=False)
    def fn(stage_params, x):
        return pipeline_apply(stage_fn, stage_params, x, axis,
                              num_microbatches)

    return fn
