"""Pipeline parallelism: microbatch schedules over a mesh axis.

Each device on the ``pp`` axis holds one or more stages' parameters
(stage-stacked params sharded on their leading axis). Microbatches flow
through the ring: at tick t, the device owning stage s processes microbatch
t−s while ``ppermute`` hands its previous output to the next stage —
compute and ICI transfer overlap.

Schedules:

- **GPipe** (``virtual_stages=1``): with M microbatches over S stages the
  schedule runs S+M−1 ticks; bubble fraction (S−1)/(S+M−1).
- **Interleaved** (``virtual_stages=v > 1``): each device hosts v stage
  CHUNKS assigned round-robin (device d owns stages d, d+D, ..., d+(v−1)D
  of S = D·v total), the schedule every transfer still rides the same +1
  ring. Ticks: S+M−1 = Dv+M−1 with M·v busy ticks per device — bubble
  (D−1)·? → 1 − Mv/(Dv+M−1), i.e. ~v× smaller than GPipe's at M≈D
  (:func:`bubble_fraction` gives exact numbers; asserted in tests).
  Requires M ≤ D (two chunks of one device would otherwise contend for
  the same tick).

Differentiable end-to-end: the VJP of ppermute is the reverse permute, so
``jax.grad`` of a pipelined loss runs the backward pipeline in the opposite
direction automatically. 1F1B's *memory* benefit (live activations bounded
by stages-in-flight, not by M) is obtained under reverse-mode autodiff with
``remat_stages=True`` — stage activations are rematerialized in the
backward instead of stored per (stage, microbatch).

Payload: activations plus a flowing fp32 aux scalar per microbatch (MoE
load-balancing losses accumulate across stages); per-microbatch side inputs
(dropout keys, segment_ids, positions) are replicated and indexed by
microbatch at each stage — training-mode pipelines are first-class.

The reference has no pipeline (or any) parallelism — SURVEY.md §2.3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def schedule_ticks(n_stages: int, num_microbatches: int) -> int:
    """Total scan ticks: stage s touches microbatch m at tick s+m."""
    return n_stages + num_microbatches - 1


def bubble_fraction(n_devices: int, num_microbatches: int,
                    virtual_stages: int = 1) -> float:
    """Idle fraction of a device's ticks under the (interleaved) GPipe
    schedule: each device is busy M·v of the S+M−1 ticks."""
    s = n_devices * virtual_stages
    ticks = schedule_ticks(s, num_microbatches)
    busy = num_microbatches * virtual_stages
    return 1.0 - busy / ticks


def _pipeline_core(stage_fn, local_params, xs, aux0, mb_inputs, axis_name,
                   num_microbatches, virtual_stages, remat_stages):
    """The schedule — call INSIDE shard_map.

    ``stage_fn(chunk_params, x_mb, aux, mb_in, m_idx, s_idx) -> (y, aux)``.
    ``local_params``: this device's stage chunks, leading axis
    [virtual_stages, ...]. ``xs``: [M, mb, ...] microbatched inputs
    (replicated). ``mb_inputs``: pytree of [M, ...] per-microbatch side
    inputs (replicated), indexed here and passed to every stage. Returns
    ([M, mb, ...] outputs, [M] aux) — real only on the last stage's device
    (psum-replicated by the caller path below).
    """
    d_axis = jax.lax.psum(1, axis_name)
    dev = jax.lax.axis_index(axis_name)
    v = virtual_stages
    m = num_microbatches
    s_total = d_axis * v
    if v > 1:
        assert m <= d_axis, (
            f"interleaved schedule needs num_microbatches ({m}) <= pipeline "
            f"devices ({d_axis}): chunks of one device would contend")
    perm = [(i, (i + 1) % d_axis) for i in range(d_axis)]
    n_ticks = schedule_ticks(s_total, m)

    if remat_stages:
        stage_fn = jax.checkpoint(stage_fn, static_argnums=())

    def tick(carry, t):
        recv, recv_aux, outputs, out_aux = carry
        # Which stage chunk is this device running at tick t?
        # Stage s = dev + k*D handles microbatch m_t = t - s; with M <= D at
        # most one chunk k has m_t in range.
        k = jnp.clip((t - dev) // d_axis, 0, v - 1)
        s_idx = dev + k * d_axis
        m_t = t - s_idx
        active = (m_t >= 0) & (m_t < m)
        m_idx = jnp.clip(m_t, 0, m - 1)

        chunk_params = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, k, keepdims=False),
            local_params)
        mb_in = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, m_idx, keepdims=False),
            mb_inputs)

        # Stage 0 (device 0, chunk 0) injects microbatch m_idx (zeros past
        # the end); every other stage consumes what arrived on the ring.
        inject = (dev == 0) & (k == 0)
        first_in = jnp.where(active, 1.0, 0.0).astype(xs.dtype) * \
            jax.lax.dynamic_index_in_dim(xs, m_idx, keepdims=False)
        x_in = jnp.where(inject, first_in, recv)
        aux_in = jnp.where(inject, aux0, recv_aux)

        y, aux_y = stage_fn(chunk_params, x_in, aux_in, mb_in, m_idx, s_idx)

        # The final stage (device D-1, chunk v-1) emits into the buffers.
        emit = (dev == d_axis - 1) & (k == v - 1) & active
        cur = jax.lax.dynamic_index_in_dim(outputs, m_idx, keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(emit, y, cur), m_idx, 0)
        cur_a = jax.lax.dynamic_index_in_dim(out_aux, m_idx, keepdims=False)
        out_aux = jax.lax.dynamic_update_index_in_dim(
            out_aux, jnp.where(emit, aux_y, cur_a), m_idx, 0)

        recv = jax.lax.ppermute(y, axis_name, perm)
        recv_aux = jax.lax.ppermute(aux_y, axis_name, perm)
        return (recv, recv_aux, outputs, out_aux), None

    init = (jnp.zeros(xs.shape[1:], xs.dtype),
            jnp.zeros((), jnp.float32),
            jnp.zeros(xs.shape, xs.dtype),
            jnp.zeros((m,), jnp.float32))
    (_, _, outputs, out_aux), _ = jax.lax.scan(tick, init,
                                               jnp.arange(n_ticks))
    last = dev == d_axis - 1
    outputs = jnp.where(last, outputs, 0.0)
    out_aux = jnp.where(last, out_aux, 0.0)
    return (jax.lax.psum(outputs, axis_name),
            jax.lax.psum(out_aux, axis_name))


def pipeline_apply(stage_fn, stage_params, x, axis_name: str,
                   num_microbatches: int, virtual_stages: int = 1):
    """Run the pipeline — call INSIDE shard_map (simple-payload surface).

    stage_fn(params, x_mb) -> y_mb (same shape; stage outputs feed the next
    stage's inputs). ``stage_params``: this device's stage params (leading
    stage axis already sharded to size [virtual_stages]). ``x``: full batch
    [B, ...], replicated. Returns [B, ...] replicated (final-stage outputs).
    """
    m = num_microbatches
    b = x.shape[0]
    assert b % m == 0, (b, m)
    mb = b // m
    xs = x.reshape(m, mb, *x.shape[1:])

    def full_fn(p, x_mb, aux, mb_in, m_idx, s_idx):
        del mb_in, m_idx, s_idx
        return stage_fn(p, x_mb), aux

    outputs, _ = _pipeline_core(full_fn, stage_params, xs,
                                jnp.zeros((), jnp.float32), {}, axis_name,
                                m, virtual_stages, remat_stages=False)
    return outputs.reshape(b, *x.shape[1:])


def pipeline_gpt(mesh: Mesh, gpt, axis: str = "pp",
                 num_microbatches: int = 4, virtual_stages: int = 1,
                 remat_stages: bool = False):
    """Pipeline a real GPT over ``axis``: blocks are split into
    mesh.shape[axis] * virtual_stages stages (embedding and the LM head run
    outside the pipeline, replicated; with v > 1 each device's chunks are
    assigned round-robin for the interleaved schedule); returns
    ``(apply_fn, loss_fn)``.

    Params must be in the scan layout (``params['layers']`` leaves stacked
    [num_layers, ...] — GPTConfig(scan_layers=True).init or
    stack_gpt_layers); num_layers % num_stages == 0.

    TRAINING-MODE pipelines are first-class: ``apply_fn(params, tokens,
    training=True, rngs={'dropout': key}, segment_ids=..., positions=...)``
    threads per-(microbatch, layer) dropout keys and packed-sequence
    segment ids through the pipe, and MoE blocks accumulate their
    load-balancing aux loss across stages (``loss_fn`` adds it with
    ``config.moe_aux_weight``, mirroring GPT.loss). Dropout masks are drawn
    per microbatch — equal to a sequential model applied microbatch-wise
    with keys ``fold_in(fold_in(dropout_key, m), layer)`` (asserted in
    tests), not to a full-batch draw. On a pp x dp mesh each dp group
    additionally folds its axis index into the in-stage keys (groups hold
    different rows — identical masks would correlate the noise).

    The batch may additionally be sharded over a 'dp' mesh axis: pass a
    mesh with both axes and ``dp_axis='dp'`` rows stay on their devices
    while stages pipeline over ``axis``.
    """
    c = gpt.config
    assert c.window_pattern == 1 and getattr(c, "moe_first_dense", 0) == 0, (
        "pipeline_gpt scans ONE homogeneous block over the stacked layers; "
        "per-layer window/FFN alternation (Gemma-2 / DeepSeek) would "
        "silently apply the wrong block to half the layers")
    c = gpt.config
    n_dev = mesh.shape[axis]
    n_stages = n_dev * virtual_stages
    assert c.num_layers % n_stages == 0, (c.num_layers, n_stages)
    per_stage = c.num_layers // n_stages

    def make_stage_fn(training):
        def stage_fn(chunk_params, x, aux, mb_in, m_idx, s_idx):
            seg = mb_in.get("segment_ids")
            pos = mb_in.get("positions")
            key = mb_in.get("dropout_key")
            for i in range(per_stage):
                lp = jax.tree_util.tree_map(lambda a: a[i], chunk_params)
                layer = s_idx * per_stage + i
                r = ({"dropout": jax.random.fold_in(key, layer)}
                     if key is not None else None)
                if c.moe_experts:
                    x, a = gpt.block.apply(lp, x, training=training,
                                           rngs=r, collect_aux=True,
                                           segment_ids=seg, positions=pos)
                    aux = aux + a
                else:
                    x = gpt.block.apply(lp, x, training=training, rngs=r,
                                        segment_ids=seg, positions=pos)
            return x, aux
        return stage_fn

    def apply_fn(params, tokens, training=False, rngs=None,
                 segment_ids=None, positions=None, collect_aux=False):
        b = tokens.shape[0]
        m = num_microbatches
        assert b % m == 0, (b, m)
        mb = b // m

        x = gpt.embed.apply(params["embedding"], tokens)
        if c.embed_scale:
            x = x * jnp.asarray(c.d_model ** 0.5, x.dtype)
        if c.positional == "learned":
            pos_e = (positions if positions is not None
                     else jnp.arange(tokens.shape[-1]))
            x = x + gpt.pos_embed.apply(params["pos_embedding"], pos_e)
        if c.dtype is not None:
            x = x.astype(c.dtype)

        # Per-microbatch side inputs, replicated across the pipe.
        mb_inputs = {}
        if segment_ids is not None:
            mb_inputs["segment_ids"] = segment_ids.reshape(
                m, mb, *segment_ids.shape[1:])
        if positions is not None and c.positional == "rope":
            mb_inputs["positions"] = positions.reshape(
                m, mb, *positions.shape[1:])
        xs_pre = x.reshape(m, mb, *x.shape[1:])
        if training and rngs is not None and "dropout" in rngs:
            keys = jax.vmap(
                lambda i: jax.random.fold_in(rngs["dropout"], i))(
                    jnp.arange(m))
            mb_inputs["dropout_key"] = keys
            # Embedding dropout drawn PER MICROBATCH (key fold_in(base, m))
            # so every stochastic site sees exactly the microbatch-wise rng
            # stream the in-pipe stages use.
            xs_pre = jax.vmap(lambda xm, km: gpt.drop.apply(
                {}, xm, True, {"dropout": km}, salt=1000))(xs_pre, keys)

        staged = jax.tree_util.tree_map(
            lambda a: a.reshape(n_stages, per_stage, *a.shape[1:]),
            params["layers"])
        # Interleaved chunk layout: device d owns stages d, d+D, ...
        # -> reshape [S, ...] to [v, D, ...] and put D first for sharding.
        staged = jax.tree_util.tree_map(
            lambda a: a.reshape(virtual_stages, n_dev,
                                *a.shape[1:]).swapaxes(0, 1),
            staged)

        stage_fn = make_stage_fn(training)
        xs = xs_pre

        # pp x dp composition: if the mesh has a 'dp' axis, rows shard over
        # it (each dp group pipelines its slice of every microbatch).
        dp = "dp" if "dp" in mesh.axis_names else None
        row_spec = lambda a: P(None, dp)      # [m, mb, ...]: mb rows on dp
        mb_specs = {k: (P() if k == "dropout_key" else row_spec(v))
                    for k, v in mb_inputs.items()}

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(axis), row_spec(xs), mb_specs),
            out_specs=(row_spec(xs), P()),
            check_vma=False)
        def run(staged, xs, mb_inputs):
            local = jax.tree_util.tree_map(lambda a: a[0], staged)
            if dp is not None and "dropout_key" in mb_inputs:
                # De-correlate in-stage dropout across dp groups: the key is
                # replicated but each group holds DIFFERENT rows of the
                # microbatch — without this fold every group would draw
                # bitwise-identical masks for its rows.
                di = jax.lax.axis_index(dp)
                mb_inputs = dict(mb_inputs)
                mb_inputs["dropout_key"] = jax.vmap(
                    lambda k: jax.random.fold_in(k, di))(
                        mb_inputs["dropout_key"])
            ys, aux = _pipeline_core(stage_fn, local, xs,
                                     jnp.zeros((), jnp.float32), mb_inputs,
                                     axis, m, virtual_stages, remat_stages)
            if dp is not None:
                # Each dp group's aux is a mean over its rows; the global
                # aux is the mean of the groups -> replicated out_spec P().
                aux = jax.lax.pmean(aux, dp)
            return ys, aux

        ys, aux = run(staged, xs, mb_inputs)
        x = ys.reshape(b, *ys.shape[2:])
        # Each microbatch's aux is a sum over layers of means over ITS
        # tokens; the batch-level aux is the mean over microbatches (equal
        # sizes). NOTE: MoE routing is population-coupled (capacity cutoffs
        # see one microbatch at a time), so this equals a microbatch-wise
        # sequential oracle, not the full-batch one.
        aux_total = jnp.mean(aux)

        x = gpt.final_norm.apply(params["final_norm"], x)
        if c.tie_embeddings:
            table = params["embedding"]["table"]
            if c.dtype is not None:
                table = table.astype(c.dtype)
            logits = jnp.einsum("...d,vd->...v", x, table,
                                preferred_element_type=jnp.float32)
        else:
            logits = gpt.lm_head.apply(params["lm_head"], x)
        logits = logits.astype(jnp.float32)
        if collect_aux:
            return logits, aux_total
        return logits

    def loss_fn(params, tokens, training=False, rngs=None,
                segment_ids=None, positions=None):
        from np_modeling_tpu import ops
        seg = segment_ids[..., :-1] if segment_ids is not None else None
        pos = positions[..., :-1] if positions is not None else None
        logits, aux = apply_fn(params, tokens[..., :-1], training=training,
                               rngs=rngs, segment_ids=seg, positions=pos,
                               collect_aux=True)
        ce = ops.softmax_cross_entropy_with_integer_labels(
            logits, tokens[..., 1:])
        if segment_ids is not None:
            valid = (segment_ids[..., 1:]
                     == segment_ids[..., :-1]).astype(jnp.float32)
            ce_mean = (jnp.sum(ce * valid)
                       / jnp.maximum(jnp.sum(valid), 1.0))
        else:
            ce_mean = jnp.mean(ce)
        return ce_mean + c.moe_aux_weight * aux

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
                  num_microbatches: int = 4, virtual_stages: int = 1):
    """Build fn(stage_params, x) -> y running the pipeline over ``axis``.

    ``stage_params``: pytree with leading stage axis of size
    mesh[axis] * virtual_stages, stages assigned to devices round-robin
    when virtual_stages > 1. ``x``/output are replicated.
    """
    n_dev = mesh.shape[axis]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(),
        check_vma=False)
    def fn(stage_params, x):
        local = jax.tree_util.tree_map(lambda a: a[0], stage_params)
        return pipeline_apply(stage_fn, local, x, axis,
                              num_microbatches, virtual_stages)

    def wrapped(stage_params, x):
        # [S, ...] -> [D, v, ...]: device-major for sharding, chunk-minor.
        staged = jax.tree_util.tree_map(
            lambda a: a.reshape(virtual_stages, n_dev,
                                *a.shape[1:]).swapaxes(0, 1),
            stage_params)
        return fn(staged, x)

    return wrapped
