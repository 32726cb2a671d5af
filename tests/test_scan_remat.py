"""scan_layers and remat GPT options: numerically equal to the loop path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models, training
from np_modeling_tpu.utils.testing import assert_allclose, assert_trees_allclose

rng = np.random.default_rng(0)


def _cfg(**kw):
    return models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                            num_layers=3, hidden_units=64, max_len=16, **kw)


def _stack_loop_params(loop_params, n):
    """Convert loop-layout params (layer_i keys) to scan layout (stacked)."""
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[loop_params[f"layer_{i}"] for i in range(n)])
    out = {k: v for k, v in loop_params.items()
           if not k.startswith("layer_")}
    out["layers"] = stacked
    return out


def test_scan_equals_loop_forward_and_grads():
    tokens = jnp.asarray(rng.integers(0, 50, (2, 12)))
    gpt_loop = models.GPT(_cfg())
    gpt_scan = models.GPT(_cfg(scan_layers=True))
    p_loop = gpt_loop.init(jax.random.PRNGKey(0), tokens)
    p_scan = _stack_loop_params(p_loop, 3)

    assert_allclose(gpt_scan.apply(p_scan, tokens),
                    gpt_loop.apply(p_loop, tokens), rtol=1e-5, atol=1e-5)

    g_loop = jax.grad(lambda p: gpt_loop.loss(p, tokens))(p_loop)
    g_scan = jax.grad(lambda p: gpt_scan.loss(p, tokens))(p_scan)
    assert_allclose(g_scan["layers"]["self_attention"]["wq"][1],
                    g_loop["layer_1"]["self_attention"]["wq"],
                    rtol=1e-4, atol=1e-5)
    assert_allclose(g_scan["embedding"]["table"],
                    g_loop["embedding"]["table"], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scan", [False, True])
def test_remat_equals_plain(scan):
    tokens = jnp.asarray(rng.integers(0, 50, (2, 12)))
    gpt = models.GPT(_cfg(scan_layers=scan))
    gpt_r = models.GPT(_cfg(scan_layers=scan, remat=True))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    l1, g1 = jax.value_and_grad(lambda p: gpt.loss(p, tokens))(params)
    l2, g2 = jax.value_and_grad(lambda p: gpt_r.loss(p, tokens))(params)
    assert_allclose(l2, l1, rtol=1e-6, atol=1e-6)
    assert_trees_allclose(g2, g1, rtol=1e-5, atol=1e-5)


def test_scan_kv_cache_decode():
    tokens = jnp.asarray(rng.integers(0, 50, (2, 10)))
    gpt = models.GPT(_cfg(scan_layers=True))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    full = gpt.apply(params, tokens)
    caches = gpt.init_cache(batch=2, max_len=12)
    outs = []
    for i in range(10):
        lg, caches = gpt.apply(params, tokens[:, i:i + 1], caches=caches,
                               decode=True)
        outs.append(lg)
    assert_allclose(jnp.concatenate(outs, axis=1), full, rtol=1e-4, atol=1e-4)


def test_scan_trains():
    tokens = jnp.asarray(rng.integers(0, 50, (4, 12)))
    gpt = models.GPT(_cfg(scan_layers=True, remat=True))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    opt = training.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda p: gpt.loss(p, tokens))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss

    losses = [float(step(params, state)[2])]
    for _ in range(10):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_scan_threads_segment_ids_and_positions():
    """scan_layers=True must apply the same packed-segment masking and rope
    positions as the loop path (regression: scan body used to drop them)."""
    tokens = jnp.asarray(rng.integers(0, 50, (2, 12)))
    segs = jnp.asarray(np.broadcast_to(np.repeat([0, 1], 6), (2, 12)))
    positions = jnp.asarray(np.tile(np.arange(6), 2))[None, :].repeat(2, 0)
    for kw in [dict(), dict(positional="rope")]:
        gpt_loop = models.GPT(_cfg(**kw))
        gpt_scan = models.GPT(_cfg(scan_layers=True, **kw))
        p_loop = gpt_loop.init(jax.random.PRNGKey(0), tokens)
        p_scan = _stack_loop_params(p_loop, 3)
        assert_allclose(
            gpt_scan.apply(p_scan, tokens, segment_ids=segs,
                           positions=positions),
            gpt_loop.apply(p_loop, tokens, segment_ids=segs,
                           positions=positions),
            rtol=1e-5, atol=1e-5)
        # Segment isolation must hold under scan too.
        l1 = gpt_scan.apply(p_scan, tokens, segment_ids=segs,
                            positions=positions)
        tokens2 = tokens.at[:, 6:].set((tokens[:, 6:] + 1) % 50)
        l2 = gpt_scan.apply(p_scan, tokens2, segment_ids=segs,
                            positions=positions)
        assert_allclose(l1[:, :6], l2[:, :6], rtol=0, atol=0)


def test_scan_moe_aux_loss_matches_loop():
    """MoE + scan_layers must include the load-balancing aux loss
    (regression: aux was silently dropped under scan)."""
    tokens = jnp.asarray(rng.integers(0, 50, (2, 12)))
    gpt_loop = models.GPT(_cfg(moe_experts=4))
    gpt_scan = models.GPT(_cfg(moe_experts=4, scan_layers=True))
    p_loop = gpt_loop.init(jax.random.PRNGKey(0), tokens)
    p_scan = _stack_loop_params(p_loop, 3)
    l_loop = gpt_loop.loss(p_loop, tokens)
    l_scan = gpt_scan.loss(p_scan, tokens)
    assert_allclose(l_scan, l_loop, rtol=1e-5, atol=1e-6)
    # And the aux is nonzero (so the equality above is not vacuous).
    _, aux = gpt_scan.apply(p_scan, tokens, collect_aux=True)
    assert float(aux) > 0.0


def test_remat_rope_explicit_positions():
    """remat=True with rope + explicit per-document positions must match the
    non-remat path (regression: the checkpoint wrapper dropped positions)."""
    tokens = jnp.asarray(rng.integers(0, 50, (2, 12)))
    positions = jnp.asarray(np.tile(np.arange(6), 2))[None, :].repeat(2, 0)
    gpt = models.GPT(_cfg(positional="rope"))
    gpt_r = models.GPT(_cfg(positional="rope", remat=True))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    l1, g1 = jax.value_and_grad(
        lambda p: gpt.loss(p, tokens, positions=positions))(params)
    l2, g2 = jax.value_and_grad(
        lambda p: gpt_r.loss(p, tokens, positions=positions))(params)
    assert_allclose(l2, l1, rtol=1e-6, atol=1e-6)
    assert_trees_allclose(g2, g1, rtol=1e-5, atol=1e-5)
    # Sanity: explicit restarting positions actually change the result.
    assert abs(float(gpt.loss(params, tokens)) - float(l1)) > 1e-6


def test_packed_segment_training():
    """Packed-sequence GPT training: loss masks cross-document targets and
    attention is segment-isolated end to end."""
    cfg = _cfg()
    gpt = models.GPT(cfg)
    # Two documents packed per row.
    tokens = jnp.asarray(rng.integers(0, 50, (2, 12)))
    segs = jnp.asarray(np.broadcast_to(np.repeat([0, 1], 6), (2, 12)))
    positions = jnp.asarray(np.tile(np.arange(6), 2))[None, :].repeat(2, 0)
    params = gpt.init(jax.random.PRNGKey(0), tokens)

    loss = gpt.loss(params, tokens, segment_ids=segs, positions=positions)
    assert np.isfinite(float(loss))

    # Isolation: changing doc 2's tokens must not change doc 1's logits.
    l1 = gpt.apply(params, tokens, segment_ids=segs, positions=positions)
    tokens2 = tokens.at[:, 6:].set((tokens[:, 6:] + 1) % 50)
    l2 = gpt.apply(params, tokens2, segment_ids=segs, positions=positions)
    assert_allclose(l1[:, :6], l2[:, :6], rtol=0, atol=0)

    g = jax.grad(lambda p: gpt.loss(p, tokens, segment_ids=segs,
                                    positions=positions))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_fused_loss_composes_with_scan_remat_bf16():
    """The headline bench config's code path (fused_loss=True composed with
    scan_layers/remat/bf16, bench.py:85): model-level fwd AND grads equal
    the plain (materialized-logits) loss. Oracle pattern of
    /root/reference/layers/mlp_test.py:69-94 at the model level."""
    tokens = jnp.asarray(rng.integers(0, 50, (2, 12)))
    kw = dict(vocab_size=50, d_model=32, num_heads=4, num_layers=3,
              hidden_units=64, max_len=16, scan_layers=True, remat=True,
              dtype=jnp.bfloat16)
    gpt = models.GPT(models.GPTConfig(**kw))
    gpt_f = models.GPT(models.GPTConfig(fused_loss=True, **kw))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    l1, g1 = jax.value_and_grad(lambda p: gpt.loss(p, tokens))(params)
    l2, g2 = jax.value_and_grad(lambda p: gpt_f.loss(p, tokens))(params)
    # bf16 compute; losses/grads are fp32 — the two paths round bf16
    # matmul outputs identically up to the CE reduction order.
    assert_allclose(l2, l1, rtol=2e-3, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g2),
                    jax.tree_util.tree_leaves(g1)):
        assert_allclose(a, b, rtol=5e-3, atol=3e-3)
