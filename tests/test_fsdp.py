"""FSDP (ZeRO-3 param sharding) on the 8-virtual-CPU mesh: numerically
equivalent to single-device training, params actually sharded, composes
with tp and ZeRO-1 (the reference has no distributed code — SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from np_modeling_tpu import models, parallel, training
from np_modeling_tpu.utils.testing import assert_allclose

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

rng = np.random.default_rng(7)


def _gpt(batch=8):
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=32)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 64, (batch, 16)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    return gpt, tokens, params


def _make_step(gpt, opt):
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(lambda p: gpt.loss(p, tokens))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return training.apply_updates(params, updates), opt_state, loss
    return jax.jit(step)


@pytest.mark.parametrize("axes", [
    {"fsdp": 8},
    {"dp": 2, "fsdp": 4},
    {"dp": 2, "fsdp": 2, "tp": 2},
])
def test_fsdp_training_matches_single_device(axes):
    gpt, tokens, params0 = _gpt()
    opt = training.adam(1e-2)
    step = _make_step(gpt, opt)

    p, s = params0, opt.init(params0)
    losses_single = []
    for _ in range(3):
        p, s, l = step(p, s, tokens)
        losses_single.append(l)

    mesh = parallel.make_mesh(axes)
    ps = parallel.fsdp_params(params0, mesh, min_size=256)
    ts = parallel.shard_batch(tokens, mesh)
    p2, s2 = ps, opt.init(ps)
    losses_shard = []
    for _ in range(3):
        p2, s2, l = step(p2, s2, ts)
        losses_shard.append(l)

    assert_allclose(losses_shard[0], losses_single[0], rtol=1e-5, atol=1e-5)
    assert_allclose(losses_shard[-1], losses_single[-1], rtol=5e-3, atol=5e-3)

    # Updated params (gathered) match single-device at step-1 tolerance.
    assert_allclose(jax.device_get(p2["layer_0"]["self_attention"]["wq"]),
                    jax.device_get(p["layer_0"]["self_attention"]["wq"]),
                    rtol=5e-3, atol=5e-3)

    # Grad equivalence at the same point.
    grad_fn = jax.jit(jax.grad(lambda p, t: gpt.loss(p, t)))
    g_single = grad_fn(params0, tokens)
    g_shard = grad_fn(ps, ts)
    assert_allclose(g_shard["layer_0"]["self_attention"]["wq"],
                    g_single["layer_0"]["self_attention"]["wq"],
                    rtol=1e-4, atol=1e-5)


def test_fsdp_params_are_stored_sharded():
    """Each large param's per-device shard is 1/8 of the array; grads and
    Adam moments inherit the layout (the ZeRO-3 memory claim)."""
    gpt, tokens, params0 = _gpt()
    mesh = parallel.make_mesh({"fsdp": 8})
    ps = parallel.fsdp_params(params0, mesh, min_size=256)

    w = ps["layer_0"]["self_attention"]["wq"]
    assert w.sharding.is_fully_replicated is False
    shard = w.addressable_shards[0].data
    assert shard.size == w.size // 8, (shard.shape, w.shape)

    # Grads: jit propagates the param layout with no annotation.
    g = jax.jit(jax.grad(lambda p: gpt.loss(p, parallel.shard_batch(
        tokens, mesh))))(ps)
    gw = g["layer_0"]["self_attention"]["wq"]
    assert gw.addressable_shards[0].data.size == gw.size // 8

    # Adam moments: a bare jitted init REPLICATES them (zeros_like has no
    # data dependence for GSPMD to propagate) — fsdp_opt_init pins them.
    state = parallel.fsdp_opt_init(training.adam(1e-3), ps, mesh,
                                   min_size=256)
    mu = state.mu["layer_0"]["self_attention"]["wq"]
    assert mu.addressable_shards[0].data.size == mu.size // 8

    # Small leaves (biases, norms) stay replicated: no collective churn.
    ln = ps["layer_0"]["norm1"]["gamma"]
    assert ln.sharding.is_fully_replicated


def test_fsdp_specs_respect_tp_layout():
    """With tp in the mesh, fsdp lands on a dim the tp rules left
    replicated — never double-shards a dim."""
    _, _, params0 = _gpt()
    mesh = parallel.make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    specs = parallel.fsdp_specs(params0, mesh, min_size=256)
    # wq [d_model, heads, head_dim]: tp rule puts heads on tp; fsdp takes
    # the first replicated divisible dim (d_model).
    assert specs["layer_0"]["self_attention"]["wq"] == P("fsdp", "tp", None)
    # dense1 w [d_model, hidden]: columns on tp -> fsdp on rows.
    assert specs["layer_0"]["dense1"]["linear"]["w"] == P("fsdp", "tp")
    # Tiny bias: untouched.
    assert specs["layer_0"]["self_attention"]["bo"] == P()


def test_fsdp_composes_with_zero1():
    """FSDP params + ZeRO-1 moments: the moment inherits the param's fsdp
    spec (longest-suffix match) and dp lands on another dim if divisible."""
    gpt, tokens, params0 = _gpt()
    mesh = parallel.make_mesh({"dp": 2, "fsdp": 4})
    specs = parallel.fsdp_specs(params0, mesh, min_size=256)
    ps = parallel.fsdp_params(params0, mesh, min_size=256)
    opt = training.adam(1e-2)
    state = parallel.zero1_init(opt, ps, mesh, axis="dp", min_size=256,
                                param_specs=specs)
    mu = state.mu["layer_0"]["self_attention"]["wq"]   # [32, 4, 8]
    assert mu.addressable_shards[0].data.size <= mu.size // 4

    step = _make_step(gpt, opt)
    ts = parallel.shard_batch(tokens, mesh)
    p2, s2, loss = step(ps, state, ts)
    jax.block_until_ready(loss)
    assert jnp.isfinite(loss)


@pytest.mark.parametrize("flavor", ["mla", "gemma2"])
def test_fsdp_composes_with_new_architectures(flavor):
    """FSDP sharding is architecture-agnostic: MLA's low-rank projections
    and Gemma-2-style blocks (softcap, sandwich norms, window twins)
    train under an fsdp mesh with grads equal to single-device."""
    if flavor == "mla":
        cfg = models.GPTConfig(
            vocab_size=64, d_model=32, num_heads=4, num_layers=2,
            hidden_units=48, max_len=32, positional="rope", norm="rms",
            ffn="swiglu", use_bias=False, tie_embeddings=False,
            mla=dict(kv_lora_rank=16, q_lora_rank=24, qk_nope_head_dim=8,
                     qk_rope_head_dim=4, v_head_dim=8))
    else:
        cfg = models.GPTConfig(
            vocab_size=64, d_model=32, num_heads=4, num_layers=2,
            hidden_units=48, max_len=32, positional="rope", norm="rms",
            ffn="geglu", use_bias=False, rms_offset=True, embed_scale=True,
            sandwich_norm=True, attention_window=8, window_pattern=2,
            attn_logit_softcap=30.0, final_logit_softcap=20.0,
            query_pre_attn_scalar=16.0, tie_embeddings=False)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 64, (8, 16)))
    params0 = gpt.init(jax.random.PRNGKey(11), tokens)

    grad_fn = jax.jit(jax.grad(lambda p, t: gpt.loss(p, t)))
    g_single = grad_fn(params0, tokens)

    mesh = parallel.make_mesh({"dp": 2, "fsdp": 4})
    ps = parallel.fsdp_params(params0, mesh, min_size=256)
    ts = parallel.shard_batch(tokens, mesh)
    g_shard = grad_fn(ps, ts)

    leaves_s, _ = jax.tree_util.tree_flatten(g_single)
    leaves_p, _ = jax.tree_util.tree_flatten(g_shard)
    for a, b in zip(leaves_p, leaves_s):
        assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    # Something big actually got sharded.
    big = ps["embedding"]["table"]
    assert not big.sharding.is_fully_replicated


def test_fsdp_tp_with_fused_loss_matches_single_device():
    """fused_loss under a dp x fsdp x tp mesh (the headline bench config's
    loss path, bench.py:85, composed with sharding — VERDICT r3 #2)."""
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=32,
                           fused_loss=True)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 64, (8, 16)))
    params0 = gpt.init(jax.random.PRNGKey(3), tokens)
    opt = training.adam(1e-2)
    step = _make_step(gpt, opt)

    p, s = params0, opt.init(params0)
    losses_single = []
    for _ in range(3):
        p, s, l = step(p, s, tokens)
        losses_single.append(float(l))

    mesh = parallel.make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    ps = parallel.fsdp_params(params0, mesh, min_size=256)
    ts = parallel.shard_batch(tokens, mesh)
    p2, s2 = ps, opt.init(ps)
    for i in range(3):
        p2, s2, l = step(p2, s2, ts)
        assert abs(float(l) - losses_single[i]) < 1e-4, (i, l,
                                                         losses_single[i])
    assert not ps["embedding"]["table"].sharding.is_fully_replicated
