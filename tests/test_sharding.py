"""Multi-device sharding on the 8-virtual-CPU mesh: sharded training must be
numerically equivalent to single-device training (the TPU-native analogue of
the reference's missing distributed tests — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models, parallel, training
from np_modeling_tpu.parallel.sharding import TRANSFORMER_RULES
from np_modeling_tpu.utils.testing import assert_allclose

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

rng = np.random.default_rng(0)


def _gpt():
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=32)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 64, (4, 16)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    return gpt, tokens, params


def _make_step(gpt, opt):
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(lambda p: gpt.loss(p, tokens))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return training.apply_updates(params, updates), opt_state, loss
    return jax.jit(step)


@pytest.mark.parametrize("axes", [
    {"dp": 8},
    {"dp": 2, "tp": 4},
    {"dp": 2, "sp": 2, "tp": 2},
])
def test_sharded_training_matches_single_device(axes):
    gpt, tokens, params0 = _gpt()
    opt = training.adam(1e-2)
    step = _make_step(gpt, opt)

    # Single device baseline: 3 steps.
    p, s = params0, opt.init(params0)
    losses_single = []
    for _ in range(3):
        p, s, l = step(p, s, tokens)
        losses_single.append(l)

    # Sharded: same math, dp/sp/tp mesh.
    mesh = parallel.make_mesh(axes)
    ps = parallel.shard_params(params0, mesh, TRANSFORMER_RULES)
    ts = parallel.shard_batch(tokens, mesh)
    p2, s2 = ps, opt.init(ps)
    losses_shard = []
    for _ in range(3):
        p2, s2, l = step(p2, s2, ts)
        losses_shard.append(l)

    # Step 1 is the pure-math check; later steps accumulate fp reassociation
    # differences from the collective reduction order, which Adam's
    # scale-free m̂/√v̂ normalization amplifies for near-zero grads.
    assert_allclose(losses_shard[0], losses_single[0], rtol=1e-5, atol=1e-5)
    assert_allclose(losses_shard[-1], losses_single[-1], rtol=5e-3, atol=5e-3)

    # The rigorous equivalence check: gradients at the same point.
    grad_fn = jax.jit(jax.grad(lambda p, t: gpt.loss(p, t)))
    g_single = grad_fn(params0, tokens)
    g_shard = grad_fn(ps, ts)
    assert_allclose(g_shard["layer_0"]["self_attention"]["wq"],
                    g_single["layer_0"]["self_attention"]["wq"],
                    rtol=1e-4, atol=1e-5)
    assert_allclose(g_shard["embedding"]["table"],
                    g_single["embedding"]["table"], rtol=1e-4, atol=1e-5)


def test_param_specs_respect_divisibility():
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    gpt, tokens, params = _gpt()   # num_heads=4 divides tp=4
    specs = parallel.partition_specs(params, TRANSFORMER_RULES, mesh)
    wq_spec = specs["layer_0"]["self_attention"]["wq"]
    assert tuple(wq_spec) == (None, "tp", None)
    # gamma is replicated (no rule matches).
    assert tuple(specs["layer_0"]["norm1"]["gamma"]) == ()


def test_mesh_factorizations():
    assert parallel.auto_mesh(8).devices.shape == (2, 2, 2)
    assert parallel.auto_mesh(4).devices.shape == (2, 1, 2)
    assert dict(zip(parallel.auto_mesh(8).axis_names, (2, 2, 2))) == {
        "dp": 2, "sp": 2, "tp": 2}


class TestShardedCheckpoint:
    """Sharded save/restore: placement preserved, no host replication path,
    resharding on restore, and exact train-resume equivalence."""

    def _sharded_gpt(self):
        from np_modeling_tpu import models, training
        from np_modeling_tpu.parallel.sharding import TRANSFORMER_RULES
        cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                               num_layers=2, hidden_units=32, max_len=16)
        gpt = models.GPT(cfg)
        tokens = jnp.asarray(np.random.default_rng(0).integers(0, 64, (4, 12)))
        mesh = parallel.make_mesh({"dp": 4, "tp": 2})
        params = gpt.init(jax.random.PRNGKey(0), tokens)
        params = parallel.shard_params(params, mesh, TRANSFORMER_RULES)
        return gpt, mesh, params, parallel.shard_batch(tokens, mesh)

    def test_roundtrip_preserves_sharding(self, tmp_path):
        from np_modeling_tpu import training
        gpt, mesh, params, tokens = self._sharded_gpt()
        training.save_checkpoint_sharded(str(tmp_path / "ckpt"), params)
        restored = training.load_checkpoint_sharded(str(tmp_path / "ckpt"),
                                                    params)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert a.sharding == b.sharding

    def test_restore_onto_different_sharding(self, tmp_path):
        from np_modeling_tpu import training
        from jax.sharding import NamedSharding, PartitionSpec as P
        gpt, mesh, params, tokens = self._sharded_gpt()
        training.save_checkpoint_sharded(str(tmp_path / "ckpt"), params)
        # Template: everything replicated (a different placement).
        repl = jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.zeros_like(a),
                                     NamedSharding(mesh, P())), params)
        restored = training.load_checkpoint_sharded(str(tmp_path / "ckpt"),
                                                    repl)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert b.sharding.is_fully_replicated

    def test_train_save_restore_train_equivalence(self, tmp_path):
        from np_modeling_tpu import training
        gpt, mesh, params, tokens = self._sharded_gpt()
        opt = training.adam(1e-3)
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            loss, g = jax.value_and_grad(lambda p: gpt.loss(p, tokens))(p)
            u, s = opt.update(g, s, p)
            return training.apply_updates(p, u), s, loss

        for _ in range(3):
            params, state, _ = step(params, state)
        training.save_checkpoint_sharded(str(tmp_path / "ck"),
                                         {"params": params, "opt": state})
        # Continue WITHOUT restore -> reference trajectory.
        p_ref, s_ref = params, state
        ref_losses = []
        for _ in range(3):
            p_ref, s_ref, l = step(p_ref, s_ref)
            ref_losses.append(float(l))
        # Restore and continue -> must be IDENTICAL (bitwise).
        ck = training.load_checkpoint_sharded(
            str(tmp_path / "ck"), {"params": params, "opt": state})
        p2, s2 = ck["params"], ck["opt"]
        res_losses = []
        for _ in range(3):
            p2, s2, l = step(p2, s2)
            res_losses.append(float(l))
        assert res_losses == ref_losses
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_llama_style_sharded_grads_match_single_device():
    """SwiGLU/RMSNorm/no-bias/RoPE/GQA GPT: TP-sharded gradients (incl. the
    swiglu rules) equal single-device gradients."""
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_kv_heads=2, num_layers=2, hidden_units=64,
                           max_len=32, positional="rope", norm="rms",
                           ffn="swiglu", use_bias=False,
                           tie_embeddings=False)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 64, (4, 16)))
    params = gpt.init(jax.random.PRNGKey(3), tokens)

    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    ps = parallel.shard_params(params, mesh, TRANSFORMER_RULES)
    # The swiglu weights must actually be tp-sharded (not replicated).
    specs = parallel.partition_specs(params, TRANSFORMER_RULES, mesh)
    sg = specs["layer_0"]["swiglu"]
    assert "tp" in str(sg["w_gate"]) and "tp" in str(sg["w_down"])
    ts = parallel.shard_batch(tokens, mesh)

    grad_fn = jax.jit(jax.grad(lambda p, t: gpt.loss(p, t)))
    g_single = grad_fn(params, tokens)
    g_shard = grad_fn(ps, ts)
    assert_allclose(g_shard["layer_0"]["swiglu"]["w_gate"],
                    g_single["layer_0"]["swiglu"]["w_gate"],
                    rtol=1e-4, atol=1e-5)
    assert_allclose(g_shard["layer_0"]["self_attention"]["wq"],
                    g_single["layer_0"]["self_attention"]["wq"],
                    rtol=1e-4, atol=1e-5)


class TestCheckpointStaleManifests:
    """Re-saving into a used directory must not mix checkpoint generations
    (VERDICT r3 review finding)."""

    def test_single_process_resave_removes_stale_part_manifests(self,
                                                                tmp_path):
        from np_modeling_tpu import training
        from flax import serialization
        d = tmp_path / "ckpt"
        d.mkdir()
        # Simulate debris from an earlier multi-process save: a per-host
        # manifest that a later single-process save must remove (else a
        # loader that sees no manifest.msgpack would union stale shards).
        stale = d / "manifest.p00001.msgpack"
        stale.write_bytes(serialization.msgpack_serialize(
            {"__num_processes__": 2}))
        tree = {"w": jnp.arange(6.0).reshape(2, 3)}
        training.save_checkpoint_sharded(str(d), tree)
        assert not stale.exists()
        out = training.load_checkpoint_sharded(
            str(d), {"w": jnp.zeros((2, 3))})
        np.testing.assert_array_equal(np.asarray(out["w"]),
                                      np.arange(6.0).reshape(2, 3))

    def test_loader_rejects_mixed_generation_manifests(self, tmp_path):
        from np_modeling_tpu import training
        from flax import serialization
        d = tmp_path / "ckpt"
        d.mkdir()
        # Two per-host manifests claiming different process counts: a
        # 4-process save partially overwritten by a 2-process one.
        (d / "manifest.p00000.msgpack").write_bytes(
            serialization.msgpack_serialize({"__num_processes__": 2}))
        (d / "manifest.p00001.msgpack").write_bytes(
            serialization.msgpack_serialize({"__num_processes__": 4}))
        with pytest.raises(RuntimeError, match="different saves"):
            training.load_checkpoint_sharded(str(d), {"w": jnp.zeros(2)})


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestZero1:
    """ZeRO-1 optimizer-state sharding over dp: per-device moment memory
    drops to 1/N while the train step stays numerically identical."""

    def _setup(self):
        from np_modeling_tpu import models, training
        cfg = models.GPTConfig(vocab_size=64, d_model=64, num_heads=4,
                               num_layers=2, hidden_units=128, max_len=16)
        gpt = models.GPT(cfg)
        toks = jnp.asarray(
            np.random.default_rng(0).integers(0, 64, (8, 12)))
        params = gpt.init(jax.random.PRNGKey(0), toks)
        opt = training.adam(1e-2)
        return gpt, toks, params, opt

    def test_state_is_sharded_and_step_matches(self):
        from np_modeling_tpu import parallel, training
        gpt, toks, params, opt = self._setup()
        mesh = parallel.make_mesh({"dp": 8})

        ref_state = opt.init(params)
        state = parallel.zero1_init(opt, params, mesh, axis="dp",
                                    min_size=1024)

        # Moments big enough to shard are actually 1/8 per device.
        big = state.mu["embedding"]["table"]             # [64, 64] = 4096
        assert tuple(big.sharding.spec)[0] == "dp"
        shard = big.addressable_shards[0].data
        assert shard.shape[0] == big.shape[0] // 8
        # Scalar step count stays replicated.
        count = state.count
        assert count.sharding.spec == jax.sharding.PartitionSpec()

        def step(p, s):
            loss, g = jax.value_and_grad(lambda p: gpt.loss(p, toks))(p)
            u, s = opt.update(g, s, p)
            return training.apply_updates(p, u), s, loss

        jstep = jax.jit(step)
        p1, s1 = params, ref_state
        p2, s2 = params, state
        for _ in range(5):
            p1, s1, l1 = jstep(p1, s1)
            p2, s2, l2 = jstep(p2, s2)
            # The two layouts compile to different reduction orders;
            # trajectories must agree to fp-reassociation noise.
            assert_allclose(l2, l1, rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p2),
                        jax.tree_util.tree_leaves(p1)):
            assert_allclose(a, b, rtol=1e-2, atol=1e-3)
        # The state keeps its ZeRO layout across steps.
        assert tuple(
            s2.mu["embedding"]["table"].sharding.spec)[0] == "dp"

    def test_small_leaves_stay_replicated(self):
        from np_modeling_tpu import parallel
        gpt, toks, params, opt = self._setup()
        mesh = parallel.make_mesh({"dp": 8})
        state = parallel.zero1_init(opt, params, mesh, axis="dp",
                                    min_size=1 << 30)
        for leaf in jax.tree_util.tree_leaves(state):
            assert leaf.sharding.spec == jax.sharding.PartitionSpec()

    def test_composes_with_tp(self):
        """On a dp x tp mesh, moments keep the param's tp layout AND gain
        dp on a still-replicated dim."""
        from np_modeling_tpu import parallel
        gpt, toks, params, opt = self._setup()
        mesh = parallel.make_mesh({"dp": 4, "tp": 2})
        params = parallel.shard_params(params, mesh, TRANSFORMER_RULES)
        specs = parallel.partition_specs(params, TRANSFORMER_RULES, mesh)
        state = parallel.zero1_init(opt, params, mesh, axis="dp",
                                    min_size=1024, param_specs=specs)
        # wq moment [d, heads, dk]: tp on heads (from the param rules)
        # + dp on the first replicated dim.
        spec = state.mu["layer_0"]["self_attention"]["wq"].sharding.spec
        assert "tp" in spec and "dp" in spec, spec
