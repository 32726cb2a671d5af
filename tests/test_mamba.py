"""Mamba (selective SSM) family: training smoke, RNN-mode decode vs the
parallel forward, and HF torch-parity against a local random-weight
``transformers.MambaForCausalLM`` (slow path oracle, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, training
from np_modeling_tpu.utils import hf_compat

rng = np.random.default_rng(17)


def _small_cfg(**kw):
    base = dict(vocab_size=64, d_model=32, num_layers=2, d_state=8,
                d_conv=4, expand=2, dt_rank=4)
    return models.MambaConfig(**{**base, **kw})


def test_shapes_and_training_step():
    cfg = _small_cfg()
    m = models.Mamba(cfg)
    toks = jnp.asarray(rng.integers(0, 64, (4, 20)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), toks)

    logits = m.apply(params, toks)
    assert logits.shape == (4, 20, 64) and logits.dtype == jnp.float32

    opt = training.adam(2e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda q: m.loss(q, toks))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss

    losses = []
    p, s = params, state
    for _ in range(10):
        p, s, l = step(p, s)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses


def test_decode_matches_parallel_forward():
    """RNN-mode step-by-step logits == full parallel-scan forward."""
    cfg = _small_cfg(num_layers=3)
    m = models.Mamba(cfg)
    toks = jnp.asarray(rng.integers(0, 64, (2, 12)), jnp.int32)
    params = m.init(jax.random.PRNGKey(1), toks)

    full = np.asarray(m.apply(params, toks))

    logits7, states = m.prefill(params, toks[:, :7])
    np.testing.assert_allclose(logits7, full[:, 6], rtol=2e-4, atol=2e-4)
    for i in range(7, 12):
        logits, states = m.step(params, toks[:, i], states)
        np.testing.assert_allclose(logits, full[:, i],
                                   rtol=5e-4, atol=5e-4)


def test_generate_greedy_consistency():
    cfg = _small_cfg()
    m = models.Mamba(cfg)
    toks = jnp.asarray(rng.integers(0, 64, (2, 9)), jnp.int32)
    params = m.init(jax.random.PRNGKey(2), toks)

    out = jax.jit(lambda p, t: m.generate(p, t, steps=5))(params, toks)
    assert out.shape == (2, 5)
    # First generated token == argmax of the parallel forward's last pos.
    full = m.apply(params, toks)
    np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                  np.argmax(np.asarray(full[:, -1]), -1))
    # Second: argmax after appending the first.
    ext = jnp.concatenate([toks, out[:, :1]], axis=1)
    full2 = m.apply(params, ext)
    np.testing.assert_array_equal(np.asarray(out[:, 1]),
                                  np.argmax(np.asarray(full2[:, -1]), -1))


def test_tp_sharded_grads_match_single_device():
    """MAMBA_RULES (Megatron-shaped: in_proj columns / out_proj rows on tp,
    the selective scan fully local per d_inner shard): dp2xtp4-sharded
    gradients equal single-device gradients."""
    from np_modeling_tpu import parallel

    cfg = _small_cfg()
    m = models.Mamba(cfg)
    toks = jnp.asarray(rng.integers(0, 64, (4, 16)), jnp.int32)
    params = m.init(jax.random.PRNGKey(5), toks)

    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    ps = parallel.shard_params(params, mesh, parallel.MAMBA_RULES)
    specs = parallel.partition_specs(params, parallel.MAMBA_RULES, mesh)
    mix = specs["layer_0"]["mixer"]
    for name in ("A_log", "D", "conv_w", "conv_b"):
        assert "tp" in str(mix[name]), (name, mix[name])
    assert "tp" in str(mix["in_proj"]["w"])
    assert "tp" in str(mix["out_proj"]["w"])
    ts = parallel.shard_batch(toks, mesh)

    grad_fn = jax.jit(jax.grad(lambda p, t: m.loss(p, t)))
    g_single = grad_fn(params, toks)
    g_shard = grad_fn(ps, ts)
    for name in ("in_proj", "x_proj", "dt_proj", "out_proj"):
        np.testing.assert_allclose(
            np.asarray(g_shard["layer_0"]["mixer"][name]["w"]),
            np.asarray(g_single["layer_0"]["mixer"][name]["w"]),
            rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_shard["layer_1"]["mixer"]["A_log"]),
        np.asarray(g_single["layer_1"]["mixer"]["A_log"]),
        rtol=1e-4, atol=1e-5)


class TestHFParity:
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    def _tiny(self, seed=0):
        cfg = self.transformers.MambaConfig(
            vocab_size=64, hidden_size=32, state_size=8,
            num_hidden_layers=2, conv_kernel=4, expand=2, time_step_rank=4,
            use_cache=False)
        self.torch.manual_seed(seed)
        m = self.transformers.MambaForCausalLM(cfg)
        m.eval()
        return m

    def test_logits_match_torch(self):
        torch = self.torch
        hf = self._tiny()
        cfg, params = hf_compat.import_mamba(hf)
        assert cfg.d_inner == 64 and cfg.rank == 4
        m = models.Mamba(cfg)
        toks = rng.integers(0, 64, (2, 11))
        with torch.no_grad():
            want = hf(torch.from_numpy(toks)).logits.numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(m.apply(params, jnp.asarray(toks, jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_auto_dt_rank(self):
        cfg = self.transformers.MambaConfig(
            vocab_size=32, hidden_size=32, state_size=4,
            num_hidden_layers=1, conv_kernel=4, expand=2,
            time_step_rank="auto", use_cache=False)
        self.torch.manual_seed(1)
        hf = self.transformers.MambaForCausalLM(cfg)
        hf.eval()
        icfg, params = hf_compat.import_mamba(hf)
        assert icfg.rank == 2
        m = models.Mamba(icfg)
        toks = rng.integers(0, 32, (1, 6))
        with self.torch.no_grad():
            want = hf(self.torch.from_numpy(toks)).logits.numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(m.apply(params, jnp.asarray(toks, jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_generate_matches_torch_greedy(self):
        torch = self.torch
        hf = self._tiny(seed=2)
        cfg, params = hf_compat.import_mamba(hf)
        m = models.Mamba(cfg)
        toks = rng.integers(0, 64, (1, 8))
        with torch.no_grad():
            want = hf.generate(torch.from_numpy(toks), max_new_tokens=5,
                               do_sample=False).numpy()[:, 8:]
        with jax.default_matmul_precision("highest"):
            got = np.asarray(m.generate(
                params, jnp.asarray(toks, jnp.int32), steps=5))
        np.testing.assert_array_equal(got, want)
