"""Mamba-2 (SSD) family: chunked-scan op vs sequential oracle, RNN-mode
decode vs the parallel forward, training, and HF torch parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, ops, training
from np_modeling_tpu.utils import hf_compat

rng = np.random.default_rng(23)


def _small_cfg(**kw):
    base = dict(vocab_size=64, d_model=32, num_layers=2, d_state=8,
                d_conv=4, expand=2, head_dim=8, n_groups=2, chunk_size=8)
    return models.Mamba2Config(**{**base, **kw})


# ---- ops.ssd vs an independent sequential-scan oracle ---------------------


def _ssd_oracle(x, dt, A, B, C):
    """Per-token lax.scan of the raw recurrence (independent of ops.ssd's
    chunked decomposition AND of selective_scan)."""
    b, L, h, p = x.shape
    g = B.shape[2]
    Bh = jnp.repeat(B, h // g, axis=2)
    Ch = jnp.repeat(C, h // g, axis=2)

    def step(s, t):
        xt, dtt, Bt, Ct = t
        da = jnp.exp(dtt * A)
        s = (da[:, :, None, None] * s
             + (dtt[..., None] * xt)[..., None] * Bt[:, :, None, :])
        return s, jnp.einsum("bhpn,bhn->bhp", s, Ct)

    s0 = jnp.zeros((b, h, p, B.shape[-1]))
    sT, ys = jax.lax.scan(step, s0,
                          (jnp.moveaxis(x, 1, 0), jnp.moveaxis(dt, 1, 0),
                           jnp.moveaxis(Bh, 1, 0), jnp.moveaxis(Ch, 1, 0)))
    return jnp.moveaxis(ys, 0, 1), sT


def _ssd_inputs(b=2, L=13, h=4, p=8, g=2, n=5):
    x = jnp.asarray(rng.normal(size=(b, L, h, p)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.01, 0.3, (b, L, h)).astype(np.float32))
    A = jnp.asarray(-rng.uniform(0.5, 2.0, (h,)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(b, L, g, n)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(b, L, g, n)).astype(np.float32))
    return x, dt, A, B, C


@pytest.mark.parametrize("chunk", [4, 5, 13, 16])
def test_ssd_matches_sequential_oracle(chunk):
    """Chunked SSD == per-token recurrence, final state included — across
    dividing, non-dividing, exact, and longer-than-L chunk sizes."""
    x, dt, A, B, C = _ssd_inputs()
    y, fs = ops.ssd(x, dt, A, B, C, chunk_size=chunk,
                    return_final_state=True)
    yo, fo = _ssd_oracle(x, dt, A, B, C)
    np.testing.assert_allclose(y, yo, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(fs, fo, rtol=2e-5, atol=2e-5)


def test_ssd_grads_match_oracle():
    """jax.grad through the chunked form (manual-VJP inter-chunk scan)
    == jax.grad of the independent sequential oracle, all five inputs."""
    x, dt, A, B, C = _ssd_inputs()
    loss = lambda *a: jnp.sum(jnp.sin(ops.ssd(*a, chunk_size=4)))
    loss_o = lambda *a: jnp.sum(jnp.sin(_ssd_oracle(*a)[0]))
    gs = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, dt, A, B, C)
    go = jax.grad(loss_o, argnums=(0, 1, 2, 3, 4))(x, dt, A, B, C)
    for a_, b_ in zip(gs, go):
        np.testing.assert_allclose(a_, b_, rtol=5e-4, atol=1e-5)


def test_ssd_step_matches_scan():
    x, dt, A, B, C = _ssd_inputs(L=6)
    yo, so = _ssd_oracle(x, dt, A, B, C)
    s = jnp.zeros_like(so)
    for t in range(6):
        y, s = ops.ssd_step(s, x[:, t], dt[:, t], A, B[:, t], C[:, t])
        np.testing.assert_allclose(y, yo[:, t], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s, so, rtol=1e-5, atol=1e-6)


# ---- model -----------------------------------------------------------------


def test_shapes_and_training_step():
    cfg = _small_cfg()
    m = models.Mamba2(cfg)
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
    """RNN-mode step-by-step logits == full chunked-SSD forward (prefill
    length NOT a chunk multiple — exercises the padding handoff)."""
    cfg = _small_cfg(num_layers=3)
    m = models.Mamba2(cfg)
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
    m = models.Mamba2(cfg)
    toks = jnp.asarray(rng.integers(0, 64, (2, 9)), jnp.int32)
    params = m.init(jax.random.PRNGKey(2), toks)

    out = jax.jit(lambda p, t: m.generate(p, t, steps=5))(params, toks)
    assert out.shape == (2, 5)
    full = m.apply(params, toks)
    np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                  np.argmax(np.asarray(full[:, -1]), -1))
    ext = jnp.concatenate([toks, out[:, :1]], axis=1)
    full2 = m.apply(params, ext)
    np.testing.assert_array_equal(np.asarray(out[:, 1]),
                                  np.argmax(np.asarray(full2[:, -1]), -1))


class TestHFParity:
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    def _tiny(self, seed=0, **kw):
        cfg = self.transformers.Mamba2Config(
            vocab_size=64, hidden_size=32, state_size=8,
            num_hidden_layers=2, conv_kernel=4, expand=2, head_dim=8,
            n_groups=2, num_heads=8, chunk_size=8, use_cache=False, **kw)
        self.torch.manual_seed(seed)
        hf = self.transformers.Mamba2ForCausalLM(cfg)
        hf.eval()
        return hf

    def test_logits_match_torch(self):
        hf = self._tiny()
        cfg, params = hf_compat.import_mamba2(hf)
        assert cfg.num_heads == 8 and cfg.chunk_size == 8
        m = models.Mamba2(cfg)
        toks = rng.integers(0, 64, (2, 11))      # not a chunk multiple
        with self.torch.no_grad():
            want = hf(self.torch.from_numpy(toks)).logits.numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(m.apply(params, jnp.asarray(toks, jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_generate_matches_torch_greedy(self):
        torch = self.torch
        hf = self._tiny(seed=2)
        cfg, params = hf_compat.import_mamba2(hf)
        m = models.Mamba2(cfg)
        toks = rng.integers(0, 64, (1, 9))
        with torch.no_grad():
            want = hf.generate(torch.from_numpy(toks), max_new_tokens=5,
                               do_sample=False).numpy()[:, 9:]
        with jax.default_matmul_precision("highest"):
            got = np.asarray(m.generate(
                params, jnp.asarray(toks, jnp.int32), steps=5))
        np.testing.assert_array_equal(got, want)
