"""Ring / gather context-parallel attention vs full attention oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import ops, parallel
from np_modeling_tpu.parallel import context
from np_modeling_tpu.utils.testing import assert_allclose, rand

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")
rng = np.random.default_rng(0)


def _qkv(b=2, h=4, s=64, d=16):
    return (jnp.asarray(rand(b, h, s, d, rng=rng)),
            jnp.asarray(rand(b, h, s, d, rng=rng)),
            jnp.asarray(rand(b, h, s, d, rng=rng)))


@pytest.mark.parametrize("impl", ["ring", "gather"])
@pytest.mark.parametrize("causal", [False, True])
def test_matches_full_attention(impl, causal):
    mesh = parallel.make_mesh({"sp": 8})
    q, k, v = _qkv()
    fn = context.make_context_parallel_attention(mesh, "sp", impl, causal)
    out = jax.jit(fn)(q, k, v)
    ref = ops.attention_reference(q, k, v, causal=causal)
    assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", ["ring", "gather"])
def test_grads_match_oracle(impl):
    mesh = parallel.make_mesh({"sp": 8})
    q, k, v = _qkv(b=1, h=2, s=32, d=8)
    fn = context.make_context_parallel_attention(mesh, "sp", impl,
                                                 causal=True)
    g_ours = jax.jit(jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v) ** 2),
                              argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(
            ops.attention_reference(q, k, v, causal=True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ours, g_ref):
        assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def _full_oracle(q, k, v, causal=False, window=None, segs=None):
    mask = None
    s = q.shape[2]
    if causal:
        qp = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        kp = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        keep = kp <= qp
        if window is not None:
            keep = keep & (kp > qp - window)
        mask = keep[None, None]
    if segs is not None:
        sm = (segs[:, None, :, None] == segs[:, None, None, :])
        mask = sm if mask is None else (mask & sm)
    g = q.shape[1] // k.shape[1]
    kk = jnp.repeat(k, g, axis=1) if g > 1 else k
    vv = jnp.repeat(v, g, axis=1) if g > 1 else v
    return ops.attention_reference(q, kk, vv, mask=mask)


class TestRingV2:
    """Round-3 CP: GQA + window + segments, flash-kernel blocks, 32k."""

    @pytest.mark.parametrize("impl", ["ring", "gather"])
    def test_gqa(self, impl):
        mesh = parallel.make_mesh({"sp": 8})
        q = jnp.asarray(rand(2, 4, 64, 16, rng=rng))
        k = jnp.asarray(rand(2, 2, 64, 16, rng=rng))
        v = jnp.asarray(rand(2, 2, 64, 16, rng=rng))
        fn = context.make_context_parallel_attention(mesh, "sp", impl,
                                                     causal=True)
        out = jax.jit(fn)(q, k, v)
        assert_allclose(out, _full_oracle(q, k, v, causal=True),
                        rtol=2e-5, atol=2e-5)
        g_ours = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.grad(lambda q, k, v: jnp.sum(
            _full_oracle(q, k, v, causal=True) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ours, g_ref):
            assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("impl", ["ring", "gather"])
    def test_window(self, impl):
        mesh = parallel.make_mesh({"sp": 8})
        q, k, v = _qkv(b=1, h=2, s=64, d=8)
        fn = context.make_context_parallel_attention(mesh, "sp", impl,
                                                     causal=True, window=10)
        out = jax.jit(fn)(q, k, v)
        assert_allclose(out, _full_oracle(q, k, v, causal=True, window=10),
                        rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("impl", ["ring", "gather"])
    def test_segments(self, impl):
        mesh = parallel.make_mesh({"sp": 8})
        q, k, v = _qkv(b=2, h=2, s=64, d=8)
        segs = jnp.asarray(np.repeat(np.arange(4), 16)[None].repeat(2, 0))
        fn = context.make_context_parallel_attention(mesh, "sp", impl,
                                                     causal=True)
        out = jax.jit(fn)(q, k, v, segment_ids=segs)
        assert_allclose(out, _full_oracle(q, k, v, causal=True, segs=segs),
                        rtol=2e-5, atol=2e-5)
        g_ours = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v, segment_ids=segs) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.grad(lambda q, k, v: jnp.sum(
            _full_oracle(q, k, v, causal=True, segs=segs) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ours, g_ref):
            assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    def test_ring_uses_flash_kernel_blocks(self):
        """Force the Pallas path (interpret mode): ring == oracle proves the
        per-block flash kernels + LSE merge + two-ring backward."""
        mesh = parallel.make_mesh({"sp": 2}, jax.devices()[:2])
        q, k, v = _qkv(b=1, h=2, s=256, d=16)
        fn = context.make_context_parallel_attention(mesh, "sp", "ring",
                                                     causal=True)
        with ops.dispatch.force_pallas(True, interpret=True):
            out = jax.jit(fn)(q, k, v)
            g = jax.jit(jax.grad(
                lambda q: jnp.sum(fn(q, k, v) ** 2)))(q)
        assert_allclose(out, _full_oracle(q, k, v, causal=True),
                        rtol=2e-3, atol=2e-3)
        g_ref = jax.grad(lambda q: jnp.sum(
            _full_oracle(q, k, v, causal=True) ** 2))(q)
        assert_allclose(g, g_ref, rtol=5e-3, atol=5e-3)

    @pytest.mark.slow
    def test_ring_32k_matches_full(self):
        """VERDICT r3 done-bar: ring == full attention at s=32k on the CPU
        mesh, grads included."""
        mesh = parallel.make_mesh({"sp": 8})
        s = 32768
        q = jnp.asarray(rand(1, 1, s, 8, rng=rng))
        k = jnp.asarray(rand(1, 1, s, 8, rng=rng))
        v = jnp.asarray(rand(1, 1, s, 8, rng=rng))
        fn = context.make_context_parallel_attention(mesh, "sp", "ring",
                                                     causal=True)
        out = jax.jit(fn)(q, k, v)
        ref = ops.attention_reference(q, k, v, causal=True)
        assert_allclose(out, ref, rtol=5e-5, atol=5e-5)
        dq = jax.jit(jax.grad(
            lambda q: jnp.sum(fn(q, k, v) ** 2)))(q)
        dq_ref = jax.grad(lambda q: jnp.sum(
            ops.attention_reference(q, k, v, causal=True) ** 2))(q)
        assert_allclose(dq, dq_ref, rtol=1e-3, atol=1e-3)


def test_gpt_train_step_with_ring_attention():
    """A GPT whose attention core is the shard_map ring (attn_impl hook):
    loss AND grads equal the unsharded model."""
    from np_modeling_tpu import models
    mesh = parallel.make_mesh({"sp": 4}, jax.devices()[:4])
    cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=32)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 50, (2, 17)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)

    gpt.block.attn.attn_impl = context.make_context_parallel_attention(
        mesh, "sp", impl="ring", causal=True)
    try:
        loss_cp, g_cp = jax.jit(jax.value_and_grad(
            lambda p: gpt.loss(p, tokens)))(params)
    finally:
        gpt.block.attn.attn_impl = None
    loss_ref, g_ref = jax.value_and_grad(
        lambda p: gpt.loss(p, tokens))(params)
    assert_allclose(loss_cp, loss_ref, rtol=1e-5, atol=1e-5)
    assert_allclose(g_cp["layer_0"]["self_attention"]["wq"],
                    g_ref["layer_0"]["self_attention"]["wq"],
                    rtol=2e-4, atol=2e-4)
