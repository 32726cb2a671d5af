"""Adversarial feature combinations — interactions the per-feature tests
don't cover (causal+GQA+segments+padding in one kernel call; ragged pages;
rope+int8+GQA serving)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models, ops
from np_modeling_tpu.ops import dispatch
from np_modeling_tpu.serving import GenerationEngine
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(7)


def test_flash_kernel_causal_gqa_segments_padded():
    # Everything at once: causal + GQA (4:2) + packed segments + non-tile seq.
    b, hq, hkv, s, d = 2, 4, 2, 200, 64
    q = jnp.asarray(rand(b, hq, s, d, rng=rng))
    k = jnp.asarray(rand(b, hkv, s, d, rng=rng))
    v = jnp.asarray(rand(b, hkv, s, d, rng=rng))
    segs = jnp.asarray(rng.integers(0, 3, (b, s)).cumsum(axis=1) // 50)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    kernel_fn = lambda q, k, v: ops.flash_attention(
        q, k, v, segment_ids=(segs, segs), causal=True,
        block_q=128, block_kv=128)
    mask = segs[:, None, :, None] == segs[:, None, None, :]
    oracle_fn = lambda q, k, v: ops.attention_reference(
        q, k, v, mask=mask, causal=True)

    with dispatch.force_pallas(True, interpret=True):
        out = kernel_fn(q, k, v)
        g_ours = jax.grad(loss(kernel_fn), argnums=(0, 1, 2))(q, k, v)
    assert_allclose(out, oracle_fn(q, k, v), rtol=2e-5, atol=2e-5)
    g_ref = jax.grad(loss(oracle_fn), argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g_ours, g_ref):
        assert_allclose(a, bb, rtol=2e-5, atol=5e-5)


@pytest.mark.parametrize("pps", [3, 5, 9])
def test_paged_attention_ragged_page_counts(pps):
    # pages_per_seq not divisible by pages_per_block exercises table padding.
    b, hq, hkv, d, psize = 2, 4, 2, 16, 8
    total = b * pps + 2
    q = jnp.asarray(rand(b, hq, d, rng=rng))
    kp = jnp.asarray(rand(hkv, total, psize, d, rng=rng))
    vp = jnp.asarray(rand(hkv, total, psize, d, rng=rng))
    pi = jnp.asarray(rng.permutation(total)[:b * pps]
                     .reshape(b, pps).astype(np.int32))
    lengths = jnp.asarray(rng.integers(1, pps * psize + 1, b).astype(np.int32))
    with dispatch.force_pallas(True, interpret=True):
        out = ops.paged_attention(q, kp, vp, lengths, pi, pages_per_block=4)
    ref = ops.paged_attention_reference(q, kp, vp, lengths, pi)
    assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_engine_rope_gqa_int8_matches_dense():
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_kv_heads=2, num_layers=2, hidden_units=64,
                           max_len=64, positional="rope")
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    prompt = jnp.asarray(rng.integers(0, 64, (1, 6)))
    dense = np.asarray(gpt.generate(params, prompt, steps=4))[0]

    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           quantize_kv=True)
    toks = [eng.add_request(0, prompt[0])]
    for _ in range(3):
        toks.append(eng.step()[0])
    # int8 KV: token-exact agreement isn't guaranteed, but greedy decode is
    # robust to small perturbations at these scales in practice.
    np.testing.assert_array_equal(np.asarray(toks), dense)


def test_bf16_gqa_rope_packed_training():
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_kv_heads=2, num_layers=2, hidden_units=64,
                           max_len=24, positional="rope",
                           dtype=jnp.bfloat16, drop_rate=0.1)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, 64, (2, 16)))
    segs = jnp.asarray(np.broadcast_to(np.repeat([0, 1], 8), (2, 16)))
    pos = jnp.asarray(np.broadcast_to(np.tile(np.arange(8), 2), (2, 16)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    loss, grads = jax.value_and_grad(
        lambda p: gpt.loss(p, tokens, training=True,
                           rngs={"dropout": jax.random.PRNGKey(1)},
                           segment_ids=segs, positions=pos))(params)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert g.dtype == jnp.float32
        assert np.isfinite(np.asarray(g)).all()


def test_full_feature_gpt_grads_match_finite_differences():
    """Integration-grade gradient defense: the end-to-end loss gradient of
    a GPT with rms+swiglu+rope+GQA+window+packed-segments (every manual
    VJP in one graph) matches a central finite difference along a random
    direction."""
    cfg = models.GPTConfig(vocab_size=31, d_model=16, num_heads=4,
                           num_kv_heads=2, num_layers=2, hidden_units=32,
                           max_len=32, positional="rope", norm="rms",
                           ffn="swiglu", use_bias=False,
                           tie_embeddings=False, attention_window=6)
    gpt = models.GPT(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0, 31)
    segs = jnp.asarray([[0] * 6 + [1] * 6, [0] * 4 + [1] * 8], jnp.int32)
    params = gpt.init(jax.random.PRNGKey(1), toks)

    def loss(p):
        return gpt.loss(p, toks, segment_ids=segs)

    grads = jax.jit(jax.grad(loss))(params)
    direction = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(hash(x.shape) % 997),
                                    x.shape), params)
    eps = 1e-3
    plus = jax.tree_util.tree_map(lambda p, d: p + eps * d, params,
                                  direction)
    minus = jax.tree_util.tree_map(lambda p, d: p - eps * d, params,
                                   direction)
    fd = (float(loss(plus)) - float(loss(minus))) / (2 * eps)
    ad = float(sum(jnp.vdot(g, d) for g, d in zip(
        jax.tree_util.tree_leaves(grads),
        jax.tree_util.tree_leaves(direction))))
    assert abs(fd - ad) < 3e-3 * max(1.0, abs(ad)), (fd, ad)
