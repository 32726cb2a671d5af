"""MLA (multi-head latent attention, DeepSeek-V2): manual-oracle parity,
absorbed-latent decode equality, Pallas path, gradients, GPT integration."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, ops, training
from np_modeling_tpu.nn.mla import MLAttention
from np_modeling_tpu.utils.testing import assert_allclose

rng = np.random.default_rng(51)

DIMS = dict(kv_lora_rank=16, q_lora_rank=24, qk_nope_head_dim=8,
            qk_rope_head_dim=4, v_head_dim=8)


def _layer(q_lora_rank=24):
    mla = MLAttention(num_heads=4, **{**DIMS, "q_lora_rank": q_lora_rank})
    x = jnp.asarray(rng.standard_normal((2, 12, 32)), jnp.float32)
    params = mla.init(jax.random.PRNGKey(0), x)
    return mla, x, params


def _oracle(mla, params, x):
    """Materialized-KV reference: q/k concat features, causal softmax."""
    hq = mla.num_heads
    nope, rope = mla.qk_nope_head_dim, mla.qk_rope_head_dim
    rank, vd = mla.kv_lora_rank, mla.v_head_dim
    s_len = x.shape[1]
    if mla.q_lora_rank is None:
        q = (x @ params["wq"].reshape(x.shape[-1], -1))
    else:
        a = ops.rms_norm(x @ params["q_a"], params["q_a_norm"]["gamma"],
                         mla.ln_eps)
        q = a @ params["q_b"].reshape(mla.q_lora_rank, -1)
    q = jnp.swapaxes(q.reshape(*x.shape[:-1], hq, nope + rope), 1, 2)
    qn, qp = q[..., :nope], q[..., nope:]
    y = x @ params["kv_a"]
    c = ops.rms_norm(y[..., :rank], params["kv_a_norm"]["gamma"], mla.ln_eps)
    kp = y[..., rank:]
    kv = jnp.einsum("bsr,rhd->bhsd", c, params["kv_b"])
    kn, v = kv[..., :nope], kv[..., nope:]
    pos = jnp.arange(s_len)
    qp = ops.apply_rope(qp, pos, mla.rope_base)
    kp = ops.apply_rope(kp[:, None], pos, mla.rope_base)
    qf = jnp.concatenate([qn, qp], -1)
    kf = jnp.concatenate([kn, jnp.broadcast_to(kp, kn.shape[:-1] + (rope,))],
                         -1)
    s = (jnp.einsum("bhqd,bhkd->bhqk", qf, kf)
         / math.sqrt(nope + rope))
    s = jnp.where(jnp.tril(jnp.ones((s_len, s_len), bool)), s, -1e30)
    p = jax.nn.softmax(s, -1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = jnp.swapaxes(o, 1, 2).reshape(*x.shape[:-1], hq * vd)
    return o @ params["wo"].reshape(hq * vd, x.shape[-1])


@pytest.mark.parametrize("q_lora_rank", [24, None])
def test_mla_forward_matches_oracle(q_lora_rank):
    mla, x, params = _layer(q_lora_rank)
    got = mla.apply(params, x)
    want = _oracle(mla, params, x)
    assert_allclose(got, want, rtol=1e-5, atol=2e-5)


def test_mla_pallas_kernel_path():
    """Long sequences ride the flash kernel (concat-feature form, v padded
    to the qk head dim)."""
    mla = MLAttention(num_heads=4, **DIMS)
    x = jnp.asarray(rng.standard_normal((1, 256, 32)), jnp.float32)
    params = mla.init(jax.random.PRNGKey(1), x)
    want = mla.apply(params, x)
    with ops.dispatch.force_pallas(True, interpret=True):
        got = mla.apply(params, x)
    assert_allclose(got, want, rtol=1e-5, atol=2e-5)


@pytest.mark.parametrize("q_lora_rank", [24, None])
def test_mla_absorbed_decode_equals_forward(q_lora_rank):
    """The latent-cache decode (k_nope/v never materialized; q absorbed
    through kv_b) equals the training forward — prefill-at-once AND
    token-by-token."""
    mla, x, params = _layer(q_lora_rank)
    want = mla.apply(params, x)

    cache = mla.init_cache(2, 16, 32)
    got, cache2 = mla.apply(params, x, cache=cache, decode=True)
    assert_allclose(got, want, rtol=1e-5, atol=2e-5)
    assert int(cache2["index"]) == 12

    cache = mla.init_cache(2, 16, 32)
    outs = []
    for t in range(x.shape[1]):
        o, cache = mla.apply(params, x[:, t:t + 1], cache=cache, decode=True)
        outs.append(o[:, 0])
    assert_allclose(jnp.stack(outs, 1), want, rtol=1e-5, atol=2e-5)


def test_mla_cache_is_latent_sized():
    mla, x, params = _layer()
    cache = mla.init_cache(2, 16, 32)
    assert cache["k"].shape == (2, 1, 16, DIMS["kv_lora_rank"]
                                + DIMS["qk_rope_head_dim"])
    assert set(cache) == {"k", "index"}
    # vs a plain MHA cache: 2 * hq * head_dim per token.
    mha_width = 2 * 4 * (DIMS["qk_nope_head_dim"] + DIMS["qk_rope_head_dim"])
    assert cache["k"].shape[-1] < mha_width / 2


def test_mla_grads_flow_and_match_oracle():
    mla, x, params = _layer()
    loss = lambda p: jnp.sum(jnp.sin(mla.apply(p, x)))
    oracle_loss = lambda p: jnp.sum(jnp.sin(_oracle(mla, p, x)))
    g = jax.grad(loss)(params)
    g_o = jax.grad(oracle_loss)(params)
    for key in ("kv_a", "kv_b", "q_a", "q_b", "wo"):
        assert_allclose(g[key], g_o[key], rtol=1e-4, atol=1e-4)


def test_mla_gpt_trains_and_decodes():
    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=48, max_len=32,
                           positional="rope", norm="rms", ffn="swiglu",
                           use_bias=False, tie_embeddings=False,
                           mla=dict(**DIMS))
    gpt = models.GPT(cfg)
    toks = jnp.asarray(rng.integers(0, 64, (2, 16)))
    params = gpt.init(jax.random.PRNGKey(2), toks)
    opt = training.adam(1e-2)
    st = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda q: gpt.loss(q, toks))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss

    p, losses = params, []
    for _ in range(8):
        p, st, l = step(p, st)
        losses.append(float(l))
    assert losses[-1] < losses[0]

    # Greedy decode == recompute-full greedy, several steps.
    prompt = toks[:1, :8]
    gen = np.asarray(gpt.generate(params, prompt, steps=5))[0]
    cur = prompt
    for t in range(5):
        nxt = int(jnp.argmax(gpt.apply(params, cur)[0, -1]))
        assert nxt == gen[t], (t, nxt, gen)
        cur = jnp.concatenate([cur, jnp.full((1, 1), nxt, cur.dtype)], 1)


def _mla_gpt(moe=False):
    kw = dict(vocab_size=64, d_model=32, num_heads=4, num_layers=2,
              hidden_units=48, max_len=32, positional="rope", norm="rms",
              ffn="swiglu", use_bias=False, tie_embeddings=False,
              mla=dict(**DIMS))
    if moe:
        kw.update(moe_experts=4, moe_top_k=2, moe_capacity_factor=None,
                  moe_router_weights="softmax", moe_shared_units=16,
                  moe_hidden_units=16, moe_first_dense=1, num_layers=3)
    cfg = models.GPTConfig(**kw)
    gpt = models.GPT(cfg)
    toks = jnp.asarray(rng.integers(0, 64, (1, 12)))
    params = gpt.init(jax.random.PRNGKey(3), toks)
    return gpt, params


@pytest.mark.parametrize("moe", [False, True])
def test_mla_engine_serving_matches_generate(moe):
    """Paged MLA serving: the engine's pages hold LATENTS (rank + rope per
    token, ONE shared head, no v buffer) and decode runs the absorbed
    form — tokens must equal the model's dense latent-cache generate.
    The MoE case also exercises per-layer dense/MoE alternation
    (moe_first_dense) in the engine."""
    from np_modeling_tpu.serving import GenerationEngine
    gpt, params = _mla_gpt(moe)
    prompt = rng.integers(0, 64, 11)
    want = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                   steps=8))[0]
    for chunk in (256, 4):
        eng = GenerationEngine(gpt, params, total_pages=32, page_size=8,
                               prefill_chunk_size=chunk)
        # Latent pages: one shared head, rank+rope wide, no v buffer.
        width = DIMS["kv_lora_rank"] + DIMS["qk_rope_head_dim"]
        assert eng._state["k_pages"][0].shape == (1, 32, 8, width)
        assert "v_pages" not in eng._state
        got = [eng.add_request(0, prompt)]
        for _ in range(7):
            got.append(eng.step()[0])
        np.testing.assert_array_equal(np.asarray(got), want)


def test_mla_engine_continuous_batching():
    """Sequences join/leave between steps; per-slot latent isolation."""
    from np_modeling_tpu.serving import GenerationEngine
    gpt, params = _mla_gpt()
    p1 = rng.integers(0, 64, 9)
    p2 = rng.integers(0, 64, 5)
    w1 = np.asarray(gpt.generate(params, jnp.asarray(p1)[None], steps=6))[0]
    w2 = np.asarray(gpt.generate(params, jnp.asarray(p2)[None], steps=4))[0]

    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8)
    g1 = [eng.add_request(1, p1)]
    g1.append(eng.step()[1])
    g2 = [eng.add_request(2, p2)]          # joins mid-stream
    out = eng.step()
    g1.append(out[1]); g2.append(out[2])
    out = eng.step()
    g1.append(out[1]); g2.append(out[2])
    out = eng.step()
    g1.append(out[1]); g2.append(out[2])
    eng.finish(2)
    out = eng.step()
    g1.append(out[1])
    np.testing.assert_array_equal(np.asarray(g1), w1)
    np.testing.assert_array_equal(np.asarray(g2), w2[:4])


def test_mla_engine_requires_chunked_prefill():
    from np_modeling_tpu.serving import GenerationEngine
    gpt, params = _mla_gpt()
    with pytest.raises(AssertionError, match="chunked"):
        GenerationEngine(gpt, params, total_pages=8, page_size=4,
                         prefill_chunk_size=None)


def test_mla_engine_speculative_token_exact():
    """Speculative decoding with an MLA TARGET and a dense MHA draft:
    the two lanes carry different cache layouts (latent pages vs per-head
    K/V pages) in one engine; greedy step_speculative must be token-exact
    vs plain step()."""
    from np_modeling_tpu.serving import GenerationEngine
    gpt, params = _mla_gpt()
    dcfg = models.GPTConfig(vocab_size=64, d_model=16, num_heads=2,
                            num_layers=1, hidden_units=32, max_len=32,
                            positional="rope", norm="rms", ffn="swiglu",
                            use_bias=False)
    draft = models.GPT(dcfg)
    dparams = draft.init(jax.random.PRNGKey(9),
                         jnp.zeros((1, 8), jnp.int32))
    prompt = rng.integers(0, 64, 9)

    ref = GenerationEngine(gpt, params, total_pages=32, page_size=8)
    want = [ref.add_request(0, prompt)]
    for _ in range(7):
        want.append(ref.step()[0])

    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8,
                           draft_gpt=draft, draft_params=dparams)
    assert "v_pages" not in eng._state          # target lane: latents
    assert "v_pages" in eng._dstate             # draft lane: per-head K/V
    got = [eng.add_request(0, prompt)]
    while len(got) < 8:
        toks = eng.step_speculative(gamma=2)[0]
        got.extend(int(t) for t in np.atleast_1d(toks))
    np.testing.assert_array_equal(np.asarray(got[:8]), np.asarray(want))


@pytest.mark.parametrize("kv_dtype,quantize", [
    (jnp.bfloat16, False), (None, True)])
def test_mla_engine_compressed_latent_pages(kv_dtype, quantize):
    """bf16 latent pages stay argmax-stable on this tiny model; int8
    latents (one per-token scale set — the dequantized latent serves as
    both k and v) must keep the greedy stream close to exact (same
    tolerance style as the MHA int8 test: compare prefix agreement)."""
    from np_modeling_tpu.serving import GenerationEngine
    gpt, params = _mla_gpt()
    prompt = rng.integers(0, 64, 9)
    want = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                   steps=6))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8,
                           kv_dtype=kv_dtype, quantize_kv=quantize)
    got = [eng.add_request(0, prompt)]
    for _ in range(5):
        got.append(eng.step()[0])
    agree = int(np.sum(np.cumprod(np.asarray(got) == want)))
    assert agree >= (6 if kv_dtype == jnp.bfloat16 else 3), (got, want)
