"""HuggingFace GPT-2 import: logits parity vs the torch model.

Oracle pattern (SURVEY.md §4): an independent trusted implementation —
here ``transformers.GPT2LMHeadModel`` built locally with random weights
(no network) — is converted via utils.hf_compat and must produce the same
logits through our GPT at float32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models
from np_modeling_tpu.utils import hf_compat

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_hf_gpt2(seed=0):
    cfg = transformers.GPT2Config(
        vocab_size=97, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        activation_function="gelu_new")
    torch.manual_seed(seed)
    model = transformers.GPT2LMHeadModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def hf_and_ours():
    model = _tiny_hf_gpt2()
    cfg, params = hf_compat.import_gpt2(model)
    return model, models.GPT(cfg), params


def test_config_mapping(hf_and_ours):
    model, gpt, params = hf_and_ours
    c = gpt.config
    assert (c.vocab_size, c.d_model, c.num_heads, c.num_layers) == (97, 32,
                                                                    4, 2)
    assert c.hidden_units == 128 and c.max_len == 64
    assert c.activation == "gelu" and c.ln_eps == 1e-5
    assert c.norm_first and c.tie_embeddings
    # The tied LM head really is the embedding table.
    np.testing.assert_array_equal(
        np.asarray(params["embedding"]["table"]),
        model.lm_head.weight.detach().numpy())


def test_logits_match_torch(hf_and_ours):
    model, gpt, params = hf_and_ours
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=(3, 17))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = gpt.apply(params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_loss_matches_torch_ce(hf_and_ours):
    model, gpt, params = hf_and_ours
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 97, size=(2, 12))
    t = torch.from_numpy(tokens)
    with torch.no_grad():
        want = model(t, labels=t).loss.item()  # HF shifts labels internally
    with jax.default_matmul_precision("highest"):
        got = float(gpt.loss(params, jnp.asarray(tokens, jnp.int32)))
    assert abs(got - want) < 1e-4


def test_kv_cache_decode_matches_torch(hf_and_ours):
    """Prefill + single-token decode steps reproduce the torch logits."""
    model, gpt, params = hf_and_ours
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 97, size=(2, 9))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        caches = gpt.init_cache(2, 9)
        toks = jnp.asarray(tokens, jnp.int32)
        logits, caches = gpt.apply(params, toks[:, :5], caches=caches,
                                   decode=True)
        steps = [np.asarray(logits)[:, i] for i in range(5)]
        for i in range(5, 9):
            logits, caches = gpt.apply(params, toks[:, i:i + 1],
                                       caches=caches, decode=True)
            steps.append(np.asarray(logits)[:, 0])
    got = np.stack(steps, axis=1)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_export_roundtrip(hf_and_ours):
    """export(import(model)) loads back into torch and reproduces logits."""
    model, gpt, params = hf_and_ours
    sd = hf_compat.export_gpt2_state_dict(params, gpt.config)
    model2 = _tiny_hf_gpt2(seed=123)   # different weights, same shape
    missing, unexpected = model2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    assert not [m for m in missing if "attn.bias" not in m
                and "masked_bias" not in m], missing
    assert not unexpected
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 97, size=(2, 13))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
        got = model2(torch.from_numpy(tokens)).logits.numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_after_training(hf_and_ours):
    """Fine-tune here, export, and torch sees the updated weights."""
    import jax as _jax
    from np_modeling_tpu import training
    model, gpt, params = hf_and_ours
    toks = jnp.asarray(np.random.default_rng(6).integers(0, 97, (4, 10)))
    opt = training.adam(1e-2)
    state = opt.init(params)

    @_jax.jit
    def step(p, s):
        loss, g = _jax.value_and_grad(lambda p: gpt.loss(p, toks))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss

    p2 = params
    for _ in range(5):
        p2, state, _ = step(p2, state)
    sd = hf_compat.export_gpt2_state_dict(p2, gpt.config)
    model2 = _tiny_hf_gpt2(seed=7)
    model2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()}, strict=False)
    with torch.no_grad():
        want = model2(torch.from_numpy(np.asarray(toks))).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(p2, toks))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# LLaMA import
# ---------------------------------------------------------------------------


def _tiny_llama(seed=0, tie=False, kv_heads=2):
    cfg = transformers.LlamaConfig(
        vocab_size=89, hidden_size=32, intermediate_size=56,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=kv_heads, max_position_embeddings=64,
        rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=tie,
        attention_dropout=0.0)
    torch.manual_seed(seed)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_llama_logits_match_torch(kv_heads):
    model = _tiny_llama(kv_heads=kv_heads)
    cfg, params = hf_compat.import_llama(model)
    gpt = models.GPT(cfg)
    assert cfg.norm == "rms" and cfg.ffn == "swiglu" and not cfg.use_bias
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 89, size=(2, 15))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_llama_kv_cache_decode_matches_torch():
    model = _tiny_llama(seed=3)
    cfg, params = hf_compat.import_llama(model)
    gpt = models.GPT(cfg)
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 89, size=(1, 8))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        caches = gpt.init_cache(1, 8)
        toks = jnp.asarray(tokens, jnp.int32)
        logits, caches = gpt.apply(params, toks[:, :4], caches=caches,
                                   decode=True)
        steps = [np.asarray(logits)[:, i] for i in range(4)]
        for i in range(4, 8):
            logits, caches = gpt.apply(params, toks[:, i:i + 1],
                                       caches=caches, decode=True)
            steps.append(np.asarray(logits)[:, 0])
    got = np.stack(steps, axis=1)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_llama_serves_in_engine():
    from np_modeling_tpu.serving import GenerationEngine
    model = _tiny_llama(seed=5)
    cfg, params = hf_compat.import_llama(model)
    gpt = models.GPT(cfg)
    prompt = np.random.default_rng(4).integers(0, 89, 10)
    want = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                   steps=8))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8)
    got = [eng.add_request(0, prompt)]
    for _ in range(7):
        got.append(eng.step()[0])
    assert got == [int(t) for t in want]


def test_llama_export_roundtrip():
    """export(import(model)) reloads into torch and reproduces logits."""
    model = _tiny_llama(seed=9)
    cfg, params = hf_compat.import_llama(model)
    sd = hf_compat.export_llama_state_dict(params, cfg)
    model2 = _tiny_llama(seed=31)
    missing, unexpected = model2.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not [m for m in missing if "rotary" not in m], missing
    assert not unexpected
    rng2 = np.random.default_rng(8)
    tokens = rng2.integers(0, 89, size=(2, 11))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
        got = model2(torch.from_numpy(tokens)).logits.numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mistral_logits_match_torch():
    """Mistral = LLaMA + sliding window; prompt longer than the window so
    the window mask is actually exercised."""
    cfg = transformers.MistralConfig(
        vocab_size=73, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=6, rms_norm_eps=1e-6,
        attention_dropout=0.0)
    torch.manual_seed(0)
    model = transformers.MistralForCausalLM(cfg)
    model.eval()
    ours_cfg, params = hf_compat.import_mistral(model)
    assert ours_cfg.attention_window == 6
    gpt = models.GPT(ours_cfg)
    rng2 = np.random.default_rng(1)
    tokens = rng2.integers(0, 73, size=(2, 16))      # 16 > window 6
    with torch.no_grad():
        want = model(torch.from_numpy(tokens),
                     attention_mask=None).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_qwen2_logits_match_torch():
    """Qwen2 = LLaMA + biased q/k/v projections (qkv_bias knob)."""
    cfg = transformers.Qwen2Config(
        vocab_size=71, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0, tie_word_embeddings=False)
    torch.manual_seed(2)
    model = transformers.Qwen2ForCausalLM(cfg)
    model.eval()
    ours_cfg, params = hf_compat.import_qwen2(model)
    assert ours_cfg.qkv_bias and not ours_cfg.use_bias
    assert "bq" in params["layer_0"]["self_attention"]
    assert "bo" not in params["layer_0"]["self_attention"]
    gpt = models.GPT(ours_cfg)
    rng2 = np.random.default_rng(3)
    tokens = rng2.integers(0, 71, size=(2, 14))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_qkv_bias_knob_trains():
    cfg = models.GPTConfig(vocab_size=41, d_model=32, num_heads=4,
                           num_layers=1, hidden_units=64, max_len=32,
                           norm="rms", ffn="swiglu", use_bias=False,
                           qkv_bias=True, positional="rope")
    gpt = models.GPT(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0, 41)
    params = gpt.init(jax.random.PRNGKey(1), toks)
    ap = params["layer_0"]["self_attention"]
    assert "bq" in ap and "bo" not in ap
    g = jax.grad(lambda p: gpt.loss(p, toks))(params)
    assert float(jnp.linalg.norm(
        g["layer_0"]["self_attention"]["bq"])) > 0


def test_gemma_logits_match_torch():
    """Gemma: zero-centered RMSNorm, geglu FFN, embed scaling, decoupled
    head_dim, tied embeddings."""
    cfg = transformers.GemmaConfig(
        vocab_size=83, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0)
    torch.manual_seed(4)
    model = transformers.GemmaForCausalLM(cfg)
    model.eval()
    ours_cfg, params = hf_compat.import_gemma(model)
    assert (ours_cfg.rms_offset and ours_cfg.ffn == "geglu"
            and ours_cfg.embed_scale and ours_cfg.head_dim == 16
            and ours_cfg.tie_embeddings)
    gpt = models.GPT(ours_cfg)
    rng2 = np.random.default_rng(6)
    tokens = rng2.integers(0, 83, size=(2, 13))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=7e-4, atol=7e-4)


def test_gemma_serves_in_engine():
    """Regression: the engine's _forward_tokens must apply embed_scale —
    an imported Gemma previously decoded silently wrong tokens."""
    from np_modeling_tpu.serving import GenerationEngine
    cfg = transformers.GemmaConfig(
        vocab_size=83, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, attention_dropout=0.0)
    torch.manual_seed(4)
    model = transformers.GemmaForCausalLM(cfg)
    model.eval()
    ours_cfg, params = hf_compat.import_gemma(model)
    gpt = models.GPT(ours_cfg)
    prompt = np.random.default_rng(8).integers(0, 83, 11)
    want = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                   steps=8))[0]
    for chunk in (None, 4):
        eng = GenerationEngine(gpt, params, total_pages=32, page_size=8,
                               prefill_chunk_size=chunk)
        got = [eng.add_request(0, prompt)]
        for _ in range(7):
            got.append(eng.step()[0])
        assert got == [int(t) for t in want], chunk


# ---------------------------------------------------------------------------
# GPT-NeoX (Pythia): parallel residual + partial rotary + fused QKV
# ---------------------------------------------------------------------------


def _tiny_neox(seed=0, parallel=True, rotary_pct=0.25):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=97, hidden_size=32, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=64,
        max_position_embeddings=64, rotary_pct=rotary_pct,
        hidden_act="gelu", use_parallel_residual=parallel,
        tie_word_embeddings=False, layer_norm_eps=1e-5,
        attention_dropout=0.0, hidden_dropout=0.0)
    torch.manual_seed(seed)
    model = transformers.GPTNeoXForCausalLM(cfg)
    model.eval()
    return model


@pytest.mark.parametrize("parallel,rotary_pct", [(True, 0.25), (True, 1.0),
                                                 (False, 0.25)])
def test_neox_logits_match_torch(parallel, rotary_pct):
    model = _tiny_neox(parallel=parallel, rotary_pct=rotary_pct)
    cfg, params = hf_compat.import_gpt_neox(model)
    assert cfg.parallel_residual == parallel
    assert cfg.rope_dim == int(8 * rotary_pct)
    assert cfg.activation == "gelu_exact"
    gpt = models.GPT(cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=(2, 15))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_neox_kv_cache_decode_matches_torch():
    model = _tiny_neox(seed=3)
    cfg, params = hf_compat.import_gpt_neox(model)
    gpt = models.GPT(cfg)
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 97, size=(1, 8))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        caches = gpt.init_cache(1, 8)
        toks = jnp.asarray(tokens, jnp.int32)
        logits, caches = gpt.apply(params, toks[:, :4], caches=caches,
                                   decode=True)
        steps = [np.asarray(logits)[:, i] for i in range(4)]
        for i in range(4, 8):
            logits, caches = gpt.apply(params, toks[:, i:i + 1],
                                       caches=caches, decode=True)
            steps.append(np.asarray(logits)[:, 0])
    got = np.stack(steps, axis=1)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_neox_serves_in_engine():
    from np_modeling_tpu.serving import GenerationEngine
    model = _tiny_neox(seed=5)
    cfg, params = hf_compat.import_gpt_neox(model)
    gpt = models.GPT(cfg)
    prompt = np.random.default_rng(4).integers(0, 97, 10)
    want = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                   steps=8))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8)
    got = [eng.add_request(0, prompt)]
    for _ in range(7):
        got.append(eng.step()[0])
    assert got == [int(t) for t in want]


# ---------------------------------------------------------------------------
# Phi: shared-LN parallel residual + partial rotary + biased LM head
# ---------------------------------------------------------------------------


def _tiny_phi(seed=0):
    cfg = transformers.PhiConfig(
        vocab_size=97, hidden_size=32, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=64,
        max_position_embeddings=64, partial_rotary_factor=0.5,
        hidden_act="gelu_new", layer_norm_eps=1e-5,
        attention_dropout=0.0, resid_pdrop=0.0, embd_pdrop=0.0)
    torch.manual_seed(seed)
    model = transformers.PhiForCausalLM(cfg)
    model.eval()
    return model


def test_phi_logits_match_torch():
    model = _tiny_phi()
    cfg, params = hf_compat.import_phi(model)
    assert cfg.parallel_residual and cfg.parallel_shared_norm
    assert cfg.rope_dim == 4 and cfg.lm_head_bias
    assert "norm2" not in params["layer_0"]      # shared LN: one norm
    gpt = models.GPT(cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=(2, 15))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_phi_serves_in_engine():
    from np_modeling_tpu.serving import GenerationEngine
    model = _tiny_phi(seed=5)
    cfg, params = hf_compat.import_phi(model)
    gpt = models.GPT(cfg)
    prompt = np.random.default_rng(4).integers(0, 97, 10)
    want = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                   steps=8))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8)
    got = [eng.add_request(0, prompt)]
    for _ in range(7):
        got.append(eng.step()[0])
    assert got == [int(t) for t in want]


def test_parallel_residual_block_trains():
    """The parallel-residual knobs train end-to-end (grads flow through
    both branches; shared-norm variant included)."""
    from np_modeling_tpu import training
    for shared in (False, True):
        cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                               num_layers=2, hidden_units=64, max_len=32,
                               positional="rope", rope_dim=4,
                               parallel_residual=True,
                               parallel_shared_norm=shared)
        gpt = models.GPT(cfg)
        toks = jnp.asarray(np.random.default_rng(0).integers(0, 64, (4, 16)))
        params = gpt.init(jax.random.PRNGKey(0), toks)
        opt = training.adam(1e-2)
        state = jax.jit(opt.init)(params)

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(gpt.loss)(p, toks)
            u, s = opt.update(g, s, p)
            return training.apply_updates(p, u), s, l

        losses = []
        for _ in range(6):
            params, state, l = step(params, state)
            losses.append(float(l))
        assert losses[-1] < losses[0], (shared, losses)


# ---------------------------------------------------------------------------
# Mixtral (MoE) import
# ---------------------------------------------------------------------------


def _tiny_mixtral(seed=0, experts=4, window=None):
    cfg = transformers.MixtralConfig(
        vocab_size=71, hidden_size=32, intermediate_size=40,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=experts, num_experts_per_tok=2,
        max_position_embeddings=64, sliding_window=window,
        rms_norm_eps=1e-6, attention_dropout=0.0)
    torch.manual_seed(seed)
    model = transformers.MixtralForCausalLM(cfg)
    model.eval()
    return model


@pytest.mark.parametrize("experts", [4, 8])
def test_mixtral_logits_match_torch(experts):
    """Mixtral = LLaMA attention + top-2 routed SwiGLU experts. HF's
    softmax->top2->renormalize routing with no capacity limit is our
    no-drop dispatch exactly, so logits match token-for-token."""
    model = _tiny_mixtral(experts=experts)
    ours_cfg, params = hf_compat.import_mixtral(model)
    assert ours_cfg.moe_experts == experts
    assert ours_cfg.moe_capacity_factor is None
    assert ours_cfg.ffn == "swiglu"
    gpt = models.GPT(ours_cfg)
    assert "w_gate" in params["layer_0"]["moe"]
    rng2 = np.random.default_rng(3)
    tokens = rng2.integers(0, 71, size=(2, 14))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_mixtral_kv_cache_decode_matches_torch():
    model = _tiny_mixtral(seed=7)
    ours_cfg, params = hf_compat.import_mixtral(model)
    gpt = models.GPT(ours_cfg)
    rng2 = np.random.default_rng(5)
    tokens = rng2.integers(0, 71, size=(1, 8))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        caches = gpt.init_cache(1, 8)
        toks = jnp.asarray(tokens, jnp.int32)
        logits, caches = gpt.apply(params, toks[:, :4], caches=caches,
                                   decode=True)
        steps = [np.asarray(logits)[:, i] for i in range(4)]
        for i in range(4, 8):
            logits, caches = gpt.apply(params, toks[:, i:i + 1],
                                       caches=caches, decode=True)
            steps.append(np.asarray(logits)[:, 0])
    got = np.stack(steps, axis=1)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_mixtral_serves_in_engine():
    """An imported MoE model decodes in the paged engine, token-exact vs
    model.generate (no-drop routing is population-independent, so paged
    chunked prefill is exact too)."""
    from np_modeling_tpu.serving import GenerationEngine
    model = _tiny_mixtral(seed=11)
    ours_cfg, params = hf_compat.import_mixtral(model)
    gpt = models.GPT(ours_cfg)
    prompt = np.random.default_rng(9).integers(0, 71, 10)
    want = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                   steps=8))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8)
    got = [eng.add_request(0, prompt)]
    for _ in range(7):
        got.append(eng.step()[0])
    assert got == [int(t) for t in want]


def _tiny_gemma2(seed=11, layers=4):
    cfg = transformers.Gemma2Config(
        vocab_size=89, hidden_size=32, intermediate_size=48,
        num_hidden_layers=layers, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=64,
        rms_norm_eps=1e-6, attention_dropout=0.0,
        sliding_window=8, query_pre_attn_scalar=16.0,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        attn_implementation="eager")   # sdpa skips softcapping
    torch.manual_seed(seed)
    model = transformers.Gemma2ForCausalLM(cfg)
    model.eval()
    return model


def test_gemma2_logits_match_torch():
    """Gemma 2: attention-logit + final-logit softcapping (IN the flash
    kernels), query_pre_attn_scalar scale, sandwich norms, alternating
    sliding/global attention. 4 layers + seq > window so both window
    parities and the cap actually bite."""
    model = _tiny_gemma2()
    ours_cfg, params = hf_compat.import_gemma2(model)
    assert (ours_cfg.sandwich_norm and ours_cfg.window_pattern == 2
            and ours_cfg.attn_logit_softcap == 50.0
            and ours_cfg.final_logit_softcap == 30.0
            and ours_cfg.attention_window == 8)
    assert "post_norm1" in params["layer_0"]
    gpt = models.GPT(ours_cfg)
    rng2 = np.random.default_rng(12)
    tokens = rng2.integers(0, 89, size=(2, 13))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=7e-4, atol=7e-4)

    # The window must matter: a no-window import of the same weights
    # diverges (guards against silently ignoring the alternation).
    flat_cfg, flat_params = hf_compat.import_gemma2(
        model, attention_window=None, window_pattern=1)
    flat = np.asarray(models.GPT(flat_cfg).apply(
        flat_params, jnp.asarray(tokens, jnp.int32)))
    assert np.abs(flat - want).max() > 1e-2


def test_gemma2_kv_cache_decode_matches_torch():
    """Greedy decode with per-layer (sliding/global) KV caches == HF
    generate."""
    model = _tiny_gemma2(seed=13)
    ours_cfg, params = hf_compat.import_gemma2(model)
    gpt = models.GPT(ours_cfg)
    rng2 = np.random.default_rng(14)
    prompt = rng2.integers(0, 89, size=(1, 11))
    with torch.no_grad():
        want = model.generate(torch.from_numpy(prompt), max_new_tokens=10,
                              do_sample=False).numpy()[0, 11:]
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.generate(params, jnp.asarray(prompt, jnp.int32),
                                      steps=10))[0]
    np.testing.assert_array_equal(got, want)


def test_gemma2_serves_in_engine():
    """Gemma 2 through the paged engine: per-layer sliding/global windows,
    in-kernel score softcap, sandwich norms, query_pre_attn_scalar and
    final-logit softcap must all reach the serving forward — tokens must
    equal model.generate for both eager and chunked prefill."""
    from np_modeling_tpu.serving import GenerationEngine
    model = _tiny_gemma2(seed=15, layers=4)
    ours_cfg, params = hf_compat.import_gemma2(model)
    gpt = models.GPT(ours_cfg)
    prompt = np.random.default_rng(16).integers(0, 89, 11)
    want = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                   steps=8))[0]
    for chunk in (None, 4):
        eng = GenerationEngine(gpt, params, total_pages=32, page_size=8,
                               prefill_chunk_size=chunk)
        got = [eng.add_request(0, prompt)]
        for _ in range(7):
            got.append(eng.step()[0])
        np.testing.assert_array_equal(np.asarray(got), want)


def _tiny_qwen3(seed=21):
    cfg = transformers.Qwen3Config(
        vocab_size=91, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0, tie_word_embeddings=False)
    torch.manual_seed(seed)
    model = transformers.Qwen3ForCausalLM(cfg)
    model.eval()
    return model


def test_qwen3_logits_match_torch():
    """Qwen3: per-head q/k RMSNorm before RoPE (gammas carry the same
    half-split -> interleaved feature permutation as the projections)."""
    model = _tiny_qwen3()
    ours_cfg, params = hf_compat.import_qwen3(model)
    assert ours_cfg.qk_norm and not ours_cfg.use_bias
    assert "q_norm" in params["layer_0"]["self_attention"]
    gpt = models.GPT(ours_cfg)
    rng2 = np.random.default_rng(22)
    tokens = rng2.integers(0, 91, size=(2, 13))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=7e-4, atol=7e-4)


def test_qwen3_decode_and_engine_match():
    """KV-cache decode == HF generate; engine (QK-norm in the paged
    forward) == model.generate."""
    from np_modeling_tpu.serving import GenerationEngine
    model = _tiny_qwen3(seed=23)
    ours_cfg, params = hf_compat.import_qwen3(model)
    gpt = models.GPT(ours_cfg)
    prompt = np.random.default_rng(24).integers(0, 91, 9)
    with torch.no_grad():
        want_hf = model.generate(torch.from_numpy(prompt[None]),
                                 max_new_tokens=8, do_sample=False)
    want_hf = want_hf.numpy()[0, 9:]
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                      steps=8))[0]
    np.testing.assert_array_equal(got, want_hf)

    want = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                   steps=8))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8)
    toks = [eng.add_request(0, prompt)]
    for _ in range(7):
        toks.append(eng.step()[0])
    np.testing.assert_array_equal(np.asarray(toks), want)


def test_llama31_rope_scaling_logits_match_torch():
    """Llama-3.1-style checkpoint: rope_scaling={'rope_type': 'llama3'}
    must reach our RoPE frequency transform (and 'linear' too)."""
    for rs in (
        {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
         "high_freq_factor": 4.0,
         "original_max_position_embeddings": 16},
        {"rope_type": "linear", "factor": 4.0},
    ):
        cfg = transformers.LlamaConfig(
            vocab_size=87, hidden_size=32, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-6, attention_dropout=0.0, rope_theta=10000.0,
            rope_scaling=dict(rs), tie_word_embeddings=False)
        torch.manual_seed(31)
        model = transformers.LlamaForCausalLM(cfg)
        model.eval()
        ours_cfg, params = hf_compat.import_llama(model)
        assert ours_cfg.rope_scaling[0] == rs["rope_type"]
        gpt = models.GPT(ours_cfg)
        tokens = np.random.default_rng(32).integers(0, 87, size=(2, 24))
        with torch.no_grad():
            want = model(torch.from_numpy(tokens)).logits.numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(gpt.apply(params,
                                       jnp.asarray(tokens, jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=7e-4, atol=7e-4)

        # Scaling must actually change the output (guard vs silent no-op).
        flat_cfg, flat_params = hf_compat.import_llama(model,
                                                       rope_scaling=None)
        flat = np.asarray(models.GPT(flat_cfg).apply(
            flat_params, jnp.asarray(tokens, jnp.int32)))
        assert np.abs(flat - want).max() > 1e-3


def _tiny_deepseek_v2(seed=41, q_lora_rank=24, moe=True):
    kw = dict(
        vocab_size=93, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=16, q_lora_rank=q_lora_rank,
        qk_rope_head_dim=4, qk_nope_head_dim=8, v_head_dim=8,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0, attention_bias=False,
        tie_word_embeddings=False, rope_theta=10000.0)
    if moe:
        kw.update(n_routed_experts=4, num_experts_per_tok=2,
                  n_shared_experts=1, first_k_dense_replace=1,
                  topk_method="greedy", n_group=1, topk_group=1,
                  routed_scaling_factor=1.5, norm_topk_prob=False,
                  aux_loss_alpha=0.0, seq_aux=False)
    else:
        # HF's DeepseekV2MoE cannot be built with n_routed_experts=None;
        # "dense variant" = every layer below first_k_dense_replace.
        kw.update(n_routed_experts=4, num_experts_per_tok=2,
                  n_shared_experts=1, first_k_dense_replace=3,
                  topk_method="greedy", n_group=1, topk_group=1,
                  routed_scaling_factor=1.0, norm_topk_prob=False,
                  aux_loss_alpha=0.0, seq_aux=False)
    torch.manual_seed(seed)
    model = transformers.DeepseekV2ForCausalLM(
        transformers.DeepseekV2Config(**kw))
    model.eval()
    return model


@pytest.mark.parametrize("q_lora_rank,moe", [(24, True), (None, False)])
def test_deepseek_v2_logits_match_torch(q_lora_rank, moe):
    """DeepSeek-V2: MLA attention (low-rank q optional, latent kv, shared
    rope key) + DeepSeek MoE (raw softmax top-k * scaling, shared experts,
    first layer dense). HF's rotary is the complex/interleaved form = our
    apply_rope pairing directly (no permutation)."""
    model = _tiny_deepseek_v2(q_lora_rank=q_lora_rank, moe=moe)
    ours_cfg, params = hf_compat.import_deepseek_v2(model)
    assert ours_cfg.mla["kv_lora_rank"] == 16
    if moe:
        assert (ours_cfg.moe_first_dense == 1
                and ours_cfg.moe_router_weights == "softmax"
                and ours_cfg.moe_routed_scaling == 1.5
                and ours_cfg.moe_shared_units == 16)
    else:
        assert ours_cfg.moe_first_dense == 3   # all layers dense
    gpt = models.GPT(ours_cfg)
    tokens = np.random.default_rng(42).integers(0, 93, size=(2, 13))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=7e-4, atol=7e-4)


def test_deepseek_v2_latent_cache_decode_matches_torch():
    """Greedy decode through the ABSORBED latent cache (per-token cache =
    kv_lora_rank + rope numbers, k_nope/v never materialized) == HF
    generate (which caches full per-head K/V) — the two are a linear-
    algebra identity."""
    model = _tiny_deepseek_v2(seed=43)
    ours_cfg, params = hf_compat.import_deepseek_v2(model)
    gpt = models.GPT(ours_cfg)
    prompt = np.random.default_rng(44).integers(0, 93, size=(1, 9))
    with torch.no_grad():
        want = model.generate(torch.from_numpy(prompt), max_new_tokens=8,
                              do_sample=False).numpy()[0, 9:]
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.generate(params, jnp.asarray(prompt, jnp.int32),
                                      steps=8))[0]
    np.testing.assert_array_equal(got, want)

    # The cache really is latent-sized: rank + rope per token, ONE kv head.
    cache = gpt.init_cache(1, 16)
    assert cache[0]["k"].shape == (1, 1, 16, 16 + 4)
    assert "v" not in cache[0]


def test_deepseek_v2_serves_in_engine():
    """Imported DeepSeek-V2 through PAGED MLA serving: latent pages
    (rank+rope per token), absorbed decode, per-layer dense/MoE FFN —
    tokens equal the model's own generate (which equals HF, above)."""
    from np_modeling_tpu.serving import GenerationEngine
    model = _tiny_deepseek_v2(seed=45)
    ours_cfg, params = hf_compat.import_deepseek_v2(model)
    gpt = models.GPT(ours_cfg)
    prompt = np.random.default_rng(46).integers(0, 93, 11)
    want = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                   steps=8))[0]
    for chunk in (256, 4):
        eng = GenerationEngine(gpt, params, total_pages=32, page_size=8,
                               prefill_chunk_size=chunk)
        assert "v_pages" not in eng._state
        got = [eng.add_request(0, prompt)]
        for _ in range(7):
            got.append(eng.step()[0])
        np.testing.assert_array_equal(np.asarray(got), want)


def test_yarn_rope_scaling_matches_torch():
    """YaRN (DeepSeek-V2 / long-context Qwen): ramp-mixed frequencies +
    the attention factor on cos/sin. Covered for a LLaMA (factor-inferred
    attention_factor) and a DeepSeek-V2 with the production-style
    mscale == mscale_all_dim config (cancels to attention_factor 1)."""
    cfg = transformers.LlamaConfig(
        vocab_size=87, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0, rope_theta=10000.0,
        tie_word_embeddings=False,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 16})
    torch.manual_seed(5)
    m = transformers.LlamaForCausalLM(cfg)
    m.eval()
    ocfg, params = hf_compat.import_llama(m)
    assert ocfg.rope_scaling[0] == "yarn"
    assert abs(ocfg.rope_scaling[5] - (0.1 * np.log(4.0) + 1.0)) < 1e-9
    toks = np.random.default_rng(6).integers(0, 87, size=(2, 24))
    with torch.no_grad():
        want = m(torch.from_numpy(toks)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(models.GPT(ocfg).apply(
            params, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=7e-4, atol=7e-4)


def test_deepseek_v2_yarn_matches_torch():
    dcfg = transformers.DeepseekV2Config(
        vocab_size=93, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, kv_lora_rank=16,
        q_lora_rank=24, qk_rope_head_dim=8, qk_nope_head_dim=8,
        v_head_dim=8, max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0, attention_bias=False,
        tie_word_embeddings=False, rope_theta=10000.0,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, topk_method="greedy", n_group=1,
        topk_group=1, routed_scaling_factor=1.0, norm_topk_prob=False,
        aux_loss_alpha=0.0, seq_aux=False,
        rope_scaling={"type": "yarn", "factor": 40.0, "beta_fast": 32,
                      "beta_slow": 1, "mscale": 0.707,
                      "mscale_all_dim": 0.707,
                      "original_max_position_embeddings": 16})
    torch.manual_seed(7)
    dm = transformers.DeepseekV2ForCausalLM(dcfg)
    dm.eval()
    oc2, p2 = hf_compat.import_deepseek_v2(dm)
    assert oc2.rope_scaling[5] == 1.0       # mscale pair cancels
    toks2 = np.random.default_rng(8).integers(0, 93, size=(1, 24))
    with torch.no_grad():
        want2 = dm(torch.from_numpy(toks2)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got2 = np.asarray(models.GPT(oc2).apply(
            p2, jnp.asarray(toks2, jnp.int32)))
    np.testing.assert_allclose(got2, want2, rtol=7e-4, atol=7e-4)


def test_deepseek_v2_group_limited_routing_matches_torch():
    """topk_method='group_limited_greedy' (full DeepSeek-V2/V2-Chat):
    experts split into n_group groups; only the topk_group groups with
    the highest per-group max softmax score stay eligible for top-k."""
    cfg = transformers.DeepseekV2Config(
        vocab_size=93, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, kv_lora_rank=16,
        q_lora_rank=24, qk_rope_head_dim=4, qk_nope_head_dim=8,
        v_head_dim=8, max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0, attention_bias=False,
        tie_word_embeddings=False, rope_theta=10000.0,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, topk_method="group_limited_greedy",
        n_group=4, topk_group=2, routed_scaling_factor=1.0,
        norm_topk_prob=False, aux_loss_alpha=0.0, seq_aux=False)
    torch.manual_seed(51)
    model = transformers.DeepseekV2ForCausalLM(cfg)
    model.eval()
    ours_cfg, params = hf_compat.import_deepseek_v2(model)
    assert ours_cfg.moe_router_groups == (4, 2)
    gpt = models.GPT(ours_cfg)
    tokens = np.random.default_rng(52).integers(0, 93, size=(2, 13))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=7e-4, atol=7e-4)


def _tiny_deepseek_v3(seed=71):
    cfg = transformers.DeepseekV3Config(
        vocab_size=95, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4, kv_lora_rank=16,
        q_lora_rank=24, qk_rope_head_dim=4, qk_nope_head_dim=8,
        v_head_dim=8, max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0, attention_bias=False,
        tie_word_embeddings=False, rope_theta=10000.0,
        n_routed_experts=8, num_experts_per_tok=3, n_shared_experts=1,
        first_k_dense_replace=1, n_group=4, topk_group=2,
        routed_scaling_factor=2.5, norm_topk_prob=True)
    torch.manual_seed(seed)
    model = transformers.DeepseekV3ForCausalLM(cfg)
    # The correction bias ships as a zeros buffer on a fresh model; real
    # checkpoints carry learned-online values. Randomize it so the test
    # actually exercises biased-selection-vs-unbiased-weights semantics.
    with torch.no_grad():
        for i in range(1, cfg.num_hidden_layers):
            model.model.layers[i].mlp.gate.e_score_correction_bias.copy_(
                torch.randn(cfg.n_routed_experts) * 0.5)
    model.eval()
    return model


def test_deepseek_v3_logits_match_torch():
    """DeepSeek-V3/R1 noaux-tc router: sigmoid scores, selection-only
    correction bias, groups kept by the top-2-sum of biased scores,
    renormalized kept weights x routed_scaling — on the V2 MLA body."""
    model = _tiny_deepseek_v3()
    ours_cfg, params = hf_compat.import_deepseek_v3(model)
    assert (ours_cfg.moe_router_score == "sigmoid"
            and ours_cfg.moe_router_select_bias
            and ours_cfg.moe_group_metric == "top2sum"
            and ours_cfg.moe_router_weights == "softmax_norm"
            and ours_cfg.moe_router_groups == (4, 2)
            and ours_cfg.moe_routed_scaling == 2.5)
    assert params["layer_1"]["moe"]["router_sb"].shape == (8,)
    gpt = models.GPT(ours_cfg)
    tokens = np.random.default_rng(72).integers(0, 95, size=(2, 13))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=7e-4, atol=7e-4)

    # The bias must matter: zeroing it changes routing, hence logits.
    for i in range(1, ours_cfg.num_layers):
        params[f"layer_{i}"]["moe"]["router_sb"] = np.zeros(8, np.float32)
    unbiased = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    assert np.abs(unbiased - want).max() > 1e-4


def test_deepseek_v3_decode_and_engine_match():
    """Absorbed latent-cache decode and paged MLA serving both reproduce
    HF generate for the V3 router."""
    from np_modeling_tpu.serving import GenerationEngine
    model = _tiny_deepseek_v3(seed=73)
    ours_cfg, params = hf_compat.import_deepseek_v3(model)
    gpt = models.GPT(ours_cfg)
    prompt = np.random.default_rng(74).integers(0, 95, size=(1, 9))
    with torch.no_grad():
        want = model.generate(torch.from_numpy(prompt), max_new_tokens=6,
                              do_sample=False).numpy()[0, 9:]
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.generate(params, jnp.asarray(prompt, jnp.int32),
                                      steps=6))[0]
    np.testing.assert_array_equal(got, want)

    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8)
    toks = [eng.add_request(0, prompt[0])]
    for _ in range(5):
        toks.append(eng.step()[0])
    np.testing.assert_array_equal(np.asarray(toks), want)


def test_qwen3_moe_logits_and_decode_match_torch():
    """Qwen3-MoE: QK-norm attention + Mixtral-layout experts with
    RENORMALIZED top-k weights (norm_topk_prob -> softmax_norm)."""
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=91, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0, tie_word_embeddings=False,
        decoder_sparse_step=1, mlp_only_layers=[])
    torch.manual_seed(61)
    model = transformers.Qwen3MoeForCausalLM(cfg)
    model.eval()
    ours_cfg, params = hf_compat.import_qwen3_moe(model)
    assert (ours_cfg.qk_norm
            and ours_cfg.moe_router_weights == "softmax_norm"
            and ours_cfg.moe_capacity_factor is None)
    gpt = models.GPT(ours_cfg)
    tokens = np.random.default_rng(62).integers(0, 91, size=(2, 13))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=7e-4, atol=7e-4)

    prompt = np.random.default_rng(63).integers(0, 91, size=(1, 9))
    with torch.no_grad():
        want_t = model.generate(torch.from_numpy(prompt), max_new_tokens=6,
                                do_sample=False).numpy()[0, 9:]
    with jax.default_matmul_precision("highest"):
        got_t = np.asarray(gpt.generate(params,
                                        jnp.asarray(prompt, jnp.int32),
                                        steps=6))[0]
    np.testing.assert_array_equal(got_t[:len(want_t)], want_t)


def test_qwen3_moe_serves_in_engine():
    from np_modeling_tpu.serving import GenerationEngine
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=91, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0, tie_word_embeddings=False,
        decoder_sparse_step=1, mlp_only_layers=[])
    torch.manual_seed(64)
    model = transformers.Qwen3MoeForCausalLM(cfg)
    model.eval()
    ours_cfg, params = hf_compat.import_qwen3_moe(model)
    gpt = models.GPT(ours_cfg)
    prompt = np.random.default_rng(65).integers(0, 91, 11)
    want = np.asarray(gpt.generate(params, jnp.asarray(prompt)[None],
                                   steps=6))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8)
    got = [eng.add_request(0, prompt)]
    for _ in range(5):
        got.append(eng.step()[0])
    np.testing.assert_array_equal(np.asarray(got), want)


def _tiny_gpt_oss(seed=71):
    cfg = transformers.GptOssConfig(
        vocab_size=89, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8, max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0, tie_word_embeddings=False,
        rope_theta=10000.0, attention_bias=True,
        layer_types=["sliding_attention", "full_attention"] * 2,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 16,
                      "beta_fast": 32, "beta_slow": 1},
        attn_implementation="eager")
    torch.manual_seed(seed)
    model = transformers.GptOssForCausalLM(cfg)
    model.eval()
    return model


def test_gpt_oss_logits_match_torch():
    """gpt-oss: attention sinks (post-kernel sigmoid(lse - sink) rescale),
    alternating sliding/full attention, biased projections under the RoPE
    permutation, YaRN, biased router with topk-then-softmax weights, and
    clamped-GLU experts (interleaved gate/up deinterleaved)."""
    model = _tiny_gpt_oss()
    ours_cfg, params = hf_compat.import_gpt_oss(model)
    assert (ours_cfg.attn_sinks and ours_cfg.window_pattern == 2
            and ours_cfg.moe_router_weights == "topk_softmax"
            and ours_cfg.ffn == "glu_clamp"
            and ours_cfg.rope_scaling[0] == "yarn")
    gpt = models.GPT(ours_cfg)
    tokens = np.random.default_rng(72).integers(0, 89, size=(2, 13))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=7e-4, atol=7e-4)


def test_gpt_oss_decode_and_engine_match():
    """Cached decode == full-forward argmax at every step (the forward is
    HF-parity above; this tiny random model has near-tie argmax margins
    down to ~1e-3, so cross-implementation token equality vs HF generate
    is not a meaningful oracle), and the paged engine == generate."""
    model = _tiny_gpt_oss(seed=73)
    ours_cfg, params = hf_compat.import_gpt_oss(model)
    gpt = models.GPT(ours_cfg)
    prompt = np.random.default_rng(74).integers(0, 89, size=(1, 9))
    with jax.default_matmul_precision("highest"):
        got = np.asarray(gpt.generate(params, jnp.asarray(prompt, jnp.int32),
                                      steps=8))[0]
        cur = jnp.asarray(prompt, jnp.int32)
        for t in range(8):
            nxt = int(jnp.argmax(gpt.apply(params, cur)[0, -1]))
            assert nxt == got[t], (t, nxt, got)
            cur = jnp.concatenate([cur, jnp.full((1, 1), nxt, cur.dtype)],
                                  axis=1)

    from np_modeling_tpu.serving import GenerationEngine
    want = np.asarray(gpt.generate(params, jnp.asarray(prompt, jnp.int32),
                                   steps=8))[0]
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=8)
    toks = [eng.add_request(0, prompt[0])]
    for _ in range(7):
        toks.append(eng.step()[0])
    np.testing.assert_array_equal(np.asarray(toks), want)
