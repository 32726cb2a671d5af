"""Weight-only int8 params: roundtrip accuracy, model closeness, byte size."""

import numpy as np

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, ops


def _gpt():
    cfg = models.GPTConfig(vocab_size=67, d_model=64, num_heads=4,
                           num_layers=2, hidden_units=128, max_len=32)
    gpt = models.GPT(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0, 67)
    params = gpt.init(jax.random.PRNGKey(1), toks)
    return gpt, params, toks


def test_roundtrip_error_is_small():
    gpt, params, _ = _gpt()
    q = ops.quantize_params_int8(params)
    back = ops.dequantize_params(q, dtype=jnp.float32)
    w = np.asarray(params["layer_0"]["self_attention"]["wq"])
    w2 = np.asarray(back["layer_0"]["self_attention"]["wq"])
    rel = np.abs(w - w2).max() / np.abs(w).max()
    assert rel < 0.01  # int8 absmax: max error ~ scale/2 ~ 0.4% of absmax


def test_unmatched_leaves_pass_through():
    _, params, _ = _gpt()
    q = ops.quantize_params_int8(params)
    # Embedding and norms are untouched (same arrays).
    np.testing.assert_array_equal(np.asarray(q["embedding"]["table"]),
                                  np.asarray(params["embedding"]["table"]))
    np.testing.assert_array_equal(
        np.asarray(q["final_norm"]["gamma"]),
        np.asarray(params["final_norm"]["gamma"]))
    # Matched leaves are int8 with per-output-channel scales.
    wq = q["layer_0"]["self_attention"]["wq"]
    assert wq["int8"].dtype == jnp.int8
    # Per-(head, dk) scales: reduce over the contraction axis only.
    assert wq["scale"].shape == (
        1, *params["layer_0"]["self_attention"]["wq"].shape[1:])


def test_quantized_model_close_and_smaller():
    gpt, params, toks = _gpt()
    q = ops.quantize_params_int8(params)

    @jax.jit
    def qlogits(q, toks):
        return gpt.apply(ops.dequantize_params(q, jnp.float32), toks)

    full = np.asarray(gpt.apply(params, toks))
    quant = np.asarray(qlogits(q, toks))
    # Loose closeness: logits shift a little, ranking mostly preserved.
    assert np.abs(full - quant).max() < 0.15 * np.abs(full).max()
    agree = (full.argmax(-1) == quant.argmax(-1)).mean()
    assert agree > 0.9

    def nbytes(t):
        return sum(x.nbytes for x in jax.tree_util.tree_leaves(t))

    # Matched weights drop 4x (fp32 -> int8); whole tree strictly smaller.
    assert nbytes(q) < 0.7 * nbytes(params)


def test_quantized_decode_runs():
    gpt, params, toks = _gpt()
    q = ops.quantize_params_int8(params)
    deq = ops.dequantize_params(q, jnp.float32)
    out = gpt.generate(deq, toks[:, :6], steps=4)
    assert out.shape == (2, 4)
    assert (np.asarray(out) < 67).all()


def test_swiglu_weights_are_quantized():
    # ADVICE r2: swiglu/geglu FFN weights (w_gate/w_up/w_down) must match
    # WEIGHT_QUANT_TARGETS — LLaMA-family imports keep ~2/3 of their
    # transformer weights in the FFN.
    cfg = models.GPTConfig(vocab_size=67, d_model=64, num_heads=4,
                           num_layers=2, hidden_units=128, max_len=32,
                           ffn="swiglu", norm="rms", use_bias=False,
                           positional="rope")
    gpt = models.GPT(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0, 67)
    params = gpt.init(jax.random.PRNGKey(1), toks)
    q = ops.quantize_params_int8(params)
    for name in ("w_gate", "w_up", "w_down"):
        leaf = q["layer_0"]["swiglu"][name]
        assert isinstance(leaf, dict) and leaf["int8"].dtype == jnp.int8, name
        assert leaf["scale"].shape == (1, params["layer_0"]["swiglu"][name].shape[1])
    # And the quantized model still runs close to the original.
    deq = ops.dequantize_params(q, jnp.float32)
    full = np.asarray(gpt.apply(params, toks))
    quant = np.asarray(gpt.apply(deq, toks))
    assert np.abs(full - quant).max() < 0.15 * np.abs(full).max()


class TestInt4:
    """Nibble-packed group-scaled int4 weights."""

    def test_roundtrip_error_bounded(self):
        gpt, params, _ = _gpt()
        q = ops.quantize_params_int4(params, group=32)
        back = ops.dequantize_params(q, dtype=jnp.float32)
        w = np.asarray(params["layer_0"]["self_attention"]["wq"])
        w2 = np.asarray(back["layer_0"]["self_attention"]["wq"])
        # int4 absmax per group: |err| <= scale/2 = groupmax/14.
        g = np.abs(w.reshape(2, 32, 4, 16)).max(axis=1, keepdims=True)
        assert (np.abs(w - w2).reshape(2, 32, 4, 16) <= g / 14 + 1e-7).all()

    def test_packing_layout(self):
        gpt, params, _ = _gpt()
        q = ops.quantize_params_int4(params, group=32)
        wq = q["layer_0"]["self_attention"]["wq"]
        orig = params["layer_0"]["self_attention"]["wq"]
        assert wq["int4"].dtype == jnp.int8
        assert wq["int4"].shape == (orig.shape[0] // 2, *orig.shape[1:])
        assert wq["scale"].shape == (orig.shape[0] // 32, 1, *orig.shape[1:])
        # 8x smaller than fp32 at rest (packed nibbles), plus small scales.
        assert wq["int4"].nbytes == orig.nbytes // 8

    def test_exact_for_representable_values(self):
        # Weights already on an int4 grid survive the roundtrip exactly.
        rng2 = np.random.default_rng(0)
        w = rng2.integers(-7, 8, (128, 64)).astype(np.float32) * 0.01
        fake = {"lm_head": {"w": jnp.asarray(w)}}
        q = ops.quantize_params_int4(fake, group=64)
        back = ops.dequantize_params(q, jnp.float32)
        np.testing.assert_allclose(np.asarray(back["lm_head"]["w"]), w,
                                   rtol=0, atol=1e-6)

    def test_quantized_model_close(self):
        gpt, params, toks = _gpt()
        q = ops.quantize_params_int4(params, group=32)

        @jax.jit
        def qlogits(q, toks):
            return gpt.apply(ops.dequantize_params(q, jnp.float32), toks)

        full = np.asarray(gpt.apply(params, toks))
        quant = np.asarray(qlogits(q, toks))
        assert np.abs(full - quant).max() < 0.25 * np.abs(full).max()
        agree = (full.argmax(-1) == quant.argmax(-1)).mean()
        assert agree > 0.8

    def test_ungroupable_leaves_kept_fp(self):
        # axis-0 size not divisible by the group -> leaf passes through.
        fake = {"lm_head": {"w": jnp.ones((100, 64))}}
        q = ops.quantize_params_int4(fake, group=64)
        assert isinstance(q["lm_head"]["w"], jax.Array)

    def test_decode_runs(self):
        gpt, params, toks = _gpt()
        q = ops.quantize_params_int4(params, group=32)
        deq = ops.dequantize_params(q, jnp.float32)
        out = gpt.generate(deq, toks[:, :6], steps=4)
        assert out.shape == (2, 4)
