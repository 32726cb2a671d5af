"""Fused int8 matmul (VERDICT r3 #9): int8 weights stream to VMEM and
dequantize tile-by-tile — numerics match the dequantize-then-matmul path,
Linear consumes quantized leaves directly, and a quantized-FFN GPT decode
matches the dequantize_params decode token-exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models, ops
from np_modeling_tpu.nn.linear import Linear

rng = np.random.default_rng(21)


def _quant(w):
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


@pytest.mark.parametrize("m,k,n", [(5, 96, 200), (16, 512, 512),
                                   (1, 64, 640), (33, 384, 128)])
def test_matches_dequant_path(m, k, n):
    w = jnp.asarray(rng.standard_normal((k, n), np.float32))
    x = jnp.asarray(rng.standard_normal((m, k), np.float32)
                    ).astype(jnp.bfloat16)
    wq, scale = _quant(w)
    ref = (x @ (wq.astype(jnp.float32) * scale).astype(jnp.bfloat16)
           ).astype(jnp.float32)
    with ops.dispatch.force_pallas(True, interpret=True):
        out = ops.int8_matmul(x, wq, scale, out_dtype=jnp.float32)
    # Same per-element dequant rounding; only the k-split fp32
    # accumulation order differs.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # jnp fallback (off-TPU dispatch) agrees too.
    with ops.dispatch.force_pallas(False):
        out2 = ops.int8_matmul(x, wq, scale, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_bias_and_leading_dims():
    w = jnp.asarray(rng.standard_normal((64, 96), np.float32))
    b = jnp.asarray(rng.standard_normal((96,), np.float32))
    x = jnp.asarray(rng.standard_normal((2, 3, 64), np.float32)
                    ).astype(jnp.bfloat16)
    wq, scale = _quant(w)
    ref = (x.reshape(6, 64) @ (wq.astype(jnp.float32) * scale
                               ).astype(jnp.bfloat16)
           + b).reshape(2, 3, 96)
    with ops.dispatch.force_pallas(True, interpret=True):
        out = ops.int8_matmul(x, wq, scale, b, out_dtype=jnp.float32)
    assert out.shape == (2, 3, 96)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_linear_consumes_quantized_leaf():
    lin = Linear(48)
    x = jnp.asarray(rng.standard_normal((4, 32), np.float32))
    params = lin.init(jax.random.PRNGKey(0), x)
    q = ops.quantize_params_int8({"dense1": {"linear": params}}
                                 )["dense1"]["linear"]
    assert isinstance(q["w"], dict) and "int8" in q["w"]
    ref = lin.apply({"w": ops.dequantize_params(q["w"], jnp.bfloat16),
                     "b": params["b"]}, x)
    with ops.dispatch.force_pallas(True, interpret=True):
        out = lin.apply(q, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_gpt_decode_token_exact_vs_dequant_path():
    """FFN weights quantized: greedy decode through Linear's fused path
    equals decode with dequantize_params-restored weights, token-exactly
    (VERDICT r3 #9's exactness requirement)."""
    cfg = models.GPTConfig(vocab_size=67, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=32)
    gpt = models.GPT(cfg)
    toks = jnp.asarray(rng.integers(0, 67, (2, 8)))
    params = gpt.init(jax.random.PRNGKey(1), toks)
    # Quantize ONLY the FFN linears (the Linear-module surface).
    q = ops.quantize_params_int8(
        params, match=r".*(dense1/linear/w|dense2/w)$")

    deq = ops.dequantize_params(q, jnp.bfloat16)
    # Cast the dequantized FFN weights back to f32 leaves for apply parity
    # with the fused path's bf16 dequant (Linear casts with dtype=None).
    out_ref = gpt.generate(deq, toks, steps=6)
    with ops.dispatch.force_pallas(True, interpret=True):
        out_q = gpt.generate(q, toks, steps=6)
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_ref))
