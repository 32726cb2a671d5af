"""Pallas tiled matmul kernel (interpret mode) vs jnp dot."""

import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu.ops import dispatch
from np_modeling_tpu.ops.matmul import matmul
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(3)


@pytest.mark.parametrize("m,k,n", [
    (128, 128, 128),          # single tile
    (256, 512, 384),          # multi-tile all dims
    (100, 70, 50),            # ragged -> padding path
    (8, 1024, 8),             # skinny
])
def test_matmul_vs_jnp(m, k, n):
    a = jnp.asarray(rand(m, k, rng=rng))
    b = jnp.asarray(rand(k, n, rng=rng))
    with dispatch.force_pallas(True, interpret=True):
        out = matmul(a, b, block_m=128, block_n=128, block_k=128)
    assert_allclose(out, a @ b, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("trans_a,trans_b", [(True, False), (False, True),
                                             (True, True)])
def test_transposes(trans_a, trans_b):
    m, k, n = 128, 256, 128
    a = jnp.asarray(rand(*((k, m) if trans_a else (m, k)), rng=rng))
    b = jnp.asarray(rand(*((n, k) if trans_b else (k, n)), rng=rng))
    with dispatch.force_pallas(True, interpret=True):
        out = matmul(a, b, trans_a=trans_a, trans_b=trans_b,
                            block_m=128, block_n=128, block_k=128)
    ref = (a.T if trans_a else a) @ (b.T if trans_b else b)
    assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_fused_bias():
    a = jnp.asarray(rand(130, 70, rng=rng))
    b = jnp.asarray(rand(70, 50, rng=rng))
    bias = jnp.asarray(rand(50, rng=rng))
    with dispatch.force_pallas(True, interpret=True):
        out = matmul(a, b, bias, block_m=128, block_n=128, block_k=128)
    assert_allclose(out, a @ b + bias, rtol=1e-5, atol=1e-4)


def test_bf16_inputs_fp32_accum():
    a = jnp.asarray(rand(128, 256, rng=rng)).astype(jnp.bfloat16)
    b = jnp.asarray(rand(256, 128, rng=rng)).astype(jnp.bfloat16)
    with dispatch.force_pallas(True, interpret=True):
        out = matmul(a, b, out_dtype=jnp.float32,
                            block_m=128, block_n=128, block_k=128)
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32)
    assert_allclose(out, ref, rtol=1e-5, atol=1e-4)
