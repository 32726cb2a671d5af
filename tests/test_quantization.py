"""Int8 quantization ops + quantized paged KV cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import ops
from np_modeling_tpu.ops import dispatch
from np_modeling_tpu.ops.quantization import (dequantize_int8, quantize_int8,
                                              quantize_int8_stochastic)
from np_modeling_tpu.serving import PagedKVCache
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(0)


class TestQuantizeInt8:
    def test_roundtrip_error_bound(self):
        x = jnp.asarray(rand(32, 128, rng=rng))
        qt = quantize_int8(x)
        assert qt.values.dtype == jnp.int8
        back = dequantize_int8(qt)
        # Max error is half a quantization step = absmax/254 per row.
        step = np.abs(np.asarray(x)).max(axis=1, keepdims=True) / 127.0
        assert (np.abs(np.asarray(back - x)) <= step / 2 + 1e-7).all()

    def test_zero_rows_safe(self):
        x = jnp.zeros((4, 16))
        qt = quantize_int8(x)
        assert_allclose(dequantize_int8(qt), x, rtol=0, atol=0)

    def test_stochastic_falls_back_off_tpu(self):
        x = jnp.asarray(rand(8, 64, rng=rng))
        qt = quantize_int8_stochastic(x, jnp.asarray([1], jnp.int32))
        back = dequantize_int8(qt)
        step = np.abs(np.asarray(x)).max(axis=1, keepdims=True) / 127.0
        assert (np.abs(np.asarray(back - x)) <= step + 1e-7).all()


class TestQuantizedPagedAttention:
    def test_kernel_matches_dequantized_oracle(self):
        b, hq, hkv, d, psize, pps, total = 2, 4, 2, 16, 8, 4, 16
        q = jnp.asarray(rand(b, hq, d, rng=rng))
        k = jnp.asarray(rand(hkv, total, psize, d, rng=rng))
        v = jnp.asarray(rand(hkv, total, psize, d, rng=rng))
        kq = quantize_int8(k)
        vq = quantize_int8(v)
        pi = jnp.asarray(rng.permutation(total)[:b * pps]
                         .reshape(b, pps).astype(np.int32))
        lengths = jnp.asarray([13, 30], jnp.int32)
        with dispatch.force_pallas(True, interpret=True):
            out = ops.paged_attention(q, kq.values, vq.values, lengths, pi,
                                      k_scales=kq.scales, v_scales=vq.scales)
        ref = ops.paged_attention_reference(
            q, dequantize_int8(kq), dequantize_int8(vq), lengths, pi)
        assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_quantized_cache_end_to_end(self):
        cache = PagedKVCache(num_kv_heads=2, head_dim=32, total_pages=8,
                             page_size=4, max_seqs=2, quantize=True)
        cache.allocate(0)
        k0 = jnp.asarray(rand(2, 9, 32, rng=rng))
        v0 = jnp.asarray(rand(2, 9, 32, rng=rng))
        cache.append(0, k0, v0)
        assert cache.k_pages.dtype == jnp.int8
        lengths, tables = cache.batch_views([0])
        q = jnp.asarray(rand(1, 4, 32, rng=rng))
        out = ops.paged_attention(q, cache.k_pages, cache.v_pages, lengths,
                                  tables, **cache.attention_kwargs())
        ref = ops.attention_reference(q[0][None, :, None, :], k0[None],
                                      v0[None])
        # int8 KV: compare at quantization-level tolerance.
        assert_allclose(out[0], ref[0, :, 0], rtol=0.05, atol=0.05)
