"""Paged decode attention: kernel (interpret mode) vs oracle; KV page manager."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import ops
from np_modeling_tpu.ops import dispatch
from np_modeling_tpu.serving import PagedKVCache
from np_modeling_tpu.serving.kv_cache import OutOfPagesError
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(0)


def _setup(b=3, hq=4, hkv=2, d=16, psize=8, pages_per_seq=4, total=32):
    q = jnp.asarray(rand(b, hq, d, rng=rng))
    k_pages = jnp.asarray(rand(hkv, total, psize, d, rng=rng))
    v_pages = jnp.asarray(rand(hkv, total, psize, d, rng=rng))
    # Each sequence gets distinct pages in scrambled order + ragged lengths.
    perm = rng.permutation(total)[:b * pages_per_seq]
    page_indices = jnp.asarray(perm.reshape(b, pages_per_seq).astype(np.int32))
    lengths = jnp.asarray(
        rng.integers(1, pages_per_seq * psize + 1, b).astype(np.int32))
    return q, k_pages, v_pages, lengths, page_indices


class TestPagedKernel:
    def test_oracle_vs_dense_attention(self):
        # The oracle itself must equal plain masked attention on the
        # gathered cache.
        q, k_pages, v_pages, lengths, page_indices = _setup()
        out = ops.paged_attention_reference(q, k_pages, v_pages, lengths,
                                            page_indices)
        b, hq, d = q.shape
        hkv = k_pages.shape[0]
        psize = k_pages.shape[2]
        max_len = page_indices.shape[1] * psize
        for i in range(b):
            k_seq = k_pages[:, page_indices[i]].reshape(hkv, max_len, d)
            v_seq = v_pages[:, page_indices[i]].reshape(hkv, max_len, d)
            mask = (jnp.arange(max_len) < lengths[i])[None, None, None, :]
            ref = ops.attention_reference(q[i][None, :, None, :],
                                          k_seq[None], v_seq[None], mask=mask)
            assert_allclose(out[i], ref[0, :, 0], rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("fold", [False, True])
    @pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
    def test_kernel_vs_oracle(self, hq, hkv, fold):
        q, k_pages, v_pages, lengths, page_indices = _setup(hq=hq, hkv=hkv)
        with dispatch.force_pallas(True, interpret=True):
            out = ops.paged_attention(q, k_pages, v_pages, lengths,
                                      page_indices, fold_heads=fold)
        ref = ops.paged_attention_reference(q, k_pages, v_pages, lengths,
                                            page_indices)
        assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("window", [3, 8, 20])
    def test_kernel_window_vs_oracle(self, window):
        # Sliding-window decode: kernel block skipping + in-block band mask
        # must match the reference (and the reference must match a dense
        # windowed attention).
        q, k_pages, v_pages, lengths, page_indices = _setup()
        with dispatch.force_pallas(True, interpret=True):
            out = ops.paged_attention(q, k_pages, v_pages, lengths,
                                      page_indices, window=window,
                                      pages_per_block=2)
        ref = ops.paged_attention_reference(q, k_pages, v_pages, lengths,
                                            page_indices, window=window)
        assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
        # Window restricted to the last W tokens: shrinking the cache to
        # exactly those tokens must give the same answer.
        b = q.shape[0]
        psize = k_pages.shape[2]
        max_len = page_indices.shape[1] * psize
        for i in range(int(b)):
            k_seq = k_pages[:, page_indices[i]].reshape(
                k_pages.shape[0], max_len, -1)
            v_seq = v_pages[:, page_indices[i]].reshape(
                v_pages.shape[0], max_len, -1)
            lo = max(0, int(lengths[i]) - window)
            mask = jnp.zeros((max_len,), bool).at[lo:int(lengths[i])].set(
                True)[None, None, None, :]
            dense = ops.attention_reference(q[i][None, :, None, :],
                                            k_seq[None], v_seq[None],
                                            mask=mask)
            assert_allclose(ref[i], dense[0, :, 0], rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("fold", [False, True])
    @pytest.mark.parametrize("window", [3, 8, 20])
    def test_kernel_window_vs_oracle_folded(self, window, fold):
        # Folded-vs-unfolded parity on the sliding-window path.
        q, k_pages, v_pages, lengths, page_indices = _setup()
        with dispatch.force_pallas(True, interpret=True):
            out = ops.paged_attention(q, k_pages, v_pages, lengths,
                                      page_indices, window=window,
                                      pages_per_block=2, fold_heads=fold)
        ref = ops.paged_attention_reference(q, k_pages, v_pages, lengths,
                                            page_indices, window=window)
        assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("fold", [False, True])
    def test_kernel_quantized_folded(self, fold):
        from np_modeling_tpu.ops.quantization import quantize_int8
        q, k_pages, v_pages, lengths, page_indices = _setup(hq=8, hkv=2)
        kq, vq = quantize_int8(k_pages), quantize_int8(v_pages)
        want = ops.paged_attention_reference(
            q, kq.values.astype(jnp.float32) * kq.scales,
            vq.values.astype(jnp.float32) * vq.scales, lengths, page_indices)
        with dispatch.force_pallas(True, interpret=True):
            got = ops.paged_attention(q, kq.values, vq.values, lengths,
                                      page_indices, k_scales=kq.scales,
                                      v_scales=vq.scales, pages_per_block=2,
                                      fold_heads=fold)
        assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("hq,hkv,sq", [(4, 4, 1), (8, 2, 1), (4, 2, 3)])
    def test_kernel_bias_vs_oracle(self, hq, hkv, sq):
        # Additive position bias (the serving form of T5 relpos bias):
        # kernel == oracle for single- and multi-token q, incl. GQA.
        q, k_pages, v_pages, lengths, page_indices = _setup(hq=hq, hkv=hkv)
        b, _, d = q.shape
        max_len = page_indices.shape[1] * k_pages.shape[2]
        if sq > 1:
            q = jnp.asarray(rand(b, sq, hq, d, rng=rng))
            lengths = jnp.maximum(lengths, sq)
            bias = jnp.asarray(rand(b, hq, sq, max_len, rng=rng))
        else:
            bias = jnp.asarray(rand(b, hq, max_len, rng=rng))
        with dispatch.force_pallas(True, interpret=True):
            out = ops.paged_attention(q, k_pages, v_pages, lengths,
                                      page_indices, bias=bias,
                                      pages_per_block=2)
        ref = ops.paged_attention_reference(q, k_pages, v_pages, lengths,
                                            page_indices, bias=bias)
        assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_bias_oracle_vs_dense(self):
        # The biased oracle must equal dense masked attention with the
        # same additive scores.
        q, k_pages, v_pages, lengths, page_indices = _setup(hq=2, hkv=2)
        b, hq, d = q.shape
        psize = k_pages.shape[2]
        max_len = page_indices.shape[1] * psize
        bias = jnp.asarray(rand(b, hq, max_len, rng=rng))
        out = ops.paged_attention_reference(q, k_pages, v_pages, lengths,
                                            page_indices, bias=bias)
        for i in range(b):
            k_seq = k_pages[:, page_indices[i]].reshape(hq, max_len, d)
            v_seq = v_pages[:, page_indices[i]].reshape(hq, max_len, d)
            s = jnp.einsum("hd,hkd->hk", q[i], k_seq) / np.sqrt(d)
            s = s + bias[i]
            s = jnp.where(jnp.arange(max_len) < lengths[i], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            dense = jnp.einsum("hk,hkd->hd", p, v_seq)
            assert_allclose(out[i], dense, rtol=2e-5, atol=2e-5)

    def test_kernel_page_sized_lengths(self):
        q, k_pages, v_pages, _, page_indices = _setup()
        lengths = jnp.asarray([8, 16, 32], jnp.int32)  # exact page multiples
        with dispatch.force_pallas(True, interpret=True):
            out = ops.paged_attention(q, k_pages, v_pages, lengths,
                                      page_indices)
        ref = ops.paged_attention_reference(q, k_pages, v_pages, lengths,
                                            page_indices)
        assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


class TestPagedKVCache:
    def test_append_and_attend(self):
        cache = PagedKVCache(num_kv_heads=2, head_dim=16, total_pages=16,
                             page_size=4, max_seqs=4)
        cache.allocate(0)
        cache.allocate(1)
        k0 = jnp.asarray(rand(2, 10, 16, rng=rng))
        v0 = jnp.asarray(rand(2, 10, 16, rng=rng))
        k1 = jnp.asarray(rand(2, 3, 16, rng=rng))
        v1 = jnp.asarray(rand(2, 3, 16, rng=rng))
        cache.append(0, k0, v0)
        cache.append(1, k1, v1)
        assert cache.length(0) == 10 and cache.length(1) == 3

        lengths, tables = cache.batch_views([0, 1])
        q = jnp.asarray(rand(2, 4, 16, rng=rng))
        out = ops.paged_attention(q, cache.k_pages, cache.v_pages, lengths,
                                  tables)
        # Oracle: dense attention on the raw appended K/V.
        for i, (kk, vv, ln) in enumerate([(k0, v0, 10), (k1, v1, 3)]):
            ref = ops.attention_reference(
                q[i][None, :, None, :], kk[None], vv[None])
            assert_allclose(out[i], ref[0, :, 0], rtol=2e-5, atol=2e-5)

    def test_incremental_append_across_page_boundary(self):
        cache = PagedKVCache(num_kv_heads=1, head_dim=8, total_pages=8,
                             page_size=4, max_seqs=1)
        cache.allocate(0)
        ks, vs = [], []
        for i in range(7):  # crosses a page boundary at 4
            k = jnp.asarray(rand(1, 1, 8, rng=rng))
            v = jnp.asarray(rand(1, 1, 8, rng=rng))
            cache.append(0, k, v)
            ks.append(k)
            vs.append(v)
        lengths, tables = cache.batch_views([0])
        q = jnp.asarray(rand(1, 2, 8, rng=rng))
        out = ops.paged_attention(q, cache.k_pages, cache.v_pages, lengths,
                                  tables)
        ref = ops.attention_reference(
            q[0][None, :, None, :], jnp.concatenate(ks, 1)[None],
            jnp.concatenate(vs, 1)[None])
        assert_allclose(out[0], ref[0, :, 0], rtol=2e-5, atol=2e-5)

    def test_free_returns_pages(self):
        cache = PagedKVCache(num_kv_heads=1, head_dim=8, total_pages=2,
                             page_size=4, max_seqs=2)
        cache.allocate(0)
        cache.append(0, jnp.ones((1, 8, 8)), jnp.ones((1, 8, 8)))
        assert cache.free_pages == 0
        cache.allocate(1)
        with pytest.raises(OutOfPagesError):
            cache.append(1, jnp.ones((1, 1, 8)), jnp.ones((1, 1, 8)))
        cache.free(0)
        assert cache.free_pages == 2
        cache.append(1, jnp.ones((1, 1, 8)), jnp.ones((1, 1, 8)))
        assert cache.length(1) == 1


class TestMultiTokenQueries:
    """4-D q: speculative-verify / chunked-append path. Query token t sits
    at position lengths - sq + t and attends causally to its own prefix."""

    def _setup4(self, sq, b=3, hq=4, hkv=2, d=16, psize=8, pages_per_seq=4,
                total=32, min_len=None):
        q = jnp.asarray(rand(b, sq, hq, d, rng=rng))
        k_pages = jnp.asarray(rand(hkv, total, psize, d, rng=rng))
        v_pages = jnp.asarray(rand(hkv, total, psize, d, rng=rng))
        perm = rng.permutation(total)[:b * pages_per_seq]
        page_indices = jnp.asarray(
            perm.reshape(b, pages_per_seq).astype(np.int32))
        lo = min_len if min_len is not None else sq
        lengths = jnp.asarray(
            rng.integers(lo, pages_per_seq * psize + 1, b).astype(np.int32))
        return q, k_pages, v_pages, lengths, page_indices

    def test_oracle_vs_flash_attention(self):
        """Multi-token oracle == dense causal attention on the gathered
        cache (per sequence, via attention_reference on the full prefix)."""
        sq = 4
        q, k_pages, v_pages, lengths, page_indices = self._setup4(sq)
        out = ops.paged_attention_reference(q, k_pages, v_pages, lengths,
                                            page_indices)
        b, _, hq, d = q.shape
        hkv, _, psize, _ = k_pages.shape
        for i in range(int(b)):
            L = int(lengths[i])
            kf = k_pages[:, page_indices[i]].reshape(hkv, -1, d)[:, :L]
            vf = v_pages[:, page_indices[i]].reshape(hkv, -1, d)[:, :L]
            # Build the full query sequence: zeros for the cached prefix,
            # the real q rows at the last sq positions, then causal attn.
            qfull = jnp.zeros((1, hq, L, d))
            qfull = qfull.at[0, :, L - sq:].set(
                jnp.moveaxis(q[i], 0, 1))
            ref = ops.attention_reference(qfull, kf[None], vf[None],
                                          causal=True)
            assert_allclose(out[i], jnp.moveaxis(ref[0, :, L - sq:], 0, 1),
                            rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("sq,hq,hkv", [(2, 4, 4), (4, 4, 2), (8, 8, 2)])
    def test_kernel_vs_oracle(self, sq, hq, hkv):
        q, k_pages, v_pages, lengths, page_indices = self._setup4(
            sq, hq=hq, hkv=hkv)
        want = ops.paged_attention_reference(q, k_pages, v_pages, lengths,
                                             page_indices)
        with dispatch.force_pallas(True, interpret=True):
            got = ops.paged_attention(q, k_pages, v_pages, lengths,
                                      page_indices, pages_per_block=2)
        assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_kernel_window_vs_oracle(self):
        sq, window = 3, 5
        q, k_pages, v_pages, lengths, page_indices = self._setup4(
            sq, min_len=8)
        want = ops.paged_attention_reference(q, k_pages, v_pages, lengths,
                                             page_indices, window=window)
        with dispatch.force_pallas(True, interpret=True):
            got = ops.paged_attention(q, k_pages, v_pages, lengths,
                                      page_indices, window=window,
                                      pages_per_block=2)
        assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_sq1_matches_3d_api(self):
        q, k_pages, v_pages, lengths, page_indices = _setup()
        with dispatch.force_pallas(True, interpret=True):
            old = ops.paged_attention(q, k_pages, v_pages, lengths,
                                      page_indices, pages_per_block=2)
            new = ops.paged_attention(q[:, None], k_pages, v_pages, lengths,
                                      page_indices, pages_per_block=2)
        assert_allclose(new[:, 0], old, rtol=1e-6, atol=1e-6)

    def test_quantized_multitoken(self):
        from np_modeling_tpu.ops.quantization import quantize_int8
        sq = 4
        q, k_pages, v_pages, lengths, page_indices = self._setup4(sq)
        kq, vq = quantize_int8(k_pages), quantize_int8(v_pages)
        want = ops.paged_attention_reference(
            q, kq.values.astype(jnp.float32) * kq.scales,
            vq.values.astype(jnp.float32) * vq.scales,
            lengths, page_indices)
        with dispatch.force_pallas(True, interpret=True):
            got = ops.paged_attention(q, kq.values, vq.values, lengths,
                                      page_indices, k_scales=kq.scales,
                                      v_scales=vq.scales,
                                      pages_per_block=2)
        assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("fold", [False, True])
def test_paged_sinks_match_reference_folded(fold):
    """Sinks through BOTH kernel grids (head-folded and unfolded)."""
    import importlib
    P = importlib.import_module("np_modeling_tpu.ops.paged_attention")
    r = np.random.default_rng(93)
    hkv, pages, psize, d = 2, 8, 4, 32
    hq, b = 4, 3
    k_pages = jnp.asarray(r.standard_normal((hkv, pages, psize, d)),
                          jnp.float32)
    v_pages = jnp.asarray(r.standard_normal((hkv, pages, psize, d)),
                          jnp.float32)
    table = jnp.asarray(np.arange(b * 2).reshape(b, 2) % pages, jnp.int32)
    lengths = jnp.asarray([7, 3, 5], jnp.int32)
    q = jnp.asarray(r.standard_normal((b, hq, d)), jnp.float32)
    sinks = jnp.asarray(r.standard_normal(hq), jnp.float32)
    want = P.paged_attention_reference(q, k_pages, v_pages, lengths, table,
                                       sinks=sinks)
    with dispatch.force_pallas(True, interpret=True):
        got = P.paged_attention(q, k_pages, v_pages, lengths, table,
                                sinks=sinks, pages_per_block=2,
                                fold_heads=fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=2e-5)


def test_paged_sinks_match_reference():
    """gpt-oss sinks through the paged decode kernel: the sink joins the
    denominator at _store (l + exp(sink - m)), per-row token-major."""
    from np_modeling_tpu.ops import dispatch
    import importlib
    P = importlib.import_module("np_modeling_tpu.ops.paged_attention")
    r = np.random.default_rng(91)
    hkv, pages, psize, d = 2, 8, 4, 32
    hq, b = 4, 3
    k_pages = jnp.asarray(r.standard_normal((hkv, pages, psize, d)),
                          jnp.float32)
    v_pages = jnp.asarray(r.standard_normal((hkv, pages, psize, d)),
                          jnp.float32)
    table = jnp.asarray(r.permuted(np.arange(pages))[:6].reshape(3, 2)
                        % pages, jnp.int32)
    lengths = jnp.asarray([7, 3, 5], jnp.int32)
    q = jnp.asarray(r.standard_normal((b, hq, d)), jnp.float32)
    sinks = jnp.asarray(r.standard_normal(hq), jnp.float32)
    want = P.paged_attention_reference(q, k_pages, v_pages, lengths, table,
                                       sinks=sinks)
    with dispatch.force_pallas(True, interpret=True):
        got = P.paged_attention(q, k_pages, v_pages, lengths, table,
                                sinks=sinks, pages_per_block=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=2e-5)
    # And the sink actually changes the output.
    base = P.paged_attention_reference(q, k_pages, v_pages, lengths, table)
    assert np.abs(np.asarray(want) - np.asarray(base)).max() > 1e-3


def test_paged_sinks_multi_token_queries():
    """4-D (multi-token) q with sinks: exercises the token-major rows_sink
    fold (row t*g + j -> head h*g + j), which a single-token query cannot
    distinguish from a g-major layout — this is the layout speculative
    verify and chunked prefill ride."""
    from np_modeling_tpu.ops import dispatch
    import importlib
    P = importlib.import_module("np_modeling_tpu.ops.paged_attention")
    r = np.random.default_rng(92)
    hkv, pages, psize, d = 2, 8, 4, 32
    hq, b, t = 4, 2, 3
    k_pages = jnp.asarray(r.standard_normal((hkv, pages, psize, d)),
                          jnp.float32)
    v_pages = jnp.asarray(r.standard_normal((hkv, pages, psize, d)),
                          jnp.float32)
    table = jnp.asarray(np.arange(b * 3).reshape(b, 3) % pages, jnp.int32)
    lengths = jnp.asarray([9, 6], jnp.int32)     # includes the t new slots
    q = jnp.asarray(r.standard_normal((b, t, hq, d)), jnp.float32)
    # DISTINCT per-head sinks so a head<->group transpose cannot cancel.
    sinks = jnp.asarray(np.array([3.0, -2.0, 0.5, 5.0]), jnp.float32)
    want = P.paged_attention_reference(q, k_pages, v_pages, lengths, table,
                                       sinks=sinks)
    with dispatch.force_pallas(True, interpret=True):
        got = P.paged_attention(q, k_pages, v_pages, lengths, table,
                                sinks=sinks, pages_per_block=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=2e-5)
