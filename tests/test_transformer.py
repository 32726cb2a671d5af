"""Transformer blocks vs hand-built Flax oracle twins (reference
transformer_test.py:12-95 strategy): bind Flax weights into our block, assert
forward + gradient parity for norm_first both ways; stack/KV-cache/model
smoke tests."""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models, nn, ops, training
from np_modeling_tpu.utils import flax_compat
from np_modeling_tpu.utils.testing import assert_allclose, rand

rng = np.random.default_rng(0)


class _FlaxEncoderTwin(fnn.Module):
    """Flax twin of the reference encoder block (drop_rate=0)."""
    num_heads: int
    hidden: int
    norm_first: bool

    @fnn.compact
    def __call__(self, x):
        d = x.shape[-1]
        attn = fnn.MultiHeadDotProductAttention(self.num_heads,
                                                qkv_features=d, out_features=d)
        norm1 = fnn.LayerNorm(epsilon=1e-3, use_fast_variance=False)
        norm2 = fnn.LayerNorm(epsilon=1e-3, use_fast_variance=False)
        skip = x
        y = norm1(x) if self.norm_first else x
        y = attn(y, y)
        y = y + skip
        if not self.norm_first:
            y = norm1(y)
        skip = y
        z = norm2(y) if self.norm_first else y
        z = fnn.relu(fnn.Dense(self.hidden)(z))
        z = fnn.Dense(d)(z)
        z = z + skip
        if not self.norm_first:
            z = norm2(z)
        return z


# Library converters (reference utils.py:71-101 capability as a surface).
_bind_encoder = flax_compat.encoder_block_params_from_flax


@pytest.mark.parametrize("norm_first", [True, False])
class TestEncoderBlockVsFlax:
    def _setup(self, norm_first):
        x = jnp.asarray(rand(2, 10, 32, rng=rng))
        twin = _FlaxEncoderTwin(num_heads=4, hidden=64, norm_first=norm_first)
        fparams = twin.init(jax.random.PRNGKey(0), x)["params"]
        block = nn.TransformerEncoderBlock(num_heads=4, hidden_units=64,
                                           norm_first=norm_first)
        block.init(jax.random.PRNGKey(1), x)  # builds lazy dense2 sizing
        params = _bind_encoder(fparams)
        return x, twin, fparams, block, params

    def test_forward_parity(self, norm_first):
        x, twin, fparams, block, params = self._setup(norm_first)
        assert_allclose(block.apply(params, x),
                        twin.apply({"params": fparams}, x))

    def test_grad_parity(self, norm_first):
        x, twin, fparams, block, params = self._setup(norm_first)
        t = jnp.asarray(rand(*x.shape, rng=rng))
        gx_ref = jax.grad(
            lambda x: ops.mse(twin.apply({"params": fparams}, x), t))(x)
        gx_ours = jax.grad(lambda x: ops.mse(block.apply(params, x), t))(x)
        assert_allclose(gx_ours, gx_ref, rtol=1e-4, atol=1e-4)

        gp_ref = jax.grad(lambda p: ops.mse(
            twin.apply({"params": p}, x), t))(fparams)
        gp_ours = jax.grad(lambda p: ops.mse(block.apply(p, x), t))(params)
        assert_allclose(gp_ours["dense1"]["linear"]["w"],
                        gp_ref["Dense_0"]["kernel"], rtol=1e-4, atol=1e-4)
        assert_allclose(gp_ours["self_attention"]["wq"],
                        gp_ref["MultiHeadDotProductAttention_0"]["query"]["kernel"],
                        rtol=1e-4, atol=1e-4)
        assert_allclose(gp_ours["norm1"]["gamma"],
                        gp_ref["LayerNorm_0"]["scale"], rtol=1e-4, atol=1e-4)


class TestDecoderBlock:
    def test_forward_and_grads_finite(self):
        block = nn.TransformerDecoderBlock(num_heads=4, hidden_units=64,
                                           norm_first=True, causal=True)
        q = jnp.asarray(rand(2, 8, 32, rng=rng))
        kv = jnp.asarray(rand(2, 12, 32, rng=rng))
        params = block.init(jax.random.PRNGKey(0), q, kv)
        out = block.apply(params, q, kv)
        assert out.shape == q.shape
        # dq + dkv both flow (reference returns (dq, dkv),
        # transformer.py:183-203).
        gq, gkv = jax.grad(
            lambda q, kv: jnp.sum(block.apply(params, q, kv) ** 2),
            argnums=(0, 1))(q, kv)
        assert np.isfinite(np.asarray(gq)).all()
        assert np.isfinite(np.asarray(gkv)).all()
        assert float(jnp.sum(jnp.abs(gkv))) > 0

    def test_drop_rate_nonzero_runs(self):
        block = nn.TransformerDecoderBlock(num_heads=2, hidden_units=16,
                                           norm_first=False, drop_rate=0.2)
        q = jnp.asarray(rand(2, 6, 16, rng=rng))
        kv = jnp.asarray(rand(2, 6, 16, rng=rng))
        params = block.init(jax.random.PRNGKey(0), q, kv)
        out = block.apply(params, q, kv, training=True,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.isfinite(np.asarray(out)).all()


class TestStacksAndModels:
    def test_encoder_stack(self):
        enc = nn.TransformerEncoder(num_layers=3, num_heads=4,
                                    hidden_units=64, norm_first=True)
        x = jnp.asarray(rand(2, 10, 32, rng=rng))
        params = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(params, x)
        assert out.shape == x.shape

    def test_gpt_train_step_decreases_loss(self):
        # BASELINE.json config 5: GPT-style causal decoder + Adam.
        cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                               num_layers=2, hidden_units=64, max_len=16)
        gpt = models.GPT(cfg)
        tokens = jnp.asarray(rng.integers(0, 50, (4, 12)))
        params = gpt.init(jax.random.PRNGKey(0), tokens)
        opt = training.adam(1e-3)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            loss, grads = jax.value_and_grad(
                lambda p: gpt.loss(p, tokens))(params)
            updates, state2 = opt.update(grads, state, params)
            return training.apply_updates(params, updates), state2, loss

        losses = []
        for _ in range(15):
            params, state, loss = step(params, state)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_gpt_kv_cache_decode_matches_forward(self):
        cfg = models.GPTConfig(vocab_size=40, d_model=32, num_heads=4,
                               num_layers=2, hidden_units=64, max_len=16)
        gpt = models.GPT(cfg)
        tokens = jnp.asarray(rng.integers(0, 40, (2, 10)))
        params = gpt.init(jax.random.PRNGKey(0), tokens)
        full_logits = gpt.apply(params, tokens)

        caches = gpt.init_cache(batch=2, max_len=12)
        step_logits = []
        for i in range(10):
            lg, caches = gpt.apply(params, tokens[:, i:i + 1], caches=caches,
                                   decode=True)
            step_logits.append(lg)
        stepwise = jnp.concatenate(step_logits, axis=1)
        assert_allclose(stepwise, full_logits, rtol=1e-4, atol=1e-4)

    def test_gpt_causality(self):
        # Changing a future token must not change past logits.
        cfg = models.GPTConfig(vocab_size=40, d_model=32, num_heads=2,
                               num_layers=1, hidden_units=32, max_len=16)
        gpt = models.GPT(cfg)
        tokens = jnp.asarray(rng.integers(0, 40, (1, 8)))
        params = gpt.init(jax.random.PRNGKey(0), tokens)
        l1 = gpt.apply(params, tokens)
        tokens2 = tokens.at[0, -1].set((tokens[0, -1] + 1) % 40)
        l2 = gpt.apply(params, tokens2)
        assert_allclose(l1[:, :-1], l2[:, :-1], rtol=0, atol=0)

    def test_bert_classifier(self):
        cfg = models.BertConfig(vocab_size=60, d_model=32, num_heads=4,
                                num_layers=2, hidden_units=64, max_len=16,
                                num_classes=3)
        bert = models.BertEncoder(cfg)
        tokens = jnp.asarray(rng.integers(0, 60, (4, 12)))
        params = bert.init(jax.random.PRNGKey(0), tokens)
        logits = bert.apply(params, tokens)
        assert logits.shape == (4, 3)
        g = jax.grad(lambda p: jnp.sum(
            ops.softmax_cross_entropy_with_integer_labels(
                bert.apply(p, tokens), jnp.zeros(4, jnp.int32))))(params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)


class _FlaxDecoderTwin(fnn.Module):
    """Flax twin of the reference decoder block (drop_rate=0, pre-norm)."""
    num_heads: int
    hidden: int
    norm_first: bool

    @fnn.compact
    def __call__(self, q, kv):
        d = q.shape[-1]
        self_attn = fnn.MultiHeadDotProductAttention(
            self.num_heads, qkv_features=d, out_features=d)
        cross_attn = fnn.MultiHeadDotProductAttention(
            self.num_heads, qkv_features=d, out_features=d)
        n1 = fnn.LayerNorm(epsilon=1e-3, use_fast_variance=False)
        n2 = fnn.LayerNorm(epsilon=1e-3, use_fast_variance=False)
        n3 = fnn.LayerNorm(epsilon=1e-3, use_fast_variance=False)

        skip = q
        y = n1(q) if self.norm_first else q
        y = self_attn(y, y) + skip
        if not self.norm_first:
            y = n1(y)
        skip = y
        z = n2(y) if self.norm_first else y
        z = cross_attn(z, kv) + skip
        if not self.norm_first:
            z = n2(z)
        skip = z
        w = n3(z) if self.norm_first else z
        w = fnn.relu(fnn.Dense(self.hidden)(w))
        w = fnn.Dense(d)(w) + skip
        if not self.norm_first:
            w = n3(w)
        return w


_bind_mha = flax_compat.mha_params_from_flax


@pytest.mark.parametrize("norm_first", [True, False])
class TestDecoderBlockVsFlax:
    """Reference oracle strategy for the decoder (transformer_test.py:160-219)."""

    def _setup(self, norm_first):
        q = jnp.asarray(rand(2, 8, 32, rng=rng))
        kv = jnp.asarray(rand(2, 11, 32, rng=rng))
        twin = _FlaxDecoderTwin(num_heads=4, hidden=64, norm_first=norm_first)
        fp = twin.init(jax.random.PRNGKey(0), q, kv)["params"]
        block = nn.TransformerDecoderBlock(num_heads=4, hidden_units=64,
                                           norm_first=norm_first)
        block.init(jax.random.PRNGKey(1), q, kv)
        params = flax_compat.decoder_block_params_from_flax(fp)
        return q, kv, twin, fp, block, params

    def test_forward_parity(self, norm_first):
        q, kv, twin, fp, block, params = self._setup(norm_first)
        assert_allclose(block.apply(params, q, kv),
                        twin.apply({"params": fp}, q, kv),
                        rtol=1e-4, atol=1e-4)

    def test_grad_parity_dq_and_dkv(self, norm_first):
        # Reference decoder backward returns (dq, dkv) where dkv sums the
        # cross-attention dkey+dvalue (transformer.py:183-203); jax.grad of
        # both models gives exactly those totals.
        q, kv, twin, fp, block, params = self._setup(norm_first)
        t = jnp.asarray(rand(*q.shape, rng=rng))
        gq_ref, gkv_ref = jax.grad(
            lambda q, kv: ops.mse(twin.apply({"params": fp}, q, kv), t),
            argnums=(0, 1))(q, kv)
        gq, gkv = jax.grad(
            lambda q, kv: ops.mse(block.apply(params, q, kv), t),
            argnums=(0, 1))(q, kv)
        assert_allclose(gq, gq_ref, rtol=1e-4, atol=1e-4)
        assert_allclose(gkv, gkv_ref, rtol=1e-4, atol=1e-4)


def test_mha_layernorm_dropout_block_gradcheck():
    """BASELINE.json config #3: MHA + LayerNorm + Dropout block, fwd/bwd
    gradcheck vs jax.grad of an independent plain-jnp composition (dropout
    fixed via an explicit mask so both sides share it)."""
    x = jnp.asarray(rand(2, 10, 32, rng=rng))
    t = jnp.asarray(rand(2, 10, 32, rng=rng))
    mha = nn.MultiHeadAttention(num_heads=4)
    ln = nn.LayerNorm()
    p = {"mha": mha.init(jax.random.PRNGKey(0), x),
         "ln": ln.init(jax.random.PRNGKey(1), x)}
    keep = ops.make_dropout_mask(jax.random.PRNGKey(2), x.shape, 0.25)

    def ours(p, x):
        y = mha.apply(p["mha"], x)
        y = ops.dropout_with_mask(y, keep, 0.25)
        y = ln.apply(p["ln"], y)
        return ops.mse(y, t)

    def ref(p, x):
        # Same composition from autodiff-able primitives (no custom VJPs).
        d, h, dk = p["mha"]["wq"].shape

        def proj(w, b):
            y = x.reshape(-1, d) @ w.reshape(d, h * dk) + b.reshape(-1)
            return y.reshape(2, 10, h, dk).transpose(0, 2, 1, 3)

        qh = proj(p["mha"]["wq"], p["mha"]["bq"])
        kh = proj(p["mha"]["wk"], p["mha"]["bk"])
        vh = proj(p["mha"]["wv"], p["mha"]["bv"])
        o = ops.attention_reference(qh, kh, vh)
        o = o.transpose(0, 2, 1, 3).reshape(2, 10, h * dk)
        o = o @ p["mha"]["wo"].reshape(h * dk, d) + p["mha"]["bo"]
        o = jnp.where(keep, o / 0.75, 0.0)
        mean = jnp.mean(o, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(o - mean), axis=-1, keepdims=True)
        yhat = (o - mean) / jnp.sqrt(var + 1e-3)
        y = p["ln"]["gamma"] * yhat + p["ln"]["beta"]
        return jnp.mean((y - t) ** 2)

    np.testing.assert_allclose(float(ours(p, x)), float(ref(p, x)),
                               rtol=1e-5, atol=1e-5)
    g_ours = jax.grad(lambda p: ours(p, x))(p)
    g_ref = jax.grad(lambda p: ref(p, x))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_ours),
                    jax.tree_util.tree_leaves(g_ref)):
        assert_allclose(a, b, rtol=1e-4, atol=1e-4)


class TestBertPaddedBatch:
    def test_attention_mask_isolates_padding(self):
        """Padded-batch BERT (attention_mask, routed as in-kernel segment
        ids) must produce the same [CLS] logits as the unpadded example."""
        cfg = models.BertConfig(vocab_size=60, d_model=32, num_heads=4,
                                num_layers=2, hidden_units=64, max_len=16,
                                num_classes=3)
        bert = models.BertEncoder(cfg)
        short = jnp.asarray(rng.integers(0, 60, (1, 7)))
        params = bert.init(jax.random.PRNGKey(0), short)
        ref = bert.apply(params, short)
        # Pad to length 12 with junk tokens + attention_mask.
        padded = jnp.concatenate(
            [short, jnp.full((1, 5), 17, jnp.int32)], axis=1)
        amask = jnp.concatenate(
            [jnp.ones((1, 7), jnp.int32), jnp.zeros((1, 5), jnp.int32)],
            axis=1)
        out = bert.apply(params, padded, attention_mask=amask)
        assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        # Changing the junk must not change the logits at all.
        padded2 = padded.at[:, 7:].set(33)
        out2 = bert.apply(params, padded2, attention_mask=amask)
        assert_allclose(out, out2, rtol=0, atol=0)

    def test_attention_mask_grads_flow(self):
        cfg = models.BertConfig(vocab_size=60, d_model=32, num_heads=4,
                                num_layers=1, hidden_units=32, max_len=16,
                                num_classes=2)
        bert = models.BertEncoder(cfg)
        toks = jnp.asarray(rng.integers(0, 60, (4, 10)))
        amask = (jnp.arange(10)[None, :]
                 < jnp.asarray([10, 7, 5, 9])[:, None]).astype(jnp.int32)
        params = bert.init(jax.random.PRNGKey(0), toks)
        g = jax.grad(lambda p: jnp.sum(
            ops.softmax_cross_entropy_with_integer_labels(
                bert.apply(p, toks, attention_mask=amask),
                jnp.zeros(4, jnp.int32))))(params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
