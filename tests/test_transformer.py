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


def _bind_encoder(fp):
    """Map Flax twin params -> our encoder block param layout."""
    mha = fp["MultiHeadDotProductAttention_0"]
    return {
        "self_attention": {
            "wq": mha["query"]["kernel"], "bq": mha["query"]["bias"],
            "wk": mha["key"]["kernel"], "bk": mha["key"]["bias"],
            "wv": mha["value"]["kernel"], "bv": mha["value"]["bias"],
            "wo": mha["out"]["kernel"], "bo": mha["out"]["bias"],
        },
        "norm1": {"gamma": fp["LayerNorm_0"]["scale"],
                  "beta": fp["LayerNorm_0"]["bias"]},
        "norm2": {"gamma": fp["LayerNorm_1"]["scale"],
                  "beta": fp["LayerNorm_1"]["bias"]},
        "dense1": {"linear": {"w": fp["Dense_0"]["kernel"],
                              "b": fp["Dense_0"]["bias"]}},
        "dense2": {"w": fp["Dense_1"]["kernel"], "b": fp["Dense_1"]["bias"]},
    }


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
