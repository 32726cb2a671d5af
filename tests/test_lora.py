"""LoRA adapters: zero-init identity, frozen-base fine-tuning, bake-in."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, training


@pytest.fixture(scope="module")
def gpt_and_params():
    cfg = models.GPTConfig(vocab_size=67, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=32)
    gpt = models.GPT(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (4, 16), 0, 67)
    params = gpt.init(jax.random.PRNGKey(1), toks)
    return gpt, params, toks


def test_zero_init_is_identity(gpt_and_params):
    gpt, params, toks = gpt_and_params
    lora = training.lora_init(jax.random.PRNGKey(2), params, rank=4)
    merged = training.lora_merge(params, lora)
    np.testing.assert_allclose(np.asarray(gpt.apply(merged, toks)),
                               np.asarray(gpt.apply(params, toks)),
                               rtol=1e-6, atol=1e-6)


def test_adapter_tree_shape(gpt_and_params):
    _, params, _ = gpt_and_params
    lora = training.lora_init(jax.random.PRNGKey(2), params, rank=4)
    # 2 layers x 4 attention projections.
    assert len(lora) == 8
    assert all(k.endswith(("wq", "wk", "wv", "wo")) for k in lora)
    wq = lora["layer_0/self_attention/wq"]
    assert wq["a"].shape == (32, 4) and wq["b"].shape == (4, 4, 8)
    big = training.lora_init(jax.random.PRNGKey(2), params, rank=2,
                             match=training.ALL_LINEAR_TARGETS)
    assert len(big) == 12  # + dense1/dense2 per layer


def test_finetune_trains_adapters_only(gpt_and_params):
    gpt, base, toks = gpt_and_params
    lora = training.lora_init(jax.random.PRNGKey(3), base, rank=8,
                              match=training.ALL_LINEAR_TARGETS)
    opt = training.adam(5e-3)
    state = opt.init(lora)

    @jax.jit
    def step(lora, state):
        def loss_fn(lo):
            return gpt.loss(training.lora_merge(base, lo), toks)
        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, state2 = opt.update(grads, state, lora)
        return training.apply_updates(lora, updates), state2, loss, grads

    l0 = None
    for _ in range(25):
        lora, state, loss, grads = step(lora, state)
        l0 = float(loss) if l0 is None else l0
    assert float(loss) < l0 - 0.3, (l0, float(loss))
    # Gradients exist on every adapter leaf.
    gnorms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(
        grads)]
    assert all(n > 0 for n in gnorms)


def test_finalize_bakes_in(gpt_and_params):
    gpt, base, toks = gpt_and_params
    lora = training.lora_init(jax.random.PRNGKey(4), base, rank=4)
    # Make the adapters nonzero so the bake actually changes weights.
    lora = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.ones_like(a), lora)
    merged_live = gpt.apply(training.lora_merge(base, lora, alpha=8.0), toks)
    baked = training.lora_finalize(base, lora, alpha=8.0)
    np.testing.assert_allclose(np.asarray(gpt.apply(baked, toks)),
                               np.asarray(merged_live), rtol=1e-6, atol=1e-6)
    # And it differs from the base model (adapters are nonzero).
    assert not np.allclose(np.asarray(gpt.apply(baked, toks)),
                           np.asarray(gpt.apply(base, toks)), atol=1e-4)


def test_checkpoint_roundtrip(tmp_path, gpt_and_params):
    _, base, _ = gpt_and_params
    lora = training.lora_init(jax.random.PRNGKey(5), base, rank=2)
    path = str(tmp_path / "lora.msgpack")
    training.save_checkpoint(path, lora)
    back = training.load_checkpoint(path, lora)
    for k in lora:
        np.testing.assert_array_equal(np.asarray(back[k]["a"]),
                                      np.asarray(lora[k]["a"]))


def test_all_linear_targets_cover_swiglu():
    # ADVICE r2: ALL_LINEAR_TARGETS must match swiglu FFN weights too, so
    # LLaMA-family imports don't silently degrade to attention-only LoRA.
    cfg = models.GPTConfig(vocab_size=67, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=32,
                           ffn="swiglu", norm="rms", use_bias=False,
                           positional="rope")
    gpt = models.GPT(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, 67)
    params = gpt.init(jax.random.PRNGKey(1), toks)
    lora = training.lora_init(jax.random.PRNGKey(2), params, rank=2,
                              match=training.ALL_LINEAR_TARGETS)
    # 2 layers x (4 attention + 3 swiglu) matmuls.
    assert len(lora) == 14
    assert "layer_0/swiglu/w_gate" in lora
    assert "layer_1/swiglu/w_down" in lora
    # Zero-init adapters are still an identity on a swiglu model.
    merged = training.lora_merge(params, lora)
    np.testing.assert_allclose(np.asarray(gpt.apply(merged, toks)),
                               np.asarray(gpt.apply(params, toks)),
                               rtol=1e-6, atol=1e-6)
