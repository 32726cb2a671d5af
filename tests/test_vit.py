"""ViT: patchify equivalence to stride-p conv, training smoke, and HF
torch-parity (oracle pattern, SURVEY.md §4 — local random-weight models)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, training
from np_modeling_tpu.utils import hf_compat

rng = np.random.default_rng(21)
TOL = dict(rtol=1e-4, atol=2e-5)


def _small_cfg(**kw):
    base = dict(image_size=16, patch_size=4, num_channels=3, d_model=32,
                num_heads=4, num_layers=2, hidden_units=64, num_classes=5)
    return models.ViTConfig(**{**base, **kw})


def test_patchify_matches_strided_conv():
    """Reshape-patchify + matmul == the stride-p conv HF uses."""
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 3, 8)).astype(np.float32))
    got = models.patchify(x, 4) @ w.reshape(-1, 8)
    want = jax.lax.conv_general_dilated(
        x, w, window_strides=(4, 4), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(want.reshape(2, 16, 8)),
                               rtol=1e-5, atol=1e-5)


def test_vit_shapes_and_training_step():
    cfg = _small_cfg(drop_rate=0.1)
    vit = models.ViT(cfg)
    images = jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (4,)))
    params = vit.init(jax.random.PRNGKey(0), images)

    logits = vit.apply(params, images)
    assert logits.shape == (4, 5)
    hidden = vit.encode(params, images)
    assert hidden.shape == (4, cfg.num_patches + 1, cfg.d_model)

    opt = training.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s, key):
        loss, g = jax.value_and_grad(
            lambda q: vit.loss(q, images, labels, training=True,
                               rngs={"dropout": key}))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss

    losses = []
    p, s = params, state
    for i in range(10):
        p, s, l = step(p, s, jax.random.PRNGKey(i))
        losses.append(float(l))
    assert losses[-1] < losses[0], losses


class TestHFParity:
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    def _hf_cfg(self, **kw):
        base = dict(image_size=16, patch_size=4, num_channels=3,
                    hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0, hidden_act="gelu")
        return self.transformers.ViTConfig(**{**base, **kw})

    def test_vit_model_parity(self):
        torch = self.torch
        torch.manual_seed(0)
        hf = self.transformers.ViTModel(self._hf_cfg())
        hf.eval()
        cfg, params = hf_compat.import_vit(hf)
        assert cfg.pooler and cfg.activation == "gelu_exact"
        vit = models.ViT(cfg)

        pix = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
        with torch.no_grad():
            out = hf(torch.tensor(pix))
        nhwc = jnp.asarray(pix.transpose(0, 2, 3, 1))
        hidden = np.asarray(vit.encode(params, nhwc))
        np.testing.assert_allclose(hidden, out.last_hidden_state.numpy(),
                                   **TOL)
        pooled = np.asarray(vit.pooled(params, nhwc))
        np.testing.assert_allclose(pooled, out.pooler_output.numpy(), **TOL)

    def test_vit_classifier_parity(self):
        torch = self.torch
        torch.manual_seed(1)
        hf = self.transformers.ViTForImageClassification(
            self._hf_cfg(num_labels=7))
        hf.eval()
        cfg, params = hf_compat.import_vit(hf)
        assert cfg.num_classes == 7 and not cfg.pooler
        vit = models.ViT(cfg)

        pix = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
        with torch.no_grad():
            want = hf(torch.tensor(pix)).logits.numpy()
        got = np.asarray(vit.apply(params,
                                   jnp.asarray(pix.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
