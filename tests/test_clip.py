"""CLIP contrastive two-tower family: similarity/loss semantics, global
in-batch negatives over a dp mesh (all_gather), training smoke, and HF
torch-parity against a local random-weight ``transformers.CLIPModel``
(oracle pattern, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from np_modeling_tpu import models, parallel, training
from np_modeling_tpu.utils import hf_compat

rng = np.random.default_rng(5)

EOS = 63


def _small_cfg(**kw):
    vision = models.ViTConfig(
        image_size=16, patch_size=4, num_channels=3, d_model=32,
        num_heads=4, num_layers=2, hidden_units=64, num_classes=1,
        activation="quick_gelu", pre_norm=True, patch_bias=False,
        ln_eps=1e-5)
    text = models.GPTConfig(
        vocab_size=64, d_model=32, num_heads=4, num_layers=2,
        hidden_units=64, max_len=32, positional="learned",
        activation="quick_gelu", ln_eps=1e-5)
    base = dict(vision=vision, text=text, projection_dim=24, eos_token=EOS)
    return models.CLIPConfig(**{**base, **kw})


def _batch(cfg, b, s=12):
    toks = rng.integers(1, EOS, size=(b, s))
    lens = rng.integers(3, s, size=(b,))
    for r, l in enumerate(lens):
        toks[r, l] = EOS                     # EOS mid-sequence
    images = rng.normal(size=(b, 16, 16, 3)).astype(np.float32)
    return jnp.asarray(toks, jnp.int32), jnp.asarray(images), lens


def test_shapes_similarity_and_pooling():
    cfg = _small_cfg()
    clip = models.CLIP(cfg)
    toks, images, lens = _batch(cfg, 4)
    params = clip.init(jax.random.PRNGKey(0), toks, images)

    img = clip.image_embeds(params, images)
    txt = clip.text_embeds(params, toks)
    assert img.shape == (4, 24) and txt.shape == (4, 24)

    li, lt = clip.similarity(params, toks, images)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, rtol=1e-6)

    # Pooling reads the FIRST EOS position: tokens after it are ignored.
    toks2 = np.asarray(toks).copy()
    for r, l in enumerate(lens):
        toks2[r, l + 1:] = rng.integers(1, EOS, size=(toks2.shape[1] - l - 1))
    txt2 = clip.text_embeds(params, jnp.asarray(toks2))
    np.testing.assert_allclose(np.asarray(txt), np.asarray(txt2),
                               rtol=2e-5, atol=2e-5)


def test_contrastive_loss_matches_manual():
    cfg = _small_cfg()
    clip = models.CLIP(cfg)
    toks, images, _ = _batch(cfg, 5)
    params = clip.init(jax.random.PRNGKey(1), toks, images)

    loss = float(clip.loss(params, toks, images))
    img = np.asarray(clip.image_embeds(params, images, normalize=True))
    txt = np.asarray(clip.text_embeds(params, toks, normalize=True))
    logits = np.exp(float(params["logit_scale"])) * (txt @ img.T)

    def ce_rows(lg):
        lg = lg - lg.max(-1, keepdims=True)
        return np.mean(np.log(np.exp(lg).sum(-1)) - lg[np.arange(5),
                                                       np.arange(5)])
    want = 0.5 * (ce_rows(logits) + ce_rows(logits.T))
    np.testing.assert_allclose(loss, want, rtol=1e-5)


def test_global_negatives_match_full_batch():
    """dp-sharded loss (all_gather negatives + pmean) == full-batch loss,
    and the grad of the PMEAN'D loss == the full-batch grad. (Grad-then-
    pmean — the usual DP shortcut — is WRONG with gathered negatives:
    the all_gather paths get double-counted; the loss docstring records
    this caveat.)"""
    cfg = _small_cfg()
    clip = models.CLIP(cfg)
    toks, images, _ = _batch(cfg, 8)
    params = clip.init(jax.random.PRNGKey(2), toks, images)

    want = clip.loss(params, toks, images)

    mesh = parallel.make_mesh({"dp": 8})

    sharded_loss = jax.jit(jax.shard_map(
        lambda p, t, im: jax.lax.pmean(
            clip.loss(p, t, im, axis_name="dp"), "dp"),
        mesh=mesh, in_specs=(P(), P("dp"), P("dp")), out_specs=P(),
        check_vma=False))
    got = sharded_loss(params, toks, images)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    # Gradients: differentiate THROUGH the shard_mapped loss (the train-
    # step formulation) so the all_gather transposes route cross-device
    # cotangents; see the clip_contrastive_loss docstring.
    g_want = jax.grad(lambda p: clip.loss(p, toks, images))(params)
    g_got = jax.jit(jax.grad(
        lambda p: sharded_loss(p, toks, images)))(params)
    flat_w = jax.tree_util.tree_flatten_with_path(g_want)[0]
    flat_g = jax.tree.leaves(g_got)
    for (path, a), b in zip(flat_w, flat_g):
        if path[-1].key == "bk":
            # The key-projection bias has analytically ZERO gradient
            # (q·bk is constant across keys — softmax shift invariance),
            # so both sides are fp noise; assert small instead.
            assert float(jnp.max(jnp.abs(b))) < 1e-4
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_siglip_loss_matches_manual():
    img = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    scale, bias = 1.1, -3.0
    loss = float(models.siglip_loss(img, txt, jnp.asarray(scale),
                                    jnp.asarray(bias)))
    i = np.asarray(img) / np.linalg.norm(img, axis=-1, keepdims=True)
    t = np.asarray(txt) / np.linalg.norm(txt, axis=-1, keepdims=True)
    z = np.exp(scale) * (i @ t.T) + bias
    lab = 2.0 * np.eye(5) - 1.0
    want = float(np.sum(np.log1p(np.exp(-lab * z))) / 5)
    np.testing.assert_allclose(loss, want, rtol=1e-5)


def test_siglip_sharded_matches_full_batch():
    """One-sided text gather + pmean == the full-batch sigmoid loss,
    gradients included (grad THROUGH the shard_mapped loss)."""
    img = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    scale = jnp.asarray(0.7)
    bias = jnp.asarray(-2.0)

    full = lambda im, tx, sc, bi: models.siglip_loss(im, tx, sc, bi)
    want = full(img, txt, scale, bias)

    mesh = parallel.make_mesh({"dp": 8})
    sharded = jax.jit(jax.shard_map(
        lambda im, tx, sc, bi: jax.lax.pmean(
            models.siglip_loss(im, tx, sc, bi, axis_name="dp"), "dp"),
        mesh=mesh, in_specs=(P("dp"), P("dp"), P(), P()), out_specs=P(),
        check_vma=False))
    got = sharded(img, txt, scale, bias)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    g_want = jax.grad(full, argnums=(0, 1, 2, 3))(img, txt, scale, bias)
    g_got = jax.jit(jax.grad(
        lambda im, tx, sc, bi: sharded(im, tx, sc, bi),
        argnums=(0, 1, 2, 3)))(img, txt, scale, bias)
    for a, b in zip(g_want, g_got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


def test_training_aligns_pairs():
    cfg = _small_cfg()
    clip = models.CLIP(cfg)
    toks, images, _ = _batch(cfg, 6)
    params = clip.init(jax.random.PRNGKey(3), toks, images)
    opt = training.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda q: clip.loss(q, toks, images))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss

    losses = []
    p, s = params, state
    for _ in range(12):
        p, s, l = step(p, s)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses


class TestHFParity:
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    def _tiny_clip(self, seed=0, eos_token_id=63):
        tr = self.transformers
        cfg = tr.CLIPConfig(
            projection_dim=24,
            vision_config=dict(
                image_size=16, patch_size=4, num_channels=3, hidden_size=32,
                num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=64, hidden_act="quick_gelu",
                attention_dropout=0.0),
            text_config=dict(
                vocab_size=64, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=32, hidden_act="quick_gelu",
                attention_dropout=0.0, eos_token_id=eos_token_id,
                bos_token_id=0, pad_token_id=1))
        self.torch.manual_seed(seed)
        model = tr.CLIPModel(cfg)
        model.eval()
        return model

    def _inputs(self, b=3, s=12):
        toks = rng.integers(1, EOS, size=(b, s))
        for r in range(b):
            toks[r, 4 + r] = EOS
        pix = rng.normal(size=(b, 3, 16, 16)).astype(np.float32)
        return toks, pix

    def test_features_and_logits_match_torch(self):
        torch = self.torch
        hf = self._tiny_clip()
        cfg, params = hf_compat.import_clip(hf)
        assert cfg.eos_token == EOS
        clip = models.CLIP(cfg)
        toks, pix = self._inputs()
        with torch.no_grad():
            want_img = hf.get_image_features(torch.tensor(pix)).numpy()
            want_txt = hf.get_text_features(torch.from_numpy(toks)).numpy()
            out = hf(input_ids=torch.from_numpy(toks),
                     pixel_values=torch.tensor(pix), return_loss=True)
        nhwc = jnp.asarray(pix.transpose(0, 2, 3, 1))
        jtoks = jnp.asarray(toks, jnp.int32)
        with jax.default_matmul_precision("highest"):
            got_img = np.asarray(clip.image_embeds(params, nhwc))
            got_txt = np.asarray(clip.text_embeds(params, jtoks))
            got_logits = np.asarray(clip.apply(params, jtoks, nhwc))
            got_loss = float(clip.loss(params, jtoks, nhwc))
        np.testing.assert_allclose(got_img, want_img, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(got_txt, want_txt, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(got_logits,
                                   out.logits_per_image.numpy(),
                                   rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(got_loss, float(out.loss), rtol=1e-4)

    def test_legacy_argmax_pooling(self):
        """eos_token_id=2 -> HF pools at argmax(ids); importer maps it to
        eos_token=None (same rule)."""
        torch = self.torch
        hf = self._tiny_clip(seed=1, eos_token_id=2)
        cfg, params = hf_compat.import_clip(hf)
        assert cfg.eos_token is None
        clip = models.CLIP(cfg)
        toks, _ = self._inputs()
        with torch.no_grad():
            want = hf.get_text_features(torch.from_numpy(toks)).numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(clip.text_embeds(
                params, jnp.asarray(toks, jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
