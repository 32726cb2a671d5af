"""LLaVA multimodal family: splice semantics, loss masking, decode
consistency, end-to-end gradients, and HF torch-parity against a local
random-weight ``LlavaForConditionalGeneration`` (oracle pattern,
SURVEY.md §4; the reference has no multimodal models — this extends the
GPT + ViT families)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, training
from np_modeling_tpu.utils import hf_compat

rng = np.random.default_rng(11)

IMG_TOK = 63  # <image> placeholder id in the tiny vocab


def _small_cfg(**kw):
    vision = models.ViTConfig(
        image_size=16, patch_size=4, num_channels=3, d_model=32,
        num_heads=4, num_layers=3, hidden_units=64, num_classes=1,
        activation="quick_gelu", pre_norm=True, patch_bias=False,
        ln_eps=1e-5)
    text = models.GPTConfig(
        vocab_size=64, d_model=48, num_heads=4, num_layers=2,
        hidden_units=96, max_len=96, positional="rope", norm="rms",
        ffn="swiglu", use_bias=False, activation="silu", ln_eps=1e-5,
        tie_embeddings=True)
    base = dict(vision=vision, text=text, image_token=IMG_TOK,
                vision_feature_layer=-2)
    return models.LLaVAConfig(**{**base, **kw})


def _prompt(cfg, b, s, rng):
    """Random tokens with cfg.image_seq_len contiguous placeholders per
    row, at a different offset per row."""
    n = cfg.image_seq_len
    toks = rng.integers(0, IMG_TOK, size=(b, s))
    starts = rng.integers(1, s - n, size=(b,))
    for r, st in enumerate(starts):
        toks[r, st:st + n] = IMG_TOK
    return jnp.asarray(toks, jnp.int32), starts


def _images(cfg, b, rng):
    c = cfg.vision
    return jnp.asarray(rng.normal(
        size=(b, c.image_size, c.image_size, c.num_channels))
        .astype(np.float32))


def test_embed_splices_features_in_order():
    cfg = _small_cfg()
    llava = models.LLaVA(cfg)
    toks, starts = _prompt(cfg, 3, 40, rng)
    images = _images(cfg, 3, rng)
    params = llava.init(jax.random.PRNGKey(0), toks, images)

    x = np.asarray(llava.embed(params, toks, images))
    feats = np.asarray(llava.image_features(params, images))
    assert feats.shape == (3, cfg.image_seq_len, cfg.text.d_model)
    plain = np.asarray(llava.lm.embed.apply(params["lm"]["embedding"], toks))

    mask = np.asarray(toks) == IMG_TOK
    # Text positions keep the token embedding...
    np.testing.assert_array_equal(x[~mask], plain[~mask])
    # ...and the i-th placeholder of each row gets the row's i-th feature.
    for r, st in enumerate(starts):
        np.testing.assert_array_equal(
            x[r, st:st + cfg.image_seq_len], feats[r])


def test_vision_feature_layer_reads_intermediate_states():
    """-2 must read BEFORE the last block and skip the final norm."""
    cfg = _small_cfg()
    llava = models.LLaVA(cfg)
    toks, _ = _prompt(cfg, 2, 40, rng)
    images = _images(cfg, 2, rng)
    params = llava.init(jax.random.PRNGKey(1), toks, images)

    assert cfg.vision_upto_layer == cfg.vision.num_layers - 1
    raw = llava.vision.encode(params["vision"], images,
                              upto_layer=cfg.vision_upto_layer)
    full = llava.vision.encode(params["vision"], images)  # all blocks + LN
    assert not np.allclose(np.asarray(raw), np.asarray(full), atol=1e-3)

    cfg_last = _small_cfg(vision_feature_layer=-1)
    assert cfg_last.vision_upto_layer == cfg.vision.num_layers


def test_loss_ignores_image_positions():
    cfg = _small_cfg()
    llava = models.LLaVA(cfg)
    toks, _ = _prompt(cfg, 2, 40, rng)
    images = _images(cfg, 2, rng)
    params = llava.init(jax.random.PRNGKey(2), toks, images)

    loss = llava.loss(params, toks, images)
    logits = llava.apply(params, toks[:, :-1], images)
    from np_modeling_tpu import ops
    ce = ops.softmax_cross_entropy_with_integer_labels(
        logits, toks[:, 1:])
    valid = np.asarray(toks[:, 1:]) != IMG_TOK
    want = np.asarray(ce)[valid].sum() / valid.sum()
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_generate_first_token_matches_forward():
    cfg = _small_cfg()
    llava = models.LLaVA(cfg)
    toks, _ = _prompt(cfg, 2, 40, rng)
    images = _images(cfg, 2, rng)
    params = llava.init(jax.random.PRNGKey(3), toks, images)

    out = llava.generate(params, toks, images, steps=4)
    assert out.shape == (2, 4)
    logits = llava.apply(params, toks, images, logits_last_only=True)
    np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                  np.argmax(np.asarray(logits[:, -1]), -1))


def test_train_step_flows_gradients_through_tower():
    cfg = _small_cfg()
    llava = models.LLaVA(cfg)
    toks, _ = _prompt(cfg, 4, 32, rng)
    images = _images(cfg, 4, rng)
    params = llava.init(jax.random.PRNGKey(4), toks, images)

    opt = training.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda q: llava.loss(q, toks, images))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss, g

    losses = []
    p, s = params, state
    for _ in range(8):
        p, s, l, g = step(p, s)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses
    # The vision tower and projector actually receive gradient.
    for path in ("vision", "projector"):
        norm = training.tree_norm(g[path]) if hasattr(training, "tree_norm") \
            else jnp.sqrt(sum(jnp.sum(x ** 2)
                              for x in jax.tree.leaves(g[path])))
        assert float(norm) > 0.0, path


class TestHFParity:
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    def _tiny_llava(self, seed=0, select="default", feature_layer=-2):
        tr = self.transformers
        vision = tr.CLIPVisionConfig(
            image_size=16, patch_size=4, num_channels=3, hidden_size=32,
            num_hidden_layers=3, num_attention_heads=4,
            intermediate_size=64, hidden_act="quick_gelu",
            attention_dropout=0.0)
        text = tr.LlamaConfig(
            vocab_size=64, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=96,
            rms_norm_eps=1e-5, attention_dropout=0.0,
            tie_word_embeddings=False)
        cfg = tr.LlavaConfig(
            vision_config=vision, text_config=text, image_token_index=63,
            vision_feature_layer=feature_layer,
            vision_feature_select_strategy=select,
            projector_hidden_act="gelu")
        self.torch.manual_seed(seed)
        model = tr.LlavaForConditionalGeneration(cfg)
        model.eval()
        return model

    def _inputs(self, cfg, b=2, s=30):
        n = cfg.image_seq_len
        toks = rng.integers(0, IMG_TOK, size=(b, s))
        for r in range(b):
            st = 1 + 3 * r
            toks[r, st:st + n] = IMG_TOK
        pix = rng.normal(size=(b, 3, 16, 16)).astype(np.float32)
        return toks, pix

    def test_image_features_match_torch(self):
        torch = self.torch
        hf = self._tiny_llava()
        cfg, params = hf_compat.import_llava(hf)
        llava = models.LLaVA(cfg)
        _, pix = self._inputs(cfg)
        with torch.no_grad():
            want = hf.get_image_features(torch.tensor(pix))
            if isinstance(want, (tuple, list)):   # per-image list in 4.5x
                want = torch.stack(list(want))
            want = want.numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(llava.image_features(
                params, jnp.asarray(pix.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(
            got, want.reshape(got.shape), rtol=3e-4, atol=3e-4)

    @pytest.mark.parametrize("select,layer", [("default", -2), ("full", -1)])
    def test_logits_match_torch(self, select, layer):
        torch = self.torch
        hf = self._tiny_llava(seed=1, select=select, feature_layer=layer)
        cfg, params = hf_compat.import_llava(hf)
        assert cfg.vision_select == select
        llava = models.LLaVA(cfg)
        toks, pix = self._inputs(cfg)
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(toks),
                      pixel_values=torch.tensor(pix),
                      attention_mask=torch.ones_like(
                          torch.from_numpy(toks))).logits.numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(llava.apply(
                params, jnp.asarray(toks, jnp.int32),
                jnp.asarray(pix.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    def test_text_only_matches_torch(self):
        """No image: LLaVA degrades to the bare LM (HF allows text-only)."""
        torch = self.torch
        hf = self._tiny_llava(seed=2)
        cfg, params = hf_compat.import_llava(hf)
        llava = models.LLaVA(cfg)
        toks = rng.integers(0, IMG_TOK, size=(2, 12))
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(toks)).logits.numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(llava.apply(params,
                                         jnp.asarray(toks, jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    def test_generate_matches_torch_greedy(self):
        torch = self.torch
        hf = self._tiny_llava(seed=3)
        cfg, params = hf_compat.import_llava(hf)
        llava = models.LLaVA(cfg)
        toks, pix = self._inputs(cfg, b=1, s=24)
        with torch.no_grad():
            want = hf.generate(
                input_ids=torch.from_numpy(toks),
                pixel_values=torch.tensor(pix),
                attention_mask=torch.ones_like(torch.from_numpy(toks)),
                max_new_tokens=5, do_sample=False).numpy()[:, toks.shape[1]:]
        with jax.default_matmul_precision("highest"):
            got = np.asarray(llava.generate(
                params, jnp.asarray(toks, jnp.int32),
                jnp.asarray(pix.transpose(0, 2, 3, 1)), steps=5))
        np.testing.assert_array_equal(got, want)
