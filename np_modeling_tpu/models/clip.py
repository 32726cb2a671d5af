"""CLIP: contrastive two-tower vision-language model.

The reference has no multimodal models; this composes the existing ViT
(CLIP-tower flavor: pre-LN, quick-gelu, biasless patch projection) and
GPT (causal, learned positions — the CLIP text encoder is exactly this
shape) behind linear projections into a shared embedding space, with the
CLIP training objective (Radford et al.): L2-normalize both embeddings,
scale similarities by a LEARNED temperature (stored as log-scale), and
take the symmetric cross-entropy over in-batch negatives.

TPU notes: the contrastive loss takes an optional ``axis_name`` — under
data parallelism each device contributes its local batch and gathers the
other devices' embeddings with ``jax.lax.all_gather`` (ICI), so the
negatives are GLOBAL (the large-batch regime CLIP training needs) while
each device only materializes a [b_local, B_global] logit tile. The
per-device mean over local rows followed by the train step's ``pmean``
equals the full-batch loss exactly (tested on the 8-device mesh).

HF parity surface: ``transformers.CLIPModel`` (image/text features,
similarity logits, and ``return_loss=True``); see
``utils.hf_compat.import_clip``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.nn import Linear
from np_modeling_tpu.nn.module import Module
from np_modeling_tpu.models.transformer_lm import GPT, GPTConfig
from np_modeling_tpu.models.vit import ViT, ViTConfig


@dataclasses.dataclass
class CLIPConfig:
    vision: ViTConfig
    text: GPTConfig
    projection_dim: int = 512
    eos_token: int | None = None    # text pooling position: first occurrence
                                    # of this id; None = argmax(tokens)
                                    # (original CLIP vocab puts EOS last)
    logit_scale_init: float = 2.6592    # ln(1/0.07), the CLIP paper init


def clip_contrastive_loss(image_embeds, text_embeds, logit_scale,
                          axis_name: str | None = None):
    """Symmetric InfoNCE over in-batch negatives.

    ``logit_scale`` is the LOG temperature (exponentiated here, matching
    HF's learnable ``logit_scale`` parameter). With ``axis_name``, the
    other devices' embeddings are all-gathered as extra negatives and the
    label for local row i is its GLOBAL index; ``pmean`` across the axis
    gives the exact full-batch loss.

    GRADIENT CAVEAT: because the loss depends on OTHER devices' params
    through the all_gather, differentiate the PMEAN'D scalar —
    ``jax.grad(lambda p: lax.pmean(loss(p), axis))`` — so the collective
    transposes route cross-device cotangents. The usual DP shortcut
    (per-device grad, then pmean of grads) double-counts the gathered
    paths and is WRONG here (tested in tests/test_clip.py)."""
    img = image_embeds / jnp.linalg.norm(image_embeds, axis=-1,
                                         keepdims=True)
    txt = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    if axis_name is not None:
        all_img = jax.lax.all_gather(img, axis_name, tiled=True)
        all_txt = jax.lax.all_gather(txt, axis_name, tiled=True)
        offset = jax.lax.axis_index(axis_name) * img.shape[0]
    else:
        all_img, all_txt, offset = img, txt, 0
    scale = jnp.exp(logit_scale)
    logits_img = scale * (img @ all_txt.T)      # [b_local, B_global]
    logits_txt = scale * (txt @ all_img.T)
    labels = offset + jnp.arange(img.shape[0])
    ce = ops.softmax_cross_entropy_with_integer_labels
    return 0.5 * (jnp.mean(ce(logits_img, labels))
                  + jnp.mean(ce(logits_txt, labels)))


def siglip_loss(image_embeds, text_embeds, logit_scale, logit_bias,
                axis_name: str | None = None):
    """SigLIP pairwise sigmoid loss (Zhai et al.) — the DP-friendly
    contrastive objective: every (image, text) pair is an independent
    binary problem (``+1`` on the diagonal, ``−1`` off), so there is no
    global softmax normalization. ``logit_scale`` is the LOG scale
    (t' in the paper); ``logit_bias`` the learned bias (init ≈ −10).

    With ``axis_name``, other devices' TEXT embeddings are all-gathered
    as extra negatives (one-sided gather suffices — the loss is a sum of
    independent pair terms, and gathering both sides would double-count
    each cross pair). Same gradient caveat as
    :func:`clip_contrastive_loss`: differentiate the pmean'd scalar."""
    img = image_embeds / jnp.linalg.norm(image_embeds, axis=-1,
                                         keepdims=True)
    txt = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    if axis_name is not None:
        all_txt = jax.lax.all_gather(txt, axis_name, tiled=True)
        offset = jax.lax.axis_index(axis_name) * img.shape[0]
    else:
        all_txt, offset = txt, 0
    logits = jnp.exp(logit_scale) * (img @ all_txt.T) + logit_bias
    labels = 2.0 * (jnp.arange(all_txt.shape[0])[None, :]
                    == (offset + jnp.arange(img.shape[0]))[:, None]) - 1.0
    # Paper normalization: sum over pairs / LOCAL batch size.
    return -jnp.sum(jax.nn.log_sigmoid(labels * logits)) / img.shape[0]


@dataclasses.dataclass
class CLIP(Module):
    """ViT tower + GPT text tower -> shared-space projections."""

    config: CLIPConfig

    def __post_init__(self):
        c = self.config
        self.vision = ViT(c.vision)
        self.lm = GPT(c.text)
        self.visual_proj = Linear(c.projection_dim, use_bias=False)
        self.text_proj = Linear(c.projection_dim, use_bias=False)

    def init(self, key, tokens, images):
        c = self.config
        kv, kt, k1, k2 = jax.random.split(key, 4)
        vp = jnp.zeros((1, c.vision.d_model), jnp.float32)
        tp = jnp.zeros((1, c.text.d_model), jnp.float32)
        return {
            "vision": self.vision.init(kv, images),
            "text": self.lm.init(kt, tokens),
            "visual_projection": self.visual_proj.init(k1, vp),
            "text_projection": self.text_proj.init(k2, tp),
            "logit_scale": jnp.asarray(c.logit_scale_init, jnp.float32),
        }

    def image_embeds(self, params, images, normalize=False):
        """[b, H, W, C] NHWC -> [b, projection_dim]. The [CLS] state after
        the tower's final norm (LN is per-position, so norm-then-slice
        equals HF's slice-then-post_layernorm), projected."""
        pooled = self.vision.encode(params["vision"], images)[:, 0]
        out = self.visual_proj.apply(params["visual_projection"], pooled)
        if normalize:
            out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out

    def text_embeds(self, params, tokens, normalize=False):
        """[b, s] -> [b, projection_dim]. Causal encoder hidden states
        (final norm applied), pooled at the first ``eos_token`` position
        (HF CLIPTextModel pooling), projected."""
        c = self.config
        hidden = self.lm.apply(params["text"], tokens, return_hidden=True)
        if c.eos_token is None:
            idx = jnp.argmax(tokens, axis=-1)
        else:
            idx = jnp.argmax((tokens == c.eos_token).astype(jnp.int32),
                             axis=-1)
        pooled = jnp.take_along_axis(hidden, idx[:, None, None],
                                     axis=1)[:, 0]
        out = self.text_proj.apply(params["text_projection"], pooled)
        if normalize:
            out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out

    def similarity(self, params, tokens, images):
        """(logits_per_image [b_i, b_t], logits_per_text [b_t, b_i])."""
        img = self.image_embeds(params, images, normalize=True)
        txt = self.text_embeds(params, tokens, normalize=True)
        scale = jnp.exp(params["logit_scale"])
        logits_per_text = scale * (txt @ img.T)
        return logits_per_text.T, logits_per_text

    def apply(self, params, tokens, images):
        """logits_per_image (HF ``CLIPModel.forward().logits_per_image``)."""
        return self.similarity(params, tokens, images)[0]

    def loss(self, params, tokens, images, axis_name: str | None = None):
        img = self.image_embeds(params, images)
        txt = self.text_embeds(params, tokens)
        return clip_contrastive_loss(img, txt, params["logit_scale"],
                                     axis_name=axis_name)
