"""LLaVA: vision-language model (first multimodal family).

The reference has no multimodal models; this composes two existing
families — the ViT encoder (CLIP-tower flavor: pre-LN, quick-gelu,
biasless patch projection) and the GPT decoder (LLaMA-architecture) —
through the LLaVA recipe (Liu et al.): encode the image, read the tower
at an INTERMEDIATE layer (HF ``vision_feature_layer``, canonically -2,
before the tower's final norm), drop the [CLS] state, project each patch
feature into the text embedding space with a 2-layer MLP, and splice the
projected features into the token-embedding sequence at the ``<image>``
placeholder positions. The language model then runs unchanged — causal
flash attention over the mixed sequence, standard KV-cache decode.

TPU notes: the feature splice is a masked gather (per-row cumulative
index into the image features), not a scatter — one ``jnp.where`` on
[b, s, d], fully static shapes, jit/vmap-safe. Everything downstream
reuses the GPT stack's kernels via ``inputs_embeds``.

HF parity surface: ``LlavaForConditionalGeneration`` (vision tower =
``CLIPVisionModel``); see ``utils.hf_compat.import_llava``.
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
class LLaVAConfig:
    vision: ViTConfig
    text: GPTConfig
    image_token: int                    # <image> placeholder id in prompts
    vision_feature_layer: int = -2      # HF hidden_states index: k >= 0
                                        # means "after k encoder blocks"
                                        # (0 = embeddings), negative counts
                                        # from the end (-1 = all blocks);
                                        # no final norm is applied
    vision_select: str = "default"      # "default" drops [CLS] | "full"
    projector_act: object = "gelu_exact"    # HF projector_hidden_act
                                        # "gelu" (erf form)
    projector_bias: bool = True

    @property
    def image_seq_len(self) -> int:
        n = self.vision.num_patches
        return n + 1 if self.vision_select == "full" else n

    @property
    def vision_upto_layer(self) -> int:
        # hidden_states list has num_layers + 1 entries.
        return self.vision_feature_layer % (self.vision.num_layers + 1)


@dataclasses.dataclass
class LLaVA(Module):
    """Vision tower -> 2-layer projector -> token splice -> GPT."""

    config: LLaVAConfig

    def __post_init__(self):
        c = self.config
        assert c.vision_select in ("default", "full")
        self.vision = ViT(c.vision)
        self.lm = GPT(c.text)
        self.proj1 = Linear(c.text.d_model, use_bias=c.projector_bias)
        self.proj2 = Linear(c.text.d_model, use_bias=c.projector_bias)
        self._act = ops.get_activation(c.projector_act)

    def init(self, key, tokens, images):
        c = self.config
        kv, kl, k1, k2 = jax.random.split(key, 4)
        vf = jnp.zeros((1, c.image_seq_len, c.vision.d_model), jnp.float32)
        pf = jnp.zeros((1, c.image_seq_len, c.text.d_model), jnp.float32)
        return {
            "vision": self.vision.init(kv, images),
            "projector": {"linear_1": self.proj1.init(k1, vf),
                          "linear_2": self.proj2.init(k2, pf)},
            "lm": self.lm.init(kl, tokens),
        }

    def image_features(self, params, images):
        """[b, H, W, C] NHWC -> [b, image_seq_len, text_d_model]."""
        c = self.config
        feats = self.vision.encode(params["vision"], images,
                                   upto_layer=c.vision_upto_layer)
        if c.vision_select == "default":
            feats = feats[:, 1:]                       # drop [CLS]
        h = self.proj1.apply(params["projector"]["linear_1"], feats)
        return self.proj2.apply(params["projector"]["linear_2"],
                                self._act(h))

    def embed(self, params, tokens, images=None):
        """Token embeddings with image features spliced at ``image_token``
        positions. One image per batch row; the i-th placeholder in a row
        receives the row's i-th image feature (HF masked_scatter order —
        rows must carry exactly ``image_seq_len`` placeholders when
        ``images`` is given)."""
        c = self.config
        x = self.lm.embed.apply(params["lm"]["embedding"], tokens)
        if images is None:
            return x
        feats = self.image_features(params, images).astype(x.dtype)
        mask = tokens == c.image_token                       # [b, s]
        idx = jnp.clip(jnp.cumsum(mask, axis=-1) - 1, 0, feats.shape[1] - 1)
        spliced = jnp.take_along_axis(feats, idx[..., None], axis=1)
        return jnp.where(mask[..., None], spliced, x)

    def apply(self, params, tokens, images=None, training=False, rngs=None,
              logits_last_only=False):
        """Causal-LM logits over the mixed (text + image) sequence."""
        return self.lm.apply(params["lm"], None, training=training,
                             rngs=rngs, logits_last_only=logits_last_only,
                             inputs_embeds=self.embed(params, tokens,
                                                      images))

    def loss(self, params, tokens, images=None, training=False, rngs=None):
        """Next-token CE; image-placeholder targets don't contribute."""
        logits = self.apply(params, tokens[:, :-1], images,
                            training=training, rngs=rngs)
        targets = tokens[:, 1:]
        ce = ops.softmax_cross_entropy_with_integer_labels(logits, targets)
        valid = (targets != self.config.image_token).astype(jnp.float32)
        return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    def generate(self, params, prompt_tokens, images, steps: int, key=None,
                 temperature: float = 0.0, top_k: int | None = None,
                 top_p: int | None = None):
        """Prefill from spliced embeddings, then standard token decode."""
        return self.lm.generate(
            params["lm"], prompt_tokens, steps, key=key,
            temperature=temperature, top_k=top_k, top_p=top_p,
            prompt_embeds=self.embed(params, prompt_tokens, images))
