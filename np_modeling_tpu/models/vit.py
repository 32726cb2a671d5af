"""ViT: vision transformer image classifier (first vision model family).

The reference's only vision component is the Conv2D CNN workload
(/root/reference/layers/conv.py, train_test.py:48-81); this composes the
SAME TransformerEncoderBlock the text stack uses into the standard ViT
(Dosovitskiy et al.) recipe: non-overlapping patch embedding, a learned
[CLS] token + learned position embeddings, a pre-norm encoder, final
LayerNorm, and a linear classifier on the [CLS] state.

TPU note: the patch embedding is NOT a conv — non-overlapping stride-p
patches are a pure reshape/transpose followed by ONE [b·n, p·p·c] x
[p·p·c, d] matmul, which lands directly on the MXU with no im2col or
window overlap machinery (numerically identical to the stride-p conv HF
uses; the import reshapes the conv kernel accordingly).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from np_modeling_tpu.nn import Dropout, LayerNorm, Linear
from np_modeling_tpu.nn.module import Module, split_rngs
from np_modeling_tpu.nn.transformer import TransformerEncoderBlock


@dataclasses.dataclass
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    d_model: int = 768
    num_heads: int = 12
    num_layers: int = 12
    hidden_units: int = 3072
    num_classes: int = 1000
    drop_rate: float = 0.0
    activation: object = "gelu_exact"   # HF ViT hidden_act="gelu" (erf);
                                        # CLIP towers use "quick_gelu"
    ln_eps: float = 1e-12
    pooler: bool = False                # ViTModel-style tanh pooler head
    pre_norm: bool = False              # CLIP: LayerNorm between the
                                        # embeddings and the encoder
                                        # (HF CLIPVisionTransformer
                                        # ``pre_layrnorm`` [sic])
    patch_bias: bool = True             # CLIP's patch conv has no bias

    @property
    def num_patches(self) -> int:
        assert self.image_size % self.patch_size == 0
        return (self.image_size // self.patch_size) ** 2


def patchify(images, patch_size: int):
    """[b, H, W, C] NHWC -> [b, n_patches, p*p*C] (row-major patches, each
    flattened in (ph, pw, c) order — matches an HWIO conv kernel reshape)."""
    b, hh, ww, c = images.shape
    p = patch_size
    x = images.reshape(b, hh // p, p, ww // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (hh // p) * (ww // p), p * p * c)


@dataclasses.dataclass
class ViT(Module):
    """Patch embed -> [CLS] + pos -> pre-norm encoder -> LN -> classifier."""

    config: ViTConfig

    def __post_init__(self):
        c = self.config
        self.patch_proj = Linear(c.d_model, use_bias=c.patch_bias)
        self.block = TransformerEncoderBlock(
            c.num_heads, c.hidden_units, norm_first=True,
            drop_rate=c.drop_rate, activation=c.activation, ln_eps=c.ln_eps)
        self.final_norm = LayerNorm(epsilon=c.ln_eps)
        self.classifier = Linear(c.num_classes)
        self.drop = Dropout(c.drop_rate)
        if c.pooler:
            self.pooler_dense = Linear(c.d_model)

    def init(self, key, images):
        c = self.config
        ks = jax.random.split(key, c.num_layers + 5)
        patches = patchify(jnp.zeros_like(images, jnp.float32), c.patch_size)
        x = jnp.zeros((images.shape[0], c.num_patches + 1, c.d_model),
                      jnp.float32)
        params = {
            "patch_proj": self.patch_proj.init(ks[0], patches),
            "cls_token": jnp.zeros((1, 1, c.d_model), jnp.float32),
            "pos_embedding": 0.02 * jax.random.normal(
                ks[1], (1, c.num_patches + 1, c.d_model), jnp.float32),
        }
        if c.pre_norm:
            params["pre_norm"] = self.final_norm.init(
                jax.random.fold_in(key, 777), x)
        for i in range(c.num_layers):
            params[f"layer_{i}"] = self.block.init(ks[2 + i], x)
        params["final_norm"] = self.final_norm.init(ks[-2], x)
        cls = jnp.zeros((images.shape[0], c.d_model), jnp.float32)
        params["classifier"] = self.classifier.init(ks[-1], cls)
        if c.pooler:
            params["pooler"] = self.pooler_dense.init(
                jax.random.fold_in(key, 888), cls)
        return params

    def encode(self, params, images, training=False, rngs=None,
               upto_layer=None):
        """[b, H, W, C] -> [b, 1 + n_patches, d_model] (final-LN applied;
        index 0 is the [CLS] state).

        ``upto_layer=k`` runs only the first k encoder blocks and returns
        the RAW hidden states (no final norm) — HF's
        ``hidden_states[k]`` feature-extraction surface; LLaVA reads its
        CLIP tower at ``vision_feature_layer=-2`` = num_layers - 1."""
        c = self.config
        x = self.patch_proj.apply(params["patch_proj"],
                                  patchify(images, c.patch_size))
        cls = jnp.broadcast_to(params["cls_token"],
                               (x.shape[0], 1, c.d_model))
        x = jnp.concatenate([cls, x], axis=1) + params["pos_embedding"]
        if c.pre_norm:
            x = self.final_norm.apply(params["pre_norm"], x)
        x = self.drop.apply({}, x, training, rngs, salt=1000)
        for i in range(upto_layer if upto_layer is not None
                       else c.num_layers):
            x = self.block.apply(params[f"layer_{i}"], x, training=training,
                                 rngs=split_rngs(rngs, i))
        if upto_layer is not None:
            return x
        return self.final_norm.apply(params["final_norm"], x)

    def apply(self, params, images, training=False, rngs=None):
        """Classification logits [b, num_classes] from the [CLS] state."""
        x = self.encode(params, images, training, rngs)
        return self.classifier.apply(params["classifier"], x[:, 0])

    def pooled(self, params, images, training=False, rngs=None):
        """ViTModel-style pooler output: tanh(Linear(cls))."""
        assert self.config.pooler, "build with ViTConfig(pooler=True)"
        x = self.encode(params, images, training, rngs)
        return jnp.tanh(self.pooler_dense.apply(params["pooler"], x[:, 0]))

    def loss(self, params, images, labels, training=False, rngs=None):
        """Mean softmax cross-entropy over integer class labels."""
        from np_modeling_tpu import ops
        logits = self.apply(params, images, training, rngs)
        return jnp.mean(
            ops.softmax_cross_entropy_with_integer_labels(logits, labels))
