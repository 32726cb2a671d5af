"""Classification metrics as pure jnp functions.

Reference parity: /root/reference/metrics.py:8-19 defines binary precision /
recall but is buggy (uses Python ``and`` on arrays, which raises for size>1 —
metrics.py:15-17 — and has no test). This module implements the *intended*
semantics correctly, adds F1/accuracy/confusion counts, and is tested against
sklearn (the reference left metrics untested).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class BinaryClassificationMetrics:
    precision: jax.Array
    recall: jax.Array
    f1: jax.Array
    accuracy: jax.Array
    true_positives: jax.Array
    false_positives: jax.Array
    false_negatives: jax.Array
    true_negatives: jax.Array


def binary_classification_metrics(predicts: jax.Array,
                                  labels: jax.Array) -> BinaryClassificationMetrics:
    """Precision/recall/F1/accuracy for {0,1} predictions and labels."""
    p = predicts.astype(jnp.bool_)
    l = labels.astype(jnp.bool_)
    tp = jnp.sum(p & l)
    fp = jnp.sum(p & ~l)
    fn = jnp.sum(~p & l)
    tn = jnp.sum(~p & ~l)
    precision = tp / jnp.maximum(tp + fp, 1)
    recall = tp / jnp.maximum(tp + fn, 1)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    accuracy = (tp + tn) / predicts.size
    return BinaryClassificationMetrics(precision, recall, f1, accuracy,
                                       tp, fp, fn, tn)


def accuracy(predictions: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean exact-match accuracy (multi-class, integer labels)."""
    return jnp.mean((predictions == labels).astype(jnp.float32))


def confusion_matrix(predictions: jax.Array, labels: jax.Array,
                     num_classes: int) -> jax.Array:
    """[num_classes, num_classes] counts; rows = true class, cols = predicted."""
    idx = labels * num_classes + predictions
    counts = jnp.bincount(idx.reshape(-1), length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


def top_k_accuracy(logits: jax.Array, labels: jax.Array,
                   k: int = 5) -> jax.Array:
    """Fraction of examples whose true label is in the top-k logits."""
    topk = jax.lax.top_k(logits, k)[1]                  # [..., k]
    hit = jnp.any(topk == labels[..., None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))


def perplexity(ce_loss: jax.Array) -> jax.Array:
    """exp(mean cross-entropy) — the standard LM evaluation metric."""
    return jnp.exp(ce_loss)
