"""Metrics vs sklearn (the reference's metrics.py is buggy AND untested)."""

import jax.numpy as jnp
import numpy as np
from sklearn import metrics as skm

from np_modeling_tpu import ops

rng = np.random.default_rng(5)


def test_binary_metrics_vs_sklearn():
    preds = rng.integers(0, 2, size=200)
    labels = rng.integers(0, 2, size=200)
    m = ops.binary_classification_metrics(preds, labels)
    np.testing.assert_allclose(float(m.precision),
                               skm.precision_score(labels, preds), rtol=1e-6)
    np.testing.assert_allclose(float(m.recall),
                               skm.recall_score(labels, preds), rtol=1e-6)
    np.testing.assert_allclose(float(m.f1),
                               skm.f1_score(labels, preds), rtol=1e-6)
    np.testing.assert_allclose(float(m.accuracy),
                               skm.accuracy_score(labels, preds), rtol=1e-6)


def test_confusion_matrix_vs_sklearn():
    preds = rng.integers(0, 4, size=300)
    labels = rng.integers(0, 4, size=300)
    ours = np.asarray(ops.confusion_matrix(preds, labels, 4))
    ref = skm.confusion_matrix(labels, preds, labels=range(4))
    np.testing.assert_array_equal(ours, ref)


def test_accuracy():
    preds = np.array([1, 2, 3, 3])
    labels = np.array([1, 2, 0, 3])
    np.testing.assert_allclose(float(ops.accuracy(preds, labels)), 0.75)


def test_top_k_accuracy_and_perplexity():
    logits = jnp.asarray([[3.0, 1.0, 2.0, 0.0],
                          [0.0, 1.0, 2.0, 3.0]])
    labels = jnp.asarray([2, 0])
    # top-1: preds are [0, 3] -> 0 hits; top-2: {0,2}, {3,2} -> 1 hit.
    assert float(ops.top_k_accuracy(logits, labels, k=1)) == 0.0
    assert float(ops.top_k_accuracy(logits, labels, k=2)) == 0.5
    assert float(ops.top_k_accuracy(logits, labels, k=4)) == 1.0
    ce = ops.softmax_cross_entropy_with_integer_labels(logits, labels)
    np.testing.assert_allclose(float(ops.perplexity(jnp.mean(ce))),
                               float(jnp.exp(jnp.mean(ce))), rtol=1e-6)
