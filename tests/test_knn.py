"""KNN vs sklearn — ASSERTED (the reference's comparison is commented out,
models/knn_test.py:43)."""

import numpy as np
from sklearn.neighbors import KNeighborsClassifier

from np_modeling_tpu.models import Algorithm, KNearestNeighbours
from np_modeling_tpu.models.knn import euclidean_distance

rng = np.random.default_rng(2024)


def _data():
    x_train = rng.standard_normal((64, 8)).astype(np.float32)
    y_train = rng.integers(0, 3, size=64)
    x_test = rng.standard_normal((16, 8)).astype(np.float32)
    return x_train, y_train, x_test


def test_distance_broadcast_equals_matmul_form():
    # The reference's matmul expansion has a sign bug (knn.py:25, +2 where
    # the identity needs −2); ours must agree with the broadcast form.
    a = rng.standard_normal((10, 6)).astype(np.float32)
    b = rng.standard_normal((12, 6)).astype(np.float32)
    d1 = np.asarray(euclidean_distance(a, b, broadcast=True))
    d2 = np.asarray(euclidean_distance(a, b, broadcast=False))
    np.testing.assert_allclose(d1, d2, rtol=1e-3, atol=1e-4)


def test_uniform_vote_vs_sklearn():
    x_train, y_train, x_test = _data()
    ours = KNearestNeighbours(x_train, y_train, k=5, n_classes=3,
                              algorithm=Algorithm.Uniform).predict(x_test)
    ref = KNeighborsClassifier(n_neighbors=5, weights="uniform").fit(
        x_train, y_train).predict(x_test)
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_distance_vote_vs_sklearn():
    x_train, y_train, x_test = _data()
    ours = KNearestNeighbours(x_train, y_train, k=5, n_classes=3,
                              algorithm=Algorithm.Distance).predict(x_test)
    ref = KNeighborsClassifier(n_neighbors=5, weights="distance").fit(
        x_train, y_train).predict(x_test)
    np.testing.assert_array_equal(np.asarray(ours), ref)
