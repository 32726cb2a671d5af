"""K-nearest-neighbours classifier (jittable jnp).

Reference parity: /root/reference/models/knn.py.
- ``euclidean_distance``: both the broadcast form (knn.py:17-20) and the
  matmul-expansion form. NOTE the reference's expansion has a sign bug —
  ``+2·x_test@x_trainᵀ`` at knn.py:25 where the identity needs −2 (and its
  own test only exercises the default broadcast path). Fixed here; the
  matmul form is the MXU-friendly default.
- ``kneighbours``: top-k neighbours (reference: np.argpartition, knn.py:46-48;
  here: ``jax.lax.top_k`` on negated distances — the TPU-native top-k).
- ``predict``: both vote rules — Uniform (majority, knn.py:54-59) and
  Distance (inverse-distance-weighted, knn.py:60-78) — as one-hot
  weighted reductions instead of scatter loops.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp


def euclidean_distance(x_test: jax.Array, x_train: jax.Array,
                       broadcast: bool = False) -> jax.Array:
    """Pairwise L2 distances: x_test [M, D], x_train [N, D] -> [M, N]."""
    if broadcast:
        diff2 = jnp.square(x_test[:, None, :] - x_train[None, :, :])
        return jnp.sqrt(jnp.sum(diff2, axis=2))
    # ||a - b||² = ||a||² − 2·a@bᵀ + ||b||² (reference knn.py:25 used +2: bug).
    sq = (jnp.sum(jnp.square(x_test), axis=1, keepdims=True)
          - 2.0 * x_test @ x_train.T
          + jnp.sum(jnp.square(x_train), axis=1)[None, :])
    return jnp.sqrt(jnp.maximum(sq, 0.0))


class Algorithm(enum.Enum):
    Uniform = 0
    Distance = 1


@dataclasses.dataclass
class KNearestNeighbours:
    x_train: jax.Array
    y_train: jax.Array
    k: int
    n_classes: int
    algorithm: Algorithm = Algorithm.Uniform

    def kneighbours(self, x_test):
        dist = euclidean_distance(jnp.asarray(x_test), self.x_train)
        neg_top, idx = jax.lax.top_k(-dist, self.k)
        return idx, -neg_top

    def predict(self, x_test):
        idx, dist = self.kneighbours(x_test)
        labels = jnp.take(self.y_train, idx)                  # [M, K]
        onehot = jax.nn.one_hot(labels, self.n_classes)       # [M, K, C]
        if self.algorithm == Algorithm.Uniform:
            votes = jnp.sum(onehot, axis=1)
        else:
            inv = 1.0 / jnp.maximum(dist, 1e-12)
            w = inv / jnp.sum(inv, axis=1, keepdims=True)
            votes = jnp.sum(onehot * w[..., None], axis=1)
        return jnp.argmax(votes, axis=1)
