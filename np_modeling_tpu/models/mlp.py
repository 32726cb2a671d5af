"""MLP models (reference train_test.py:14-46 workload shape)."""

from __future__ import annotations

from typing import Sequence

from np_modeling_tpu.nn import Dense, Linear, Sequential


def MLP(hidden: Sequence[int], out_features: int,
        activation="relu") -> Sequential:
    """Stack of Dense(activation) layers with a final Linear head.

    The reference's end-to-end MLP workload is 5 Dense layers + Linear
    (train_test.py:17-23).
    """
    layers = [Dense(h, activation=activation) for h in hidden]
    layers.append(Linear(out_features))
    return Sequential(layers)
