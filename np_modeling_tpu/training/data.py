"""Minimal data pipeline: batching + host->device prefetch.

The reference trains full-batch only (train.py:20-39 — no dataloader or
minibatching; SURVEY.md L6). This adds the standard TPU input pattern:
shuffled minibatch slicing on host, with a small prefetch queue that
device_puts the next batches while the current step runs, keeping the chip
fed without a heavyweight input framework.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Sequence

import jax
import numpy as np


def batches(arrays: Sequence[np.ndarray], batch_size: int, *,
            shuffle: bool = True, seed: int = 0,
            drop_remainder: bool = True) -> Iterator[tuple]:
    """Yield tuples of aligned minibatch slices (one epoch)."""
    n = len(arrays[0])
    for a in arrays:
        assert len(a) == n, "arrays must be aligned on the leading axis"
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    end = (n // batch_size) * batch_size if drop_remainder else n
    for start in range(0, end, batch_size):
        sel = idx[start:start + batch_size]
        yield tuple(a[sel] for a in arrays)


def epochs(arrays: Sequence[np.ndarray], batch_size: int, num_epochs: int,
           *, seed: int = 0, drop_remainder: bool = True) -> Iterator[tuple]:
    for e in range(num_epochs):
        yield from batches(arrays, batch_size, shuffle=True, seed=seed + e,
                           drop_remainder=drop_remainder)


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Keep ``size`` batches in flight on device ahead of consumption.

    device_put is async: transfers of queued batches overlap the running
    step. Pass a NamedSharding to place batches directly onto a mesh.
    """
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
