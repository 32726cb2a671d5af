"""Checkpoint save/restore for param/optimizer pytrees.

The reference has NO checkpointing (weights live only as attrs on live
objects, /root/reference/layers/mlp.py:18; SURVEY.md §5). Two formats:

- ``save_checkpoint``/``load_checkpoint``: single msgpack file, host
  gathered — fine for single-chip models.
- ``save_checkpoint_sharded``/``load_checkpoint_sharded``: a directory of
  per-shard .npy files + a manifest. Save iterates each array's
  addressable shards (no single host buffer holds a full gathered leaf);
  restore assembles each device's shard directly from the files that
  intersect it (``jax.make_array_from_callback``) — placement comes from
  the template's shardings, nothing is replicated through host memory,
  and restoring onto a DIFFERENT mesh/sharding than was saved works
  (shard intersection assembly). Single-process scope: all shards are
  addressable (multi-host would need per-host manifests).
"""

from __future__ import annotations

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_checkpoint(path: str, tree) -> None:
    """Atomically write a pytree (params, opt state, ...) to ``path``."""
    tree = jax.device_get(tree)
    data = serialization.to_bytes(tree)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, target):
    """Restore into the structure of ``target`` (a template pytree)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


# ---------------------------------------------------------------------------
# Sharded (per-shard-file) checkpoints
# ---------------------------------------------------------------------------

_MANIFEST = "manifest.msgpack"


def _bounds(index, shape):
    """Normalize a shard index (tuple of slices) to [[start, stop], ...]."""
    out = []
    for sl, dim in zip(index, shape):
        start, stop, step = sl.indices(dim)
        assert step == 1, "strided shards unsupported"
        out.append([start, stop])
    return out


def save_checkpoint_sharded(path: str, tree) -> None:
    """Write a pytree to directory ``path``, one file per unique shard.

    Replicated leaves (or plain numpy leaves) are written once as a single
    full-array file. The manifest is written last — its presence marks a
    complete checkpoint."""
    os.makedirs(path, exist_ok=True)
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    manifest = {}
    for i, (kp, leaf) in enumerate(flat):
        key = jax.tree_util.keystr(kp)
        entries = []
        if isinstance(leaf, jax.Array) and leaf.sharding.num_devices > 1:
            seen = set()
            for sh in leaf.addressable_shards:
                b = _bounds(sh.index, leaf.shape)
                tb = tuple(map(tuple, b))
                if tb in seen:          # replicated copies: save once
                    continue
                seen.add(tb)
                fname = f"leaf{i:05d}_shard{len(entries):03d}.npy"
                np.save(os.path.join(path, fname), np.asarray(sh.data),
                        allow_pickle=False)
                entries.append({"index": b, "file": fname})
        else:
            fname = f"leaf{i:05d}_full.npy"
            arr = np.asarray(leaf)
            np.save(os.path.join(path, fname), arr, allow_pickle=False)
            entries.append({"index": _bounds((slice(None),) * arr.ndim,
                                             arr.shape),
                            "file": fname})
        arr_like = np.asarray(leaf.addressable_shards[0].data) \
            if isinstance(leaf, jax.Array) else np.asarray(leaf)
        manifest[key] = {"shape": list(np.shape(leaf)),
                         "dtype": str(arr_like.dtype),
                         "shards": entries}
    data = serialization.msgpack_serialize(manifest)
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(path, _MANIFEST))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _assemble(req, meta, path, cache):
    """Fill the requested [[start, stop], ...] region from the saved shards
    that intersect it."""
    shape = [b - a for a, b in req]
    out = np.empty(shape, meta["dtype"])
    filled = 0
    for ent in meta["shards"]:
        inter = [(max(a1, a2), min(b1, b2))
                 for (a1, b1), (a2, b2) in zip(ent["index"], req)]
        if any(a >= b for a, b in inter):
            continue
        if ent["file"] not in cache:
            cache[ent["file"]] = np.load(os.path.join(path, ent["file"]),
                                         mmap_mode="r")
        src = cache[ent["file"]]
        src_sl = tuple(slice(a - sa, b - sa)
                       for (a, b), (sa, _) in zip(inter, ent["index"]))
        dst_sl = tuple(slice(a - ra, b - ra)
                       for (a, b), (ra, _) in zip(inter, req))
        out[dst_sl] = src[src_sl]
        filled += int(np.prod([b - a for a, b in inter]))
    assert filled >= int(np.prod(shape)), (
        "checkpoint shards do not cover the requested region")
    return out


def load_checkpoint_sharded(path: str, target):
    """Restore into ``target``'s structure AND shardings.

    Template leaves that are jax.Arrays keep their sharding: each device's
    shard is assembled straight from the intersecting files (works across
    mesh/sharding changes). Plain array leaves load fully."""
    with open(os.path.join(path, _MANIFEST), "rb") as f:
        manifest = serialization.msgpack_restore(f.read())
    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    out = []
    for kp, tmpl in flat:
        key = jax.tree_util.keystr(kp)
        meta = manifest[key]
        shape = tuple(int(s) for s in meta["shape"])
        cache: dict = {}
        if isinstance(tmpl, jax.Array) and hasattr(tmpl, "sharding"):
            arr = jax.make_array_from_callback(
                shape, tmpl.sharding,
                lambda idx, m=meta: jnp.asarray(
                    _assemble(_bounds(idx, shape), m, path, cache)))
        else:
            full = _assemble(_bounds((slice(None),) * len(shape), shape),
                             meta, path, cache)
            arr = jnp.asarray(full)
        out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out)
