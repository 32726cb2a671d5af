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
  (shard intersection assembly).

MULTI-HOST: each process writes only its addressable replica-0 shards
plus a PER-HOST manifest (``manifest.p00000.msgpack``); a barrier orders
data files before manifests. Restore merges every per-host manifest
(shard lists union per leaf) and assembles only the reader's addressable
shards — a checkpoint saved by N processes restores on M processes or on
a different mesh, provided the directory is on a filesystem all hosts
can read (the standard pod setup). Proven end-to-end by the 2-process
dryrun (``parallel/_multihost_dryrun.py``).
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

    Each process writes only the shards it owns as REPLICA 0 (global
    dedup: replicated copies — across devices or hosts — are saved
    exactly once cluster-wide). Plain numpy leaves are written by process
    0 as a single full-array file. The manifest is written last — its
    presence marks a complete checkpoint; multi-process runs write one
    manifest per process (``manifest.pNNNNN.msgpack``) after a barrier
    that orders every host's data files before any manifest."""
    os.makedirs(path, exist_ok=True)
    pid = jax.process_index()
    multi = jax.process_count() > 1
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    manifest = {}
    for i, (kp, leaf) in enumerate(flat):
        key = jax.tree_util.keystr(kp)
        entries = []
        if isinstance(leaf, jax.Array):
            for sh in leaf.addressable_shards:
                if sh.replica_id != 0:   # replicated copies: save once
                    continue
                b = _bounds(sh.index, leaf.shape)
                fname = (f"leaf{i:05d}_p{pid:05d}"
                         f"_shard{len(entries):03d}.npy")
                np.save(os.path.join(path, fname), np.asarray(sh.data),
                        allow_pickle=False)
                entries.append({"index": b, "file": fname})
            dtype = str(np.asarray(leaf.addressable_shards[0].data).dtype) \
                if leaf.addressable_shards else str(leaf.dtype)
        else:
            arr = np.asarray(leaf)
            dtype = str(arr.dtype)
            if pid == 0:
                fname = f"leaf{i:05d}_full.npy"
                np.save(os.path.join(path, fname), arr, allow_pickle=False)
                entries.append({"index": _bounds(
                    (slice(None),) * arr.ndim, arr.shape), "file": fname})
        manifest[key] = {"shape": list(np.shape(leaf)),
                         "dtype": dtype,
                         "shards": entries}
    if multi:
        # All data files exist before ANY manifest appears.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("ckpt_data_files")
    # Re-saving into a previously-used directory: remove manifests the
    # CURRENT save will not rewrite, or a stale single-process manifest
    # (resp. stale high-rank manifests from a larger process count) would
    # shadow (resp. be unioned with) this save's and silently restore old
    # or mixed data. Same-name manifests are atomically overwritten below.
    if pid == 0:
        import glob
        stale = [os.path.join(path, _MANIFEST)] if multi else []
        for p in glob.glob(os.path.join(path, "manifest.p*.msgpack")):
            rank = int(os.path.basename(p)[len("manifest.p"):-len(".msgpack")])
            if not multi or rank >= jax.process_count():
                stale.append(p)
        for p in stale:
            if os.path.exists(p):
                os.unlink(p)
    manifest["__num_processes__"] = jax.process_count()
    data = serialization.msgpack_serialize(manifest)
    name = f"manifest.p{pid:05d}.msgpack" if multi else _MANIFEST
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(path, name))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    if multi:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("ckpt_manifests")


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


def _read_manifest(path: str):
    """The single-process manifest, or all per-host manifests merged
    (shard lists unioned per leaf key)."""
    single = os.path.join(path, _MANIFEST)
    if os.path.exists(single):
        with open(single, "rb") as f:
            m = serialization.msgpack_restore(f.read())
        m.pop("__num_processes__", None)
        return m
    import glob
    parts = sorted(glob.glob(os.path.join(path, "manifest.p*.msgpack")))
    if not parts:
        raise FileNotFoundError(f"no manifest in checkpoint dir {path!r}")
    manifest = {}
    counts = set()
    for p in parts:
        with open(p, "rb") as f:
            part = serialization.msgpack_restore(f.read())
        counts.add(int(part.pop("__num_processes__", len(parts))))
        for key, meta in part.items():
            if key in manifest:
                manifest[key]["shards"] = (list(manifest[key]["shards"])
                                           + list(meta["shards"]))
            else:
                manifest[key] = dict(meta, shards=list(meta["shards"]))
    # Mixed-generation guard: every per-host manifest must come from the
    # same save (same process count) and all of them must be present.
    if counts != {len(parts)}:
        raise RuntimeError(
            f"checkpoint dir {path!r} holds manifests from different saves "
            f"({len(parts)} part files, process counts {sorted(counts)}); "
            "re-save the checkpoint or remove the stale manifests")
    return manifest


def load_checkpoint_sharded(path: str, target):
    """Restore into ``target``'s structure AND shardings.

    Template leaves that are jax.Arrays keep their sharding: each device's
    shard is assembled straight from the intersecting files (works across
    mesh/sharding changes, and across a different process count than
    saved — only the reader's addressable shards are assembled). Plain
    array leaves load fully."""
    manifest = _read_manifest(path)
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
