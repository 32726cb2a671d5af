"""Paged KV cache: virtual memory for decode-time KV state.

Pages are fixed-size [page_size, head_dim] slabs in device HBM; each live
sequence owns an ordered list of page indices (its page table). Allocation
is a host-side free list (serving control plane is host logic; the data
plane — appends and attention — stays on device). Pairs with
ops.paged_attention for the decode kernel.

The reference framework has no serving/decode path at all (its decoder has
``TODO: support cache``, /root/reference/layers/transformer.py:120).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


class OutOfPagesError(RuntimeError):
    pass


@dataclasses.dataclass
class PagedKVCache:
    """``quantize=True`` stores int8 pages + fp32 per-token scales (halves
    the decode kernel's page-load bandwidth; ops.quantization)."""

    num_kv_heads: int
    head_dim: int
    total_pages: int
    page_size: int
    max_seqs: int
    dtype: object = jnp.float32
    quantize: bool = False

    def __post_init__(self):
        shape = (self.num_kv_heads, self.total_pages, self.page_size,
                 self.head_dim)
        store_dtype = jnp.int8 if self.quantize else self.dtype
        self.k_pages = jnp.zeros(shape, store_dtype)
        self.v_pages = jnp.zeros(shape, store_dtype)
        if self.quantize:
            sshape = shape[:-1] + (1,)
            self.k_scales = jnp.zeros(sshape, jnp.float32)
            self.v_scales = jnp.zeros(sshape, jnp.float32)
        else:
            self.k_scales = self.v_scales = None
        self._free = list(range(self.total_pages - 1, -1, -1))
        self._tables: dict[int, list[int]] = {}
        self._lengths: dict[int, int] = {}

    # ---- control plane (host) ------------------------------------------

    def allocate(self, seq_id: int) -> None:
        if seq_id in self._tables:
            raise ValueError(f"sequence {seq_id} already allocated")
        self._tables[seq_id] = []
        self._lengths[seq_id] = 0

    def free(self, seq_id: int) -> None:
        self._free.extend(self._tables.pop(seq_id))
        del self._lengths[seq_id]

    def length(self, seq_id: int) -> int:
        return self._lengths[seq_id]

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def _page_for_append(self, seq_id: int, n_new: int) -> None:
        """Grow the sequence's page table to cover n_new more tokens."""
        need = -(-(self._lengths[seq_id] + n_new) // self.page_size)
        while len(self._tables[seq_id]) < need:
            if not self._free:
                raise OutOfPagesError(
                    f"out of KV pages ({self.total_pages} total)")
            self._tables[seq_id].append(self._free.pop())

    # ---- data plane (device) -------------------------------------------

    def append(self, seq_id: int, k_new: jax.Array, v_new: jax.Array) -> None:
        """Append tokens. k_new/v_new: [num_kv_heads, n_new, head_dim]."""
        from np_modeling_tpu.ops.quantization import quantize_int8

        n_new = k_new.shape[1]
        self._page_for_append(seq_id, n_new)
        pos = self._lengths[seq_id]
        table = self._tables[seq_id]
        if self.quantize:
            kq, vq = quantize_int8(k_new), quantize_int8(v_new)
            k_new, k_sc = kq.values, kq.scales   # scales: [hkv, n_new, 1]
            v_new, v_sc = vq.values, vq.scales
        # Write token-by-token slots; contiguous runs within a page are
        # written in one dynamic_update_slice.
        start = 0
        while start < n_new:
            tok = pos + start
            page = table[tok // self.page_size]
            slot = tok % self.page_size
            run = min(n_new - start, self.page_size - slot)
            ks = jax.lax.dynamic_slice_in_dim(k_new, start, run, axis=1)
            vs = jax.lax.dynamic_slice_in_dim(v_new, start, run, axis=1)
            self.k_pages = jax.lax.dynamic_update_slice(
                self.k_pages, ks[:, None].astype(self.k_pages.dtype),
                (0, page, slot, 0))
            self.v_pages = jax.lax.dynamic_update_slice(
                self.v_pages, vs[:, None].astype(self.v_pages.dtype),
                (0, page, slot, 0))
            if self.quantize:
                kss = jax.lax.dynamic_slice_in_dim(k_sc, start, run, axis=1)
                vss = jax.lax.dynamic_slice_in_dim(v_sc, start, run, axis=1)
                self.k_scales = jax.lax.dynamic_update_slice(
                    self.k_scales, kss[:, None], (0, page, slot, 0))
                self.v_scales = jax.lax.dynamic_update_slice(
                    self.v_scales, vss[:, None], (0, page, slot, 0))
            start += run
        self._lengths[seq_id] = pos + n_new

    def attention_kwargs(self):
        """Extra kwargs for ops.paged_attention (scales when quantized)."""
        if self.quantize:
            return {"k_scales": self.k_scales, "v_scales": self.v_scales}
        return {}

    def batch_views(self, seq_ids):
        """(lengths [B], page_indices [B, max_pages]) for paged_attention."""
        max_pages = max((len(self._tables[s]) for s in seq_ids), default=1)
        max_pages = max(max_pages, 1)
        tables = np.zeros((len(seq_ids), max_pages), np.int32)
        lengths = np.zeros(len(seq_ids), np.int32)
        for i, s in enumerate(seq_ids):
            t = self._tables[s]
            tables[i, :len(t)] = t
            lengths[i] = self._lengths[s]
        return jnp.asarray(lengths), jnp.asarray(tables)
