"""Serving: paged KV-cache management + paged decode attention."""

from np_modeling_tpu.serving.kv_cache import PagedKVCache

__all__ = ["PagedKVCache"]
