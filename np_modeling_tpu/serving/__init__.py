"""Serving: paged KV-cache management, paged decode attention, engine."""

from np_modeling_tpu.serving.engine import GenerationEngine
from np_modeling_tpu.serving.kv_cache import PagedKVCache
from np_modeling_tpu.serving.tokenizer import BPETokenizer

__all__ = ["BPETokenizer", "GenerationEngine", "PagedKVCache"]
