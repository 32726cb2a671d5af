"""Generation engine: continuous-batching GPT serving on a paged KV cache.

Requests are prefilled with one full forward pass (collect_kv=True hands back
each layer's projected K/V to seed the pages), then decoded one token per
step for all live sequences together, with attention over the paged cache
(ops.paged_attention). Sequences join/leave between steps (continuous
batching); pages are reclaimed on completion.

This is the decode path the reference explicitly lacks
(``TODO: support cache``, /root/reference/layers/transformer.py:120).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.serving.kv_cache import PagedKVCache


@dataclasses.dataclass
class GenerationEngine:
    gpt: object                  # models.GPT
    params: dict
    total_pages: int = 256
    page_size: int = 16
    max_seqs: int = 16
    quantize_kv: bool = False

    def __post_init__(self):
        c = self.gpt.config
        assert not c.scan_layers, "engine requires scan_layers=False"
        hq, hkv, dk = self.gpt.block.attn._dims(c.d_model)
        self._dims = (hq, hkv, dk)
        self.caches = [
            PagedKVCache(hkv, dk, self.total_pages, self.page_size,
                         self.max_seqs, quantize=self.quantize_kv)
            for _ in range(c.num_layers)
        ]
        self._last_token: dict[int, jax.Array] = {}

    # ---- request lifecycle ----------------------------------------------

    def add_request(self, seq_id: int, prompt_tokens) -> int:
        """Prefill a prompt; returns the first generated (greedy) token."""
        prompt = jnp.asarray(prompt_tokens)[None, :]       # [1, s]
        logits, kvs = self.gpt.apply(self.params, prompt, collect_kv=True)
        for cache, (k, v) in zip(self.caches, kvs):
            cache.allocate(seq_id)
            cache.append(seq_id, k[0], v[0])               # [hkv, s, dk]
        tok = int(jnp.argmax(logits[0, -1]))
        self._last_token[seq_id] = tok
        return tok

    def finish(self, seq_id: int) -> None:
        for cache in self.caches:
            cache.free(seq_id)
        del self._last_token[seq_id]

    @property
    def live(self):
        return sorted(self._last_token)

    # ---- decode step -----------------------------------------------------

    def step(self) -> dict:
        """Decode ONE token for every live sequence; returns {seq_id: token}."""
        seq_ids = self.live
        if not seq_ids:
            return {}
        c = self.gpt.config
        p = self.params
        tokens = jnp.asarray([self._last_token[s] for s in seq_ids])
        positions = jnp.asarray([self.caches[0].length(s) for s in seq_ids])

        x = ops.embedding_lookup(p["embedding"]["table"], tokens)
        if c.positional == "learned":
            x = x + ops.embedding_lookup(p["pos_embedding"]["table"],
                                         positions)
        if c.dtype is not None:
            x = x.astype(c.dtype)
        x = x[:, None, :]                                   # [B, 1, d]

        for li in range(c.num_layers):
            x = self._block_step(p[f"layer_{li}"], x, li, seq_ids)

        x = self.gpt.final_norm.apply(p["final_norm"], x)
        if c.tie_embeddings:
            table = p["embedding"]["table"]
            logits = jnp.einsum("bsd,vd->bsv", x, table.astype(x.dtype),
                                preferred_element_type=jnp.float32)
        else:
            logits = self.gpt.lm_head.apply(p["lm_head"], x)
        out = {}
        new_toks = jnp.argmax(logits[:, 0], axis=-1)
        for i, s in enumerate(seq_ids):
            tok = int(new_toks[i])
            self._last_token[s] = tok
            out[s] = tok
        return out

    def _block_step(self, bp, x, layer_idx, seq_ids):
        """One transformer block on a [B, 1, d] decode slice, with the
        self-attention served from the layer's paged cache. Mirrors
        TransformerEncoderBlock.apply (eval mode, both norm orders)."""
        block = self.gpt.block
        attn = block.attn
        cache = self.caches[layer_idx]

        skip = x
        y = block.norm1.apply(bp["norm1"], x) if block.norm_first else x
        ap = bp["self_attention"]
        q = attn._project(y, ap["wq"], ap["bq"])            # [B, hq, 1, dk]
        k = attn._project(y, ap["wk"], ap["bk"])
        v = attn._project(y, ap["wv"], ap["bv"])
        if attn.rope:
            from np_modeling_tpu.ops.rope import apply_rope
            # Per-sequence decode positions [B, 1] (cache stores rotated k).
            pos = jnp.asarray([[self.caches[layer_idx].length(s)]
                               for s in seq_ids])
            q = apply_rope(q, pos, attn.rope_base)
            k = apply_rope(k, pos, attn.rope_base)
        for i, s in enumerate(seq_ids):
            cache.append(s, k[i], v[i])                     # token joins cache
        lengths, tables = cache.batch_views(seq_ids)
        o = ops.paged_attention(q[:, :, 0, :], cache.k_pages, cache.v_pages,
                                lengths, tables, **cache.attention_kwargs())
        hq, dk, d_out = ap["wo"].shape
        o = o.reshape(x.shape[0], 1, hq * dk).astype(x.dtype)
        y = ops.linear(o, ap["wo"].reshape(hq * dk, d_out).astype(x.dtype),
                       ap["bo"].astype(x.dtype))
        y = y + skip
        if not block.norm_first:
            y = block.norm1.apply(bp["norm1"], y)

        skip = y
        z = block.norm2.apply(bp["norm2"], y) if block.norm_first else y
        z = block.dense1.apply(bp["dense1"], z)
        z = ops.linear(z, bp["dense2"]["w"].astype(x.dtype),
                       bp["dense2"]["b"].astype(x.dtype))
        z = z + skip
        if not block.norm_first:
            z = block.norm2.apply(bp["norm2"], z)
        return z
