"""Encoder-decoder (T5) serving: continuous batching on a paged KV cache.

The reference's encoder-decoder surface is its Transformer{Encoder,Decoder}
pairing (/root/reference/layers/transformer.py:95-203); this is the
production serving loop for the T5 family (models/t5.py), mirroring the
GPT GenerationEngine's design with the enc-dec twists:

- Admission = ONE jitted encode dispatch: the source is padded to a fixed
  ``max_src_len`` bucket (one compile, length-masked via in-kernel
  segments), the encoder runs once, and every decoder layer's CROSS K/V is
  projected from the memory and scattered into per-slot buffers. Cross
  attention never changes after admission, so the encoder memory itself is
  not kept — only its projections are (the same trick the enc-dec beam
  search uses via its gather-exempt aux cache, models/beam.py).
- Decode = one jitted, state-donating step for all live slots: the decoder
  SELF-attention K/V lives in shared pages (same page table/trash-page
  scheme as the GPT engine), and T5's relative-position bias reaches the
  paged Pallas kernel as a per-step additive bias over absolute positions
  (ops.paged_attention(bias=...)) — built by indexing a precomputed
  [h, max_tokens] distance table with ``query_pos - position``. Cross
  attention is a dense masked matvec against the slot's projected K/V.
- There is no decoder prompt (decoding starts from
  ``decoder_start_token``), so no prefill path is needed; sequences
  join/leave between steps and pages are reclaimed on ``finish``.

T5 attention is UNSCALED (scale=1.0) and its projections are biasless —
both honored here. Token-exact vs ``T5.greedy_decode`` (tested).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import ops
from np_modeling_tpu.models.t5 import relative_position_bucket
from np_modeling_tpu.nn.module import maybe_cast
from np_modeling_tpu.serving.kv_cache import OutOfPagesError


@dataclasses.dataclass
class Seq2SeqEngine:
    """Continuous-batching decode for a :class:`models.T5`.

    ``max_src_len``: per-slot encoder budget (sources are padded to it —
    one admission compile for any source length). ``max_tgt_len``: decode
    capacity per sequence (page-table width). ``start_token``: T5's
    decoder_start_token_id (0 = pad for HF checkpoints)."""

    model: object                # models.T5
    params: dict
    max_src_len: int = 128
    max_tgt_len: int = 128
    total_pages: int = 128
    page_size: int = 16
    max_seqs: int = 8
    start_token: int = 0
    temperature: float = 0.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    seed: int = 0

    def __post_init__(self):
        c = self.model.config
        h, dkv = c.num_heads, c.d_kv
        L = c.num_decoder_layers
        self.max_pages = -(-self.max_tgt_len // self.page_size)
        self._max_tokens = self.max_tgt_len
        shape = (h, self.total_pages, self.page_size, dkv)
        self._state = {
            "k_pages": [jnp.zeros(shape, jnp.float32) for _ in range(L)],
            "v_pages": [jnp.zeros(shape, jnp.float32) for _ in range(L)],
            "ck": [jnp.zeros((self.max_seqs, h, self.max_src_len, dkv),
                             jnp.float32) for _ in range(L)],
            "cv": [jnp.zeros((self.max_seqs, h, self.max_src_len, dkv),
                             jnp.float32) for _ in range(L)],
            "table": jnp.zeros((self.max_seqs, self.max_pages), jnp.int32),
            "lengths": jnp.zeros((self.max_seqs,), jnp.int32),
            "last_tok": jnp.full((self.max_seqs,), self.start_token,
                                 jnp.int32),
            "active": jnp.zeros((self.max_seqs,), bool),
            "src_len": jnp.zeros((self.max_seqs,), jnp.int32),
        }
        self._trash = self.total_pages - 1
        self._free = list(range(self.total_pages - 2, -1, -1))
        self._slots: dict[int, int] = {}
        self._host_len: dict[int, int] = {}
        self._seq_pages: dict[int, list[int]] = {}
        self._rng = jax.random.PRNGKey(self.seed)
        self._jit_admit = jax.jit(self._admit_device, donate_argnums=(0,))
        self._jit_step = jax.jit(self._device_step, donate_argnums=(0,))
        self._jit_multi: dict[int, object] = {}

    # ---- request lifecycle ------------------------------------------------

    @property
    def live(self):
        return sorted(self._slots)

    def capacity(self, seq_id: int) -> int:
        return self._max_tokens - self._host_len[seq_id]

    def add_request(self, seq_id: int, src_tokens) -> None:
        """Encode a source and seed a decode slot. Decoding starts from
        ``start_token`` on the next :meth:`step` (there is no decoder
        prompt, hence no first-token return — unlike the GPT engine)."""
        if seq_id in self._slots:
            raise ValueError(f"sequence {seq_id} already live")
        used = set(self._slots.values())
        free_slots = [s for s in range(self.max_seqs) if s not in used]
        if not free_slots:
            raise RuntimeError(f"all {self.max_seqs} slots busy")
        slot = free_slots[0]
        src = np.asarray(src_tokens)
        n = int(src.shape[0])
        if n > self.max_src_len:
            raise ValueError(f"source length {n} > max_src_len="
                             f"{self.max_src_len}")
        padded = np.zeros((self.max_src_len,), np.int32)
        padded[:n] = src
        self._state = self._jit_admit(self._state, self.params,
                                      jnp.asarray(padded), jnp.int32(n),
                                      jnp.int32(slot))
        self._slots[seq_id] = slot
        self._host_len[seq_id] = 0
        self._seq_pages[seq_id] = []
        return None

    def _admit_device(self, state, params, src, src_len, slot):
        """One dispatch: encode (length-masked) + project every decoder
        layer's cross K/V + reset the slot's decode bookkeeping."""
        m = self.model
        c = m.config
        valid = jnp.arange(self.max_src_len) < src_len
        memory = m.encode(params, src[None], src_valid=valid[None])
        for i in range(c.num_decoder_layers):
            cp = params[f"dec_{i}"]["cross_attention"]
            kc = m.cross_attn._project(memory, cp["wk"], None)  # [1,h,s,dk]
            vc = m.cross_attn._project(memory, cp["wv"], None)
            state["ck"][i] = state["ck"][i].at[slot].set(
                kc[0].astype(jnp.float32))
            state["cv"][i] = state["cv"][i].at[slot].set(
                vc[0].astype(jnp.float32))
        state["table"] = state["table"].at[slot].set(self._trash)
        state["lengths"] = state["lengths"].at[slot].set(0)
        state["last_tok"] = state["last_tok"].at[slot].set(self.start_token)
        state["active"] = state["active"].at[slot].set(True)
        state["src_len"] = state["src_len"].at[slot].set(src_len)
        return state

    def finish(self, seq_id: int) -> None:
        slot = self._slots.pop(seq_id)
        del self._host_len[seq_id]
        for p in self._seq_pages.pop(seq_id):
            self._free.append(p)
        st = dict(self._state)
        st["active"] = st["active"].at[slot].set(False)
        st["lengths"] = st["lengths"].at[slot].set(0)
        self._state = st

    # ---- page growth (host control plane) ----------------------------------

    def _grow_tables(self, n: int):
        upd = []
        needs = []
        total = 0
        for seq_id, slot in self._slots.items():
            if self._host_len[seq_id] + n > self._max_tokens:
                raise OutOfPagesError(
                    f"sequence {seq_id} would exceed the "
                    f"{self._max_tokens}-token capacity (max_tgt_len)")
            need = -(-(self._host_len[seq_id] + n) // self.page_size)
            extra = need - len(self._seq_pages[seq_id])
            if extra > 0:
                needs.append((seq_id, slot, extra))
                total += extra
        if len(self._free) < total:
            raise OutOfPagesError(
                f"out of KV pages ({self.total_pages} total; need {total}, "
                f"free {len(self._free)})")
        for seq_id, slot, extra in needs:
            for _ in range(extra):
                pg = self._free.pop()
                self._seq_pages[seq_id].append(pg)
                upd.append((slot, len(self._seq_pages[seq_id]) - 1, pg))
        if upd:
            slots, poss, pgs = (jnp.asarray(u, jnp.int32)
                                for u in zip(*upd))
            st = dict(self._state)
            st["table"] = st["table"].at[slots, poss].set(pgs)
            self._state = st
        return self._state

    # ---- decode -------------------------------------------------------------

    def step(self) -> dict:
        """Decode ONE token for every live sequence; {seq_id: token}."""
        if not self._slots:
            return {}
        st = self._grow_tables(1)
        self._rng, sub = jax.random.split(self._rng)
        self._state, toks = self._jit_step(st, self.params, sub)
        toks_np = np.asarray(toks)
        out = {}
        for seq_id, slot in sorted(self._slots.items()):
            self._host_len[seq_id] += 1
            out[seq_id] = int(toks_np[slot])
        return out

    def step_many(self, n: int) -> dict:
        """Decode ``n`` tokens per live sequence in ONE dispatch
        (lax.scan over the step); {seq_id: [tokens]}."""
        if not self._slots:
            return {}
        st = self._grow_tables(n)
        if n not in self._jit_multi:
            def multi(state, params, key, _n=n):
                def body(state, i):
                    return self._device_step(state, params,
                                             jax.random.fold_in(key, i))
                return jax.lax.scan(body, state, jnp.arange(_n))
            self._jit_multi[n] = jax.jit(multi, donate_argnums=(0,))
        self._rng, sub = jax.random.split(self._rng)
        self._state, toks = self._jit_multi[n](st, self.params, sub)
        toks_np = np.asarray(toks)                         # [n, max_seqs]
        out = {}
        for seq_id, slot in sorted(self._slots.items()):
            self._host_len[seq_id] += n
            out[seq_id] = [int(t) for t in toks_np[:, slot]]
        return out

    # ---- the jitted device step ---------------------------------------------

    def _relpos_bias_rows(self, params):
        """[h, max_tokens] bias-by-DISTANCE table: column d is the bias a
        query applies to the key ``d`` positions behind it (rel = -d,
        causal bucketing). Built in-graph from the decoder relpos
        embedding; per-slot rows are then a gather by (query_pos - pos)."""
        c = self.model.config
        n = self.max_pages * self.page_size
        dist = jnp.arange(n)
        bucket = relative_position_bucket(
            -dist, bidirectional=False, num_buckets=c.relpos_buckets,
            max_distance=c.relpos_max_distance)
        return jnp.asarray(params["dec_relpos"])[bucket].T  # [h, n]

    def _device_step(self, state, params, key):
        m = self.model
        c = m.config
        active, lengths = state["active"], state["lengths"]
        S = self.max_seqs
        n_pos = self.max_pages * self.page_size

        y = m.embed.apply(params["embedding"], state["last_tok"][:, None])
        y = maybe_cast(y, c.dtype)                          # [S, 1, d]

        # Relative-position bias over absolute cache positions: the query
        # sits at position `lengths`, position j gets bias_by_dist[p - j].
        by_dist = self._relpos_bias_rows(params)            # [h, n_pos]
        dist = jnp.clip(lengths[:, None] - jnp.arange(n_pos), 0, n_pos - 1)
        bias = jnp.moveaxis(by_dist[:, dist], 1, 0)         # [S, h, n_pos]

        # Position/page of the appended token (query token itself).
        page_pos = lengths // self.page_size
        pages = jnp.take_along_axis(state["table"], page_pos[:, None],
                                    axis=1)[:, 0]
        pages = jnp.where(active, pages, self._trash)
        offs = lengths % self.page_size
        att_len = jnp.where(active, lengths + 1, 0)
        src_mask = (jnp.arange(self.max_src_len)[None]
                    < state["src_len"][:, None])            # [S, src]

        for i in range(c.num_decoder_layers):
            lp = params[f"dec_{i}"]
            # -- paged causal self-attention with relpos bias
            h_in = m.norm.apply(lp["norm1"], y)
            ap = lp["self_attention"]
            q = m.dec_attn._project(h_in, ap["wq"], None)   # [S, h, 1, dk]
            k = m.dec_attn._project(h_in, ap["wk"], None)
            v = m.dec_attn._project(h_in, ap["wv"], None)
            state["k_pages"][i] = state["k_pages"][i].at[
                :, pages, offs].set(k[:, :, 0].swapaxes(0, 1)
                                    .astype(jnp.float32))
            state["v_pages"][i] = state["v_pages"][i].at[
                :, pages, offs].set(v[:, :, 0].swapaxes(0, 1)
                                    .astype(jnp.float32))
            o = ops.paged_attention(jnp.swapaxes(q, 1, 2),  # [S, 1, h, dk]
                                    state["k_pages"][i],
                                    state["v_pages"][i], att_len,
                                    state["table"], scale=1.0, bias=bias)
            y = y + self._out_proj(m, ap, o.astype(y.dtype))

            # -- dense cross attention against the slot's projected K/V
            h_in = m.norm.apply(lp["norm2"], y)
            cp = lp["cross_attention"]
            qc = m.cross_attn._project(h_in, cp["wq"], None)  # [S, h, 1, dk]
            s = jnp.einsum("shtd,shkd->shtk", qc.astype(jnp.float32),
                           state["ck"][i])                  # unscaled (T5)
            s = jnp.where(src_mask[:, None, None], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            oc = jnp.einsum("shtk,shkd->sthd", p, state["cv"][i])
            y = y + self._out_proj(m, cp, oc.astype(y.dtype))

            # -- FFN
            h_in = m.norm.apply(lp["norm3"], y)
            y = y + m._ffn(lp["ffn"], h_in).astype(y.dtype)

        y = m.norm.apply(params["dec_norm"], y)
        logits = m._head(params, y)[:, 0].astype(jnp.float32)
        new_tok = self._sample(logits, key)
        state["last_tok"] = jnp.where(active, new_tok, state["last_tok"])
        state["lengths"] = lengths + active.astype(jnp.int32)
        return state, jnp.where(active, new_tok, -1)

    @staticmethod
    def _out_proj(m, ap, o):
        """[S, t, h, dk] attention output through wo [h, dk, d]."""
        h, dk, d = ap["wo"].shape
        wo = maybe_cast(ap["wo"], m.config.dtype).reshape(h * dk, d)
        return ops.linear(o.reshape(o.shape[0], o.shape[1], h * dk), wo)

    def _sample(self, logits, key):
        if self.temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        from np_modeling_tpu.models.transformer_lm import GPT
        return GPT._sample(logits, key, self.temperature, 0,
                           self.top_k, self.top_p).astype(jnp.int32)
