"""Generation engine: continuous-batching GPT serving on a paged KV cache.

The decode data plane is ONE jitted, state-donating device step for all
slots: embedding, per-layer batched page append (scatter by (page, slot)
indices), paged attention over the shared page table, FFN/MoE, and
temperature/top-k sampling — a single dispatch per generated token
regardless of how many sequences are live. The host keeps only the control
plane: the page free list, seq-id -> slot mapping, and page-table growth
(one device scatter every ``page_size`` steps per sequence).

Requests are prefilled with one full forward pass (collect_kv=True hands
back each layer's projected K/V to seed the pages). Sequences join/leave
between steps (continuous batching); pages are reclaimed on completion.
Sliding-window models (GPTConfig.attention_window) decode with the same
window mask as training. MoE GPTs are served (router runs per decode slot).

Speculative decoding: construct with ``draft_gpt=/draft_params=`` and call
``step_speculative(gamma)`` — the draft lane keeps its own pages/tables,
the target verifies all gamma+1 positions in ONE multi-token paged forward
(ops.paged_attention 4-D q), and each sequence commits its accepted prefix
plus one target token. Token-exact vs plain greedy ``step()`` for any
draft. Mixing ``step()`` and ``step_speculative()`` stays exact but desyncs
the draft cache (acceptance drops until the next prefill).

Multi-LoRA serving: construct with ``lora_adapters={name: adapters}`` and
pass ``add_request(..., adapter=name)`` — every live slot decodes with its
own adapter in the SAME jitted dispatch (per-slot gathers from stacked
adapter tensors; index 0 = base model).

This is the decode path the reference explicitly lacks
(``TODO: support cache``, /root/reference/layers/transformer.py:120).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import ops
from np_modeling_tpu.serving.kv_cache import OutOfPagesError


@dataclasses.dataclass
class GenerationEngine:
    """``temperature=0`` decodes greedily; otherwise temperature/top-k
    sampling runs in-graph. ``quantize_kv`` stores int8 pages + per-token
    scales (halves decode-kernel page bandwidth)."""

    gpt: object                  # models.GPT
    params: dict
    total_pages: int = 256
    page_size: int = 16
    max_seqs: int = 16
    quantize_kv: bool = False
    kv_dtype: object = None      # page dtype; None = fp32 (exact vs dense
                                 # decode), jnp.bfloat16 halves page traffic
    temperature: float = 0.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    sampling: Optional[object] = None  # serving.SamplingParams — the full
                                 # decode-time control surface (min_p,
                                 # repetition/presence/frequency penalties,
                                 # logit_bias, banned_tokens). Overrides the
                                 # three plain fields above. Penalty token
                                 # statistics live in the donated device
                                 # state and update in-graph per step.
    per_request_sampling: bool = False   # PER-REQUEST controls: each
                                 # add_request(..., sampling=SamplingParams)
                                 # decodes with its own temperature/top-k/
                                 # top-p/min-p/penalties/logit-bias in the
                                 # SAME jitted dispatch. All knobs are device
                                 # DATA (a [max_seqs, 7] row table + [max_
                                 # seqs, vocab] bias/count tables), so
                                 # joining/leaving never recompiles. Slots
                                 # without an explicit SamplingParams fall
                                 # back to the plain fields above.
    constraints: Optional[dict] = None   # {name: serving.TokenDFA} —
                                 # GRAMMAR-CONSTRAINED decoding: requests
                                 # pick a constraint (add_request(...,
                                 # constraint=name)) and the engine masks
                                 # each step's logits by the slot's DFA
                                 # state (a row gather from the stacked
                                 # [n_dfas, states, vocab] table; index 0 =
                                 # unconstrained), stepping the state
                                 # in-graph on the sampled token. Composes
                                 # with every sampling mode; incompatible
                                 # with the draft lane / step_lookup (their
                                 # verify argmax bypasses masks).
    enable_prefix_cache: bool = False   # content-addressed KV page reuse
                                 # ACROSS requests (automatic prefix
                                 # caching): every fully-filled prompt page
                                 # is keyed by a chained hash of the tokens
                                 # it covers (+ adapter id); a new request
                                 # SHARES its longest cached page-prefix
                                 # (refcounted, append-only — the fork
                                 # mechanism) and prefills only the suffix.
                                 # Entries hold their own refcount so they
                                 # outlive finish(); LRU-evicted when the
                                 # free list runs short. Requires chunked
                                 # prefill; draft lane not supported.
    seed: int = 0
    draft_gpt: object = None     # optional draft model -> step_speculative
    draft_params: dict = None
    lora_adapters: Optional[dict] = None   # {name: adapters pytree from
                                 # training.lora_init(ATTENTION_TARGETS)}.
                                 # MULTI-LoRA serving: each request picks an
                                 # adapter (add_request(adapter=name)); all
                                 # live slots decode in ONE dispatch — the
                                 # factored delta x@A[idx]@B[idx] is gathered
                                 # per slot from stacked [n+1, ...] adapter
                                 # tensors (index 0 = base model). Adapters
                                 # must share targets and rank.
    lora_alpha: Optional[float] = None     # LoRA scale (default: rank)
    draft_total_pages: Optional[int] = None   # default: total_pages
    prefill_chunk_size: Optional[int] = 256   # paged CHUNKED prefill (the
                                 # default): the prompt streams through the
                                 # multi-token paged path in fixed chunks —
                                 # O(chunk) activation memory for any prompt
                                 # length, ONE compile per chunk size, and
                                 # every chunk is one jitted dispatch.
                                 # MEASURED (4L/d1024, 1536-token prompt,
                                 # warm, single-row chunks): 113 ms vs
                                 # 5989 ms for the legacy dense prefill
                                 # (whose collect_kv forward runs eagerly —
                                 # dispatch-bound, ~53x slower through this
                                 # machine's TPU tunnel). None selects the
                                 # dense path. Capacity-limited MoE also
                                 # uses dense (routing is population-
                                 # coupled); NO-DROP MoE
                                 # (moe_capacity_factor=None) chunks
                                 # exactly — per-token routing.
    mesh: Optional[object] = None  # jax.sharding.Mesh -> TENSOR-PARALLEL
                                 # serving: weights shard by
                                 # parallel.TRANSFORMER_RULES, KV pages by
                                 # kv-head over ``tp_axis``, and every
                                 # jitted step runs GSPMD-partitioned with
                                 # the Pallas paged-attention call wrapped
                                 # in a shard_map island (heads are
                                 # independent — no collective inside; XLA
                                 # inserts the o-proj/FFN all-reduces).
                                 # Requires num_kv_heads % tp == 0 and the
                                 # chunked prefill path (the default).
    tp_axis: str = "tp"

    def _make_lane_state(self, gpt, total_pages):
        c = gpt.config
        mla = getattr(c, "mla", None)
        if mla:
            # Latent pages: ONE shared "kv head" of kv_lora_rank + rope
            # numbers per token; the latent row doubles as v, so there is
            # no v_pages buffer at all.
            hkv, dk = 1, mla["kv_lora_rank"] + mla["qk_rope_head_dim"]
        else:
            _, hkv, dk = gpt.block.attn._dims(c.d_model)
        store = (jnp.int8 if self.quantize_kv
                 else (self.kv_dtype or jnp.float32))
        # One page array PER LAYER (not one stacked [L, ...] array): the
        # per-layer scatter then has adjacent advanced indices and XLA
        # updates the donated buffer in place — a stacked layout's leading
        # layer index forced multi-GB copies per appended token.
        shape = (hkv, total_pages, self.page_size, dk)
        L = c.num_layers
        state = {
            "k_pages": [jnp.zeros(shape, store) for _ in range(L)],
            "table": jnp.zeros((self.max_seqs, self.max_pages), jnp.int32),
            "lengths": jnp.zeros((self.max_seqs,), jnp.int32),
            "last_tok": jnp.zeros((self.max_seqs,), jnp.int32),
            "active": jnp.zeros((self.max_seqs,), bool),
            "adapter": jnp.zeros((self.max_seqs,), jnp.int32),
        }
        if not mla:
            state["v_pages"] = [jnp.zeros(shape, store) for _ in range(L)]
        if (self._sp_stats or self.per_request_sampling) and gpt is self.gpt:
            # Penalty statistics ride the TARGET lane only (sampling reads
            # target logits): int32 generated-token counts + bool prompt
            # membership, one [vocab] row per slot (~2.5 MB at v=32k, S=16).
            V = c.vocab_size
            state["counts"] = jnp.zeros((self.max_seqs, V), jnp.int32)
            state["prompt_mask"] = jnp.zeros((self.max_seqs, V), bool)
        if self.constraints is not None and gpt is self.gpt:
            state["dfa_id"] = jnp.zeros((self.max_seqs,), jnp.int32)
            state["dfa_state"] = jnp.zeros((self.max_seqs,), jnp.int32)
        if self.per_request_sampling and gpt is self.gpt:
            # Per-slot knob rows (sampling.PARAM_COLS) + per-slot additive
            # logit bias ([S, vocab] fp32 — 4 MB at v=64k, S=16; the price
            # of per-request logit_bias/banned_tokens as pure data).
            state["samp"] = jnp.tile(self._default_row[None],
                                     (self.max_seqs, 1))
            state["samp_bias"] = jnp.zeros((self.max_seqs, c.vocab_size),
                                           jnp.float32)
        if self.quantize_kv:
            sshape = shape[:-1] + (1,)
            state["k_scales"] = [jnp.zeros(sshape, jnp.float32)
                                 for _ in range(L)]
            if not mla:       # the latent row IS v — one scale set
                state["v_scales"] = [jnp.zeros(sshape, jnp.float32)
                                     for _ in range(L)]
        return self._shard_state(state)

    # ---- tensor-parallel serving helpers ----------------------------------

    def _tp_size(self) -> int:
        axes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        return axes.get(self.tp_axis, 1)

    def _shard_state(self, state):
        """Commit lane state to the mesh: page/scale buffers sharded by
        kv-head on ``tp_axis``, control arrays (table/lengths/...)
        replicated. No-op without a mesh."""
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P
        kv = NamedSharding(self.mesh, P(self.tp_axis))
        rep = NamedSharding(self.mesh, P())
        out = {}
        for k, v in state.items():
            if k in ("k_pages", "v_pages", "k_scales", "v_scales"):
                out[k] = [jax.device_put(x, kv) for x in v]
            else:
                out[k] = jax.device_put(v, rep)
        return out

    def _shard_params_tp(self, params):
        from np_modeling_tpu.parallel.sharding import (TRANSFORMER_RULES,
                                                       shard_params)
        return shard_params(params, self.mesh, TRANSFORMER_RULES)

    def _paged(self, q, k_pages, v_pages, lengths, table, window, kwargs):
        """ops.paged_attention — as a shard_map island over ``tp_axis``
        when serving tensor-parallel. Heads are independent in the decode
        kernel, so each shard runs the unmodified Pallas kernel on its
        hq/tp query heads and hkv/tp kv-head page slices; control inputs
        (lengths, page table) are replicated. GQA grouping survives the
        split because q-head block j covers exactly kv-head block j's
        groups (hq/tp = g * hkv/tp contiguous heads)."""
        if self.mesh is None:
            return ops.paged_attention(q, k_pages, v_pages, lengths, table,
                                       window=window, **kwargs)
        from jax.sharding import PartitionSpec as P
        heads = P(None, None, self.tp_axis, None)
        kv = P(self.tp_axis)
        quant = "k_scales" in kwargs
        sinks = kwargs.get("sinks")
        static = {k: v for k, v in kwargs.items()     # scale/softcap ride
                  if k not in ("k_scales", "v_scales",   # as Python floats
                               "sinks")}

        def island(q_, kp_, vp_, len_, tab_, *extra):
            kw = dict(static)
            extra = list(extra)
            if quant:
                kw.update(k_scales=extra.pop(0), v_scales=extra.pop(0))
            if sinks is not None:
                kw["sinks"] = extra.pop(0)   # per-shard q-head slice
            return ops.paged_attention(q_, kp_, vp_, len_, tab_,
                                       window=window, **kw)

        in_specs = (heads, kv, kv, P(), P()) + ((kv, kv) if quant else ())
        args = (q, k_pages, v_pages, lengths, table)
        if quant:
            args += (kwargs["k_scales"], kwargs["v_scales"])
        if sinks is not None:
            # [hq] sharded by head: shard j's g*hkv/tp q heads are exactly
            # its kv-head block's groups (same contiguity argument as q).
            in_specs = in_specs + (P(self.tp_axis),)
            args = args + (sinks,)
        return jax.shard_map(island, mesh=self.mesh, in_specs=in_specs,
                             out_specs=heads, check_vma=False)(*args)

    # ---- multi-LoRA helpers ----------------------------------------------

    def _stack_adapters(self):
        """Stack every adapter's A/B along a new leading axis; index 0 is a
        zero adapter (the base model), so per-slot gathers need no masking."""
        import re
        names = sorted(self.lora_adapters)
        paths = sorted(self.lora_adapters[names[0]])
        pat = re.compile(r"^layer_\d+/self_attention/w[qkvo]$")
        for p in paths:
            assert pat.match(p), (
                "engine multi-LoRA serves attention targets only "
                f"(training.lora.ATTENTION_TARGETS); got {p!r}")
        stack = {}
        for p in paths:
            a_list, b_list = [], []
            for n in names:
                ad = self.lora_adapters[n]
                assert sorted(ad) == paths, (
                    f"adapter {n!r} targets differ from {names[0]!r}")
                a_list.append(ad[p]["a"])
                b_list.append(ad[p]["b"])
            stack[p] = {
                "a": jnp.stack([jnp.zeros_like(a_list[0])] + a_list),
                "b": jnp.stack([jnp.zeros_like(b_list[0])] + b_list),
            }
        return stack

    def _lora_scale(self, rank):
        return (self.lora_alpha if self.lora_alpha is not None
                else rank) / rank

    def _lora_qkv_delta(self, lora, li, name, y, idx):
        """Per-slot factored delta for a [d, h, dk] projection: returns
        [S, h, t, dk] to add to the projected q/k/v, or None."""
        ent = lora.get(f"layer_{li}/self_attention/{name}")
        if ent is None:
            return None
        a = ent["a"][idx]                       # [S, d, r]
        b = ent["b"][idx]                       # [S, r, h, dk]
        xa = jnp.einsum("std,sdr->str", y.astype(jnp.float32), a)
        out = jnp.einsum("str,srhk->sthk", xa, b) * self._lora_scale(
            a.shape[-1])
        return jnp.swapaxes(out, 1, 2)

    def _lora_o_delta(self, lora, li, o4, idx):
        """Per-slot delta for the output projection wo [hq, dk, d] whose
        LoRA factors contract the head axis: A [hq, r], B [r, dk, d].
        ``o4``: [S, t, hq, dk]. Returns [S, t, d] or None."""
        ent = lora.get(f"layer_{li}/self_attention/wo")
        if ent is None:
            return None
        a = ent["a"][idx]                       # [S, hq, r]
        b = ent["b"][idx]                       # [S, r, dk, d]
        z = jnp.einsum("sthk,shr->strk", o4.astype(jnp.float32), a)
        return jnp.einsum("strk,srkd->std", z, b) * self._lora_scale(
            a.shape[-1])

    def _merged(self, adapter_name):
        """Fully merged params for one adapter (dense-prefill path only)."""
        if adapter_name not in self._merged_cache:
            from np_modeling_tpu.training.lora import lora_merge
            self._merged_cache[adapter_name] = lora_merge(
                self.params, self.lora_adapters[adapter_name],
                self.lora_alpha)
        return self._merged_cache[adapter_name]

    def __post_init__(self):
        c = self.gpt.config
        assert not c.scan_layers, "engine requires scan_layers=False"
        # ---- sampling control surface ------------------------------------
        # A SamplingParams overrides the three plain fields (they stay in
        # sync so text.py / the speculative accept path read one source of
        # truth). Penalty statistics (per-slot generated-token counts + a
        # prompt-membership mask) live in the DONATED device state and are
        # updated in-graph — no host round-trip per token.
        self._sp = self.sampling
        self._sp_bias = None
        self._sp_stats = False
        if self.per_request_sampling:
            from np_modeling_tpu.serving.sampling import (SamplingParams,
                                                          params_row)
            assert self.sampling is None, (
                "per_request_sampling takes SamplingParams per add_request; "
                "the plain temperature/top_k/top_p fields set the default "
                "for requests without one — drop the engine-level sampling=")
            assert self.draft_gpt is None, (
                "speculative decoding needs one static sampling config for "
                "the accept/reject ratio — per-request knobs don't compose")
            self._default_row = params_row(SamplingParams(
                temperature=self.temperature, top_k=self.top_k,
                top_p=self.top_p))
        if self._sp is not None:
            from np_modeling_tpu.serving.sampling import static_bias
            self.temperature = self._sp.temperature
            self.top_k = self._sp.top_k
            self.top_p = self._sp.top_p
            self._sp_bias = static_bias(self._sp, c.vocab_size)
            self._sp_stats = self._sp.needs_token_stats
            if self.draft_gpt is not None:
                assert (not self._sp_stats and self._sp.min_p is None
                        and self._sp_bias is None), (
                    "speculative decoding composes with temperature/top_k/"
                    "top_p only — penalties/min_p/logit_bias would change "
                    "the target distribution the draft never saw, breaking "
                    "the accept/reject exactness guarantee")
        # ---- grammar-constrained decoding --------------------------------
        self._dfa_trans = None
        self._dfa_ids = {}
        if self.constraints is not None:
            assert self.draft_gpt is None, (
                "constrained decoding + the draft lane is not wired (the "
                "speculative verify argmax would bypass the DFA masks)")
            # Stable id order: init names sorted, runtime registrations
            # (register_constraint) APPEND — live slots keep valid dfa_ids.
            self._dfa_names = sorted(self.constraints)
            self._rebuild_dfa_table()
        # ---- automatic prefix caching ------------------------------------
        self._prefix_cache = None
        self._cache_hit_tokens = 0
        self._cache_lookup_tokens = 0
        if self.enable_prefix_cache:
            from collections import OrderedDict
            assert self.draft_gpt is None, (
                "prefix cache + draft lane is not wired (the draft lane "
                "would need its own content-addressed cache, and matched "
                "prefixes must agree across lanes)")
            assert self.prefill_chunk_size is not None and (
                not c.moe_experts or c.moe_capacity_factor is None), (
                "the prefix cache prefills suffixes through the CHUNKED "
                "path — capacity-limited MoE (dense prefill) and "
                "prefill_chunk_size=None can't use it")
            self._prefix_cache = OrderedDict()   # chain hash -> page
        self._mla = bool(getattr(c, "mla", None))
        if self._mla:
            # Paged MLA serving: the pages hold LATENTS (rank+rope per
            # token, one shared head) and decode runs the absorbed form.
            assert self.prefill_chunk_size is not None, (
                "MLA serving requires chunked prefill (the eager path "
                "collects per-head K/V, which MLA never materializes)")
            assert (not c.moe_experts
                    or c.moe_capacity_factor is None), (
                "MLA + capacity-limited MoE would fall back to the eager "
                "prefill; use no-drop routing (moe_capacity_factor=None)")
            assert self.lora_adapters is None
            assert self.mesh is None, (
                "tensor-parallel MLA serving is not wired (the latent "
                "cache has ONE shared kv head — nothing to shard by head)")
            assert c.attention_window is None
            m = c.mla
            self._dims = (c.num_heads, 1,
                          m["kv_lora_rank"] + m["qk_rope_head_dim"])
        else:
            hq, hkv, dk = self.gpt.block.attn._dims(c.d_model)
            self._dims = (hq, hkv, dk)
        if self.mesh is not None:
            tp = self._tp_size()
            assert tp > 1, (
                f"mesh has no '{self.tp_axis}' axis (axes: "
                f"{self.mesh.axis_names}) — pass tp_axis= or drop mesh=")
            assert hkv % tp == 0, (
                f"tensor-parallel serving shards kv heads: num_kv_heads="
                f"{hkv} must divide by tp={tp}")
            assert self.prefill_chunk_size is not None, (
                "tensor-parallel serving requires the chunked prefill path "
                "(prefill_chunk_size=None selects the eager dense prefill, "
                "which cannot run on sharded params)")
        self.max_pages = -(-c.max_len // self.page_size)
        # Hard token bound: the page table may cover slightly more than
        # max_len when page_size doesn't divide it — never decode past the
        # model's trained context.
        self._max_tokens = min(self.max_pages * self.page_size, c.max_len)
        self._state = self._make_lane_state(self.gpt, self.total_pages)
        # The last page is the trash page: inactive slots' appends land
        # there so the jitted step needs no scatter masking.
        self._trash = self.total_pages - 1
        self._free = list(range(self.total_pages - 2, -1, -1))
        self._refs: dict[int, int] = {}         # page -> refcount (fork)
        self._reclaim_mark: dict[int, int] = {}  # window-reclaim watermark
        self._slots: dict[int, int] = {}        # seq_id -> slot
        self._host_len: dict[int, int] = {}     # authoritative lengths
        self._history: dict[int, list] = {}     # full token ids (prompt +
                                                # emitted) — feeds prompt-
                                                # lookup proposals
        self._jit_lookup: dict[int, object] = {}   # gamma -> jitted verify
        self._seq_pages: dict[int, list[int]] = {}
        self._rng = jax.random.PRNGKey(self.seed)
        # ---- optional multi-LoRA serving --------------------------------
        self._adapter_ids: dict = {}
        self._merged_cache: dict = {}   # adapter name -> lora_merge'd params
        self._serve_params = self.params
        if self.lora_adapters:
            self._adapter_ids = {name: i + 1 for i, name in
                                 enumerate(sorted(self.lora_adapters))}
            self._serve_params = {**self.params,
                                  "_lora": self._stack_adapters()}
        if self.mesh is not None:
            # Weights shard by the training TP rules (stacked LoRA tensors
            # match no rule -> replicated); GSPMD partitions every jitted
            # step from the input shardings alone.
            self._serve_params = self._shard_params_tp(self._serve_params)
        self._jit_step = jax.jit(self._device_step, donate_argnums=(0,))
        self._jit_multi: dict[int, object] = {}   # n -> jitted n-step scan
        self._jit_prefill: dict[int, object] = {}  # n_pages -> jitted prefill
        self._jit_chunk: dict = {}      # (chunk, lane) -> jitted chunk fn
        # ---- optional draft lane (speculative decoding) -----------------
        if self.draft_gpt is not None:
            dc = self.draft_gpt.config
            assert dc.vocab_size == c.vocab_size, "draft must share vocab"
            assert not dc.scan_layers
            self._d_total = self.draft_total_pages or self.total_pages
            # Both lanes must be able to hold the same token count.
            self._max_tokens = min(self._max_tokens, dc.max_len,
                                   self.max_pages * self.page_size)
            assert dc.max_len >= self._max_tokens
            if self.mesh is not None:
                dhkv = self.draft_gpt.block.attn._dims(dc.d_model)[1]
                assert dhkv % self._tp_size() == 0, (
                    f"draft num_kv_heads={dhkv} must divide by "
                    f"tp={self._tp_size()} for tensor-parallel serving")
                self.draft_params = self._shard_params_tp(self.draft_params)
            self._dstate = self._make_lane_state(self.draft_gpt,
                                                 self._d_total)
            self._dtrash = self._d_total - 1
            self._dfree = list(range(self._d_total - 2, -1, -1))
            self._drefs: dict[int, int] = {}
            self._dreclaim_mark: dict[int, int] = {}
            self._dseq_pages: dict[int, list[int]] = {}
            self._jit_dprefill: dict[int, object] = {}
            self._jit_spec: dict[int, object] = {}   # gamma -> jitted step

    # ---- request lifecycle ----------------------------------------------

    @property
    def live(self):
        return sorted(self._slots)

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def capacity(self, seq_id: int) -> int:
        """Decode steps this sequence can still take before hitting the
        per-sequence token bound (model max_len / page-table rows)."""
        return self._max_tokens - self._host_len[seq_id]

    class _Lane:
        """Page-management view of one model lane (target or draft)."""

        __slots__ = ("gpt", "attr", "free", "refs", "seq_pages", "marks",
                     "trash")

        def __init__(self, gpt, attr, free, refs, seq_pages, marks, trash):
            self.gpt, self.attr = gpt, attr
            self.free, self.refs = free, refs
            self.seq_pages, self.marks, self.trash = seq_pages, marks, trash

    def _lanes(self):
        lanes = [self._Lane(self.gpt, "_state", self._free, self._refs,
                            self._seq_pages, self._reclaim_mark,
                            self._trash)]
        if self.draft_gpt is not None:
            lanes.append(self._Lane(self.draft_gpt, "_dstate", self._dfree,
                                    self._drefs, self._dseq_pages,
                                    self._dreclaim_mark, self._dtrash))
        return lanes

    def _prefix_hashes(self, aid: int, prompt, plen: int) -> list:
        """Chained content hashes of the prompt's FULL pages: entry i
        identifies tokens [0, (i+1)*page_size) under adapter ``aid``, so
        equal prefixes hash equal and a dict walk finds the longest
        cached page prefix."""
        import hashlib
        ps = self.page_size
        toks = np.asarray(prompt, np.int32)
        run = hashlib.sha1(repr((aid, ps)).encode())
        out = []
        for i in range(plen // ps):
            run.update(toks[i * ps:(i + 1) * ps].tobytes())
            out.append(run.hexdigest())
        return out

    def _evict_for(self, n: int, free, refs) -> None:
        """LRU-evict prefix-cache entries until ``free`` covers ``n`` pages.
        Dropping the cache's refcount frees a page only when no live
        sequence shares it; either way the cache shrinks, so this
        terminates."""
        while self._prefix_cache and len(free) < n:
            _, pg = self._prefix_cache.popitem(last=False)
            self._release([pg], free, refs)

    @property
    def prefix_cache_stats(self) -> dict:
        """{entries, hit_tokens, lookup_tokens} — hit_tokens counts prompt
        tokens whose KV came from the cache instead of a prefill pass."""
        return {"entries": len(self._prefix_cache or ()),
                "hit_tokens": self._cache_hit_tokens,
                "lookup_tokens": self._cache_lookup_tokens}

    def _alloc(self, n: int, free=None, refs=None) -> list[int]:
        free = self._free if free is None else free
        refs = self._refs if refs is None else refs
        if free is self._free:
            self._evict_for(n, free, refs)
        if len(free) < n:
            raise OutOfPagesError(
                f"out of KV pages ({self.total_pages} total)")
        pages = [free.pop() for _ in range(n)]
        for p in pages:
            refs[p] = 1
        return pages

    def _release(self, pages, free, refs) -> None:
        for p in pages:
            if p not in refs:
                continue   # trash placeholder (window-reclaimed position)
            refs[p] -= 1
            if refs[p] == 0:
                del refs[p]
                free.append(p)

    def _seed_stats(self, rows) -> None:
        """Install penalty statistics for newly prefilled slots: the prompt
        membership mask (repetition penalty spans prompt + generated; HF
        semantics) and a zeroed generated-token count row.
        ``rows``: [(slot, prompt 1-D int array)]. Host-side, once/prefill."""
        if not (self._sp_stats or self.per_request_sampling):
            return
        from np_modeling_tpu.serving.sampling import token_histogram
        V = self.gpt.config.vocab_size
        st = dict(self._state)
        for slot, prompt in rows:
            pm = token_histogram(prompt, V) > 0
            st["prompt_mask"] = st["prompt_mask"].at[slot].set(pm)
            st["counts"] = st["counts"].at[slot].set(0)
        self._state = st

    def _constrain_logits(self, logits, dfa_id, dfa_state):
        """-inf-mask ``logits`` [rows, V] by each row's DFA state (row 0 of
        the stacked table is all-zero: unconstrained rows pass through).
        -inf survives every later sampling processor (penalties divide/
        scale/shift finitely), so masking composes with all modes."""
        allowed = self._dfa_trans[dfa_id, dfa_state] >= 0
        return jnp.where(allowed, logits, -jnp.inf)

    def _prefill_constrain(self, logits, slots):
        """Mask prefill last-position logits by the new slots' DFA starts
        (the FIRST sampled token must already obey the grammar)."""
        if self._dfa_trans is None:
            return logits
        idx = jnp.asarray(slots, jnp.int32)
        return self._constrain_logits(logits,
                                      jnp.take(self._state["dfa_id"], idx),
                                      jnp.take(self._state["dfa_state"],
                                               idx))

    def _prefill_dfa_step(self, slots, toks) -> None:
        """Advance the new slots' DFA states on their first tokens."""
        if self._dfa_trans is None:
            return
        st = dict(self._state)
        idx = jnp.asarray(slots, jnp.int32)
        tk = jnp.asarray(toks, jnp.int32)
        nxt = jnp.maximum(self._dfa_trans[st["dfa_id"][idx],
                                          st["dfa_state"][idx], tk], 0)
        st["dfa_state"] = st["dfa_state"].at[idx].set(nxt)
        self._state = st

    def _stat_rows(self, slots):
        """Gather per-slot sampling-state rows (counts, prompt_mask, samp,
        samp_bias) for a prefill-time draw; None for tables not carried."""
        idx = jnp.asarray(slots, jnp.int32)
        return tuple(jnp.take(self._state[k], idx, axis=0)
                     if k in self._state else None
                     for k in ("counts", "prompt_mask", "samp", "samp_bias"))

    def _count_first(self, slots, toks) -> None:
        """Count the prefill-sampled FIRST tokens into the penalty
        histograms (decode-step tokens are counted in-graph)."""
        if not (self._sp_stats or self.per_request_sampling):
            return
        st = dict(self._state)
        st["counts"] = st["counts"].at[
            jnp.asarray(slots, jnp.int32),
            jnp.asarray(toks, jnp.int32)].add(1)
        self._state = st

    def _set_request_sampling(self, slot: int, sp, st=None):
        """Install a slot's per-request knob row + bias row (or the engine
        defaults when ``sp`` is None). With ``st`` passed, mutate and
        return that pending state copy (batched admission shares one);
        otherwise commit to ``self._state``."""
        from np_modeling_tpu.serving.sampling import params_row, static_bias
        pending = st is not None
        st = dict(self._state) if st is None else st
        st["samp"] = st["samp"].at[slot].set(
            self._default_row if sp is None else params_row(sp))
        bias = None if sp is None else static_bias(
            sp, self.gpt.config.vocab_size)
        st["samp_bias"] = st["samp_bias"].at[slot].set(
            0.0 if bias is None else bias)
        if not pending:
            self._state = st
        return st

    def _rebuild_dfa_table(self) -> None:
        """(Re)build the stacked [n_dfas+1, NS, vocab] transition table from
        ``self.constraints`` in ``self._dfa_names`` order (row 0 =
        unconstrained: all-zero trans, state pinned at 0)."""
        V = self.gpt.config.vocab_size
        names = self._dfa_names
        NS = max((self.constraints[n].n_states for n in names), default=1)
        tab = np.zeros((len(names) + 1, NS, V), np.int32)
        starts = [0]
        for i, n in enumerate(names):
            d = self.constraints[n]
            t = np.asarray(d.trans, np.int32)
            assert t.shape[1] == V, (
                f"constraint {n!r} vocab {t.shape[1]} != engine vocab {V}")
            tab[i + 1, :t.shape[0]] = t
            tab[i + 1, t.shape[0]:] = -1       # padding states: forbid all
            starts.append(d.start)
        self._dfa_ids = {n: i + 1 for i, n in enumerate(names)}
        self._dfa_starts = np.asarray(starts, np.int32)
        self._dfa_trans = jnp.asarray(tab)

    def register_constraint(self, name: str, dfa) -> None:
        """Register (or replace) a named :class:`TokenDFA` at runtime —
        the HTTP server compiles per-request JSON schemas / regexes into
        grammars on demand. Requires an engine constructed with
        ``constraints=`` (an empty dict enables the machinery). The table
        is baked into traced dispatches as a constant, so every jit cache
        is dropped: the next dispatch recompiles. Callers should cache
        grammars by name and reuse them to amortize that."""
        if self.constraints is None:
            raise ValueError("construct the engine with constraints={} "
                             "(or a dict) to enable runtime registration")
        if name in self._dfa_ids:
            if self._slots:
                raise ValueError(
                    f"cannot replace constraint {name!r} while sequences "
                    "are live (their DFA states index the old table)")
        else:
            self._dfa_names.append(name)
        self.constraints[name] = dfa
        self._rebuild_dfa_table()
        self._jit_step = jax.jit(self._device_step, donate_argnums=(0,))
        self._jit_multi.clear()
        self._jit_prefill.clear()
        self._jit_chunk.clear()

    def _set_request_constraint(self, slot: int, name, st=None):
        """Install a slot's DFA id + start state (None = unconstrained).
        Same pending-``st`` convention as :meth:`_set_request_sampling`."""
        if name is not None and name not in self._dfa_ids:
            raise ValueError(f"unknown constraint {name!r}; engine has "
                             f"{sorted(self._dfa_ids)}")
        cid = self._dfa_ids.get(name, 0)
        pending = st is not None
        st = dict(self._state) if st is None else st
        st["dfa_id"] = st["dfa_id"].at[slot].set(cid)
        st["dfa_state"] = st["dfa_state"].at[slot].set(
            int(self._dfa_starts[cid]))
        if not pending:
            self._state = st
        return st

    def add_request(self, seq_id: int, prompt_tokens,
                    adapter: Optional[str] = None,
                    sampling: Optional[object] = None,
                    constraint: Optional[str] = None) -> int:
        """Prefill a prompt; returns the first generated token.

        ``adapter``: name of a LoRA adapter from ``lora_adapters`` — this
        sequence then prefills AND decodes through base + that adapter
        while sharing every dispatch with differently-adapted slots."""
        if seq_id in self._slots:
            raise ValueError(f"sequence {seq_id} already live")
        if adapter is not None and adapter not in self._adapter_ids:
            raise ValueError(f"unknown adapter {adapter!r}; engine has "
                             f"{sorted(self._adapter_ids)}")
        used = set(self._slots.values())
        free_slots = [s for s in range(self.max_seqs) if s not in used]
        if not free_slots:
            raise RuntimeError(f"all {self.max_seqs} slots busy")
        slot = free_slots[0]
        aid = self._adapter_ids.get(adapter, 0)
        if self._adapter_ids:
            st = dict(self._state)
            st["adapter"] = st["adapter"].at[slot].set(aid)
            self._state = st
        if sampling is not None and not self.per_request_sampling:
            raise ValueError("construct the engine with per_request_"
                             "sampling=True to pass per-request "
                             "SamplingParams to add_request")
        if self.per_request_sampling:
            self._set_request_sampling(slot, sampling)
        if constraint is not None and self._dfa_trans is None:
            raise ValueError("construct the engine with constraints="
                             "{name: TokenDFA} to pass constraint=")
        if self._dfa_trans is not None:
            self._set_request_constraint(slot, constraint)

        prompt = jnp.asarray(prompt_tokens)[None, :]
        plen = int(prompt.shape[1])
        if plen >= self._max_tokens:
            raise OutOfPagesError(
                f"prompt length {plen} >= the {self._max_tokens}-token "
                "per-sequence capacity (model max_len / page table)")
        # Capacity-limited MoE routing depends on the token population, so
        # a chunk-by-chunk prefill cannot reproduce the full-prompt routing
        # exactly — those models use the dense prefill. NO-DROP routing
        # (moe_capacity_factor=None) is per-token independent, so chunked
        # prefill is exact for it (asserted in tests/test_chunked_prefill.py).
        chunkable_moe = (not self.gpt.config.moe_experts
                         or self.gpt.config.moe_capacity_factor is None)
        if self.prefill_chunk_size and chunkable_moe:
            return self._add_requests_chunked(
                [(seq_id, slot, prompt[0], plen, aid)])[seq_id]

        # Dense prefill with an adapter: one merged-params forward (cached
        # per adapter). The decode path then uses the factored deltas —
        # mathematically identical (W + (alpha/r) A@B applied to x).
        dense_params = (self._merged(adapter) if aid else self.params)
        logits, kvs = self.gpt.apply(dense_params, prompt, collect_kv=True,
                                     logits_last_only=True)
        n_pages = -(-plen // self.page_size)
        # Atomic across lanes: check both allocations before popping either.
        if self.draft_gpt is not None and len(self._dfree) < n_pages:
            raise OutOfPagesError("out of draft-lane KV pages")
        pages = self._alloc(n_pages)           # atomic: checks before popping
        self._seed_stats([(slot, prompt[0])])
        self._rng, sub = jax.random.split(self._rng)
        tok = int(self._sample(
            self._prefill_constrain(logits[:, -1].astype(jnp.float32),
                                    [slot]),
            sub, *self._stat_rows([slot]))[0])
        self._count_first([slot], [tok])
        self._prefill_dfa_step([slot], [tok])
        if n_pages not in self._jit_prefill:
            self._jit_prefill[n_pages] = self._make_prefill(n_pages,
                                                            self._trash)
        self._state = self._jit_prefill[n_pages](
            self._state, self._pad_kvs(kvs, n_pages, plen),
            jnp.asarray(pages, jnp.int32),
            jnp.int32(slot), jnp.int32(tok), jnp.int32(plen))
        if self.draft_gpt is not None:
            _, dkvs = self.draft_gpt.apply(self.draft_params, prompt,
                                           collect_kv=True,
                                           logits_last_only=True)
            dpages = self._alloc(n_pages, self._dfree, self._drefs)
            if n_pages not in self._jit_dprefill:
                self._jit_dprefill[n_pages] = self._make_prefill(
                    n_pages, self._dtrash)
            self._dstate = self._jit_dprefill[n_pages](
                self._dstate, self._pad_kvs(dkvs, n_pages, plen),
                jnp.asarray(dpages, jnp.int32),
                jnp.int32(slot), jnp.int32(tok), jnp.int32(plen))
            self._dseq_pages[seq_id] = dpages
        self._slots[seq_id] = slot
        self._host_len[seq_id] = plen
        self._seq_pages[seq_id] = pages
        self._history[seq_id] = [int(t) for t in np.asarray(prompt[0])] + [tok]
        return tok

    def add_requests(self, prompts: dict, adapters: Optional[dict] = None,
                     sampling: Optional[dict] = None,
                     constraints: Optional[dict] = None) -> dict:
        """Prefill SEVERAL prompts at once; returns {seq_id: first token}.

        With chunked prefill enabled (the default) all prompts stream
        through batched [B, chunk] chunk forwards — one dispatch per chunk
        index for the whole batch instead of per sequence. Falls back to
        per-request dense prefill otherwise. ``adapters``: optional
        {seq_id: adapter_name} (multi-LoRA). ``sampling``: optional
        {seq_id: SamplingParams} (requires per_request_sampling=True).
        ``constraints``: optional {seq_id: constraint_name}."""
        adapters = adapters or {}
        sampling = sampling or {}
        constraints = constraints or {}
        if sampling and not self.per_request_sampling:
            raise ValueError("construct the engine with per_request_"
                             "sampling=True to pass per-request "
                             "SamplingParams to add_requests")
        if constraints and self._dfa_trans is None:
            raise ValueError("construct the engine with constraints="
                             "{name: TokenDFA} to pass constraints=")
        items = sorted(prompts.items())
        chunkable_moe = (not self.gpt.config.moe_experts
                         or self.gpt.config.moe_capacity_factor is None)
        if not (self.prefill_chunk_size and chunkable_moe) or len(items) <= 1:
            return {sid: self.add_request(sid, toks, adapters.get(sid),
                                          sampling.get(sid),
                                          constraints.get(sid))
                    for sid, toks in items}
        used = set(self._slots.values())
        free_slots = [s for s in range(self.max_seqs) if s not in used]
        if len(free_slots) < len(items):
            raise RuntimeError(
                f"{len(items)} requests but only {len(free_slots)} of "
                f"{self.max_seqs} slots free")
        reqs = []
        st = dict(self._state)
        for (sid, toks), slot in zip(items, free_slots):
            if sid in self._slots:
                raise ValueError(f"sequence {sid} already live")
            name = adapters.get(sid)
            if name is not None and name not in self._adapter_ids:
                raise ValueError(f"unknown adapter {name!r}; engine has "
                                 f"{sorted(self._adapter_ids)}")
            aid = self._adapter_ids.get(name, 0)
            arr = jnp.asarray(toks)
            plen = int(arr.shape[0])
            if plen >= self._max_tokens:
                raise OutOfPagesError(
                    f"prompt length {plen} >= the {self._max_tokens}-token "
                    "per-sequence capacity (model max_len / page table)")
            if self._adapter_ids:
                st["adapter"] = st["adapter"].at[slot].set(aid)
            if self.per_request_sampling:
                st = self._set_request_sampling(slot, sampling.get(sid), st)
            if self._dfa_trans is not None:
                st = self._set_request_constraint(slot,
                                                  constraints.get(sid), st)
            reqs.append((sid, slot, arr, plen, aid))
        self._state = st
        return self._add_requests_chunked(reqs)

    def _add_requests_chunked(self, reqs) -> dict:
        """Paged chunked prefill for a BATCH of prompts: every chunk index
        runs as ONE jitted [B, chunk] forward over all new sequences
        (batch>1 chunked prefill, VERDICT r2 #7). Rows at different lengths
        run in lockstep; a row whose prompt is exhausted goes inactive (its
        appends land on the trash page). The per-row causal mask (query
        token i attends to pos <= base + i) makes padded tail chunks exact
        without special-casing, and the chunk function compiles ONCE per
        (chunk, B) — not per prompt length.

        ``reqs``: list of (seq_id, slot, prompt [plen], plen, adapter_id).
        Returns {seq_id: first generated token}.

        With ``enable_prefix_cache``, each row first matches its prompt's
        page-aligned prefix against the content-addressed page cache; the
        matched pages are SHARED (refcounted, append-only — the same
        mechanism as fork) and only the SUFFIX streams through the chunk
        forwards, each row at its own base offset."""
        chunk = self.prefill_chunk_size
        B = len(reqs)
        lanes = self._lanes()
        ps = self.page_size

        # Prefix-cache lookup (target lane only; the cache asserts the
        # draft lane off). Matched token counts are page-aligned and capped
        # at plen-1: at least one suffix token always runs, producing the
        # last-position logits the first sampled token needs.
        matches = {seq_id: [] for seq_id, *_ in reqs}
        if self._prefix_cache is not None:
            for seq_id, slot, prompt, plen, aid in reqs:
                chain = self._prefix_hashes(aid, prompt, plen)
                for h in chain[:(plen - 1) // ps]:
                    pg = self._prefix_cache.get(h)
                    if pg is None:
                        break
                    self._prefix_cache.move_to_end(h)      # LRU touch
                    matches[seq_id].append(pg)
                self._cache_lookup_tokens += plen
                self._cache_hit_tokens += len(matches[seq_id]) * ps
            # Matched pages take the sequence's refcount NOW, before any
            # eviction below — an LRU eviction dropping the cache's ref
            # must never free a page this very batch just matched.
            for sid in matches:
                for pg in matches[sid]:
                    self._refs[pg] += 1

        bases = np.asarray([len(matches[sid]) * ps
                            for sid, *_ in reqs])           # [B] per-row
        total_pages = sum(-(-plen // ps) - len(matches[sid])
                          for sid, _, _, plen, _ in reqs)
        for ln in lanes:                       # atomic across lanes & rows
            if ln.attr == "_state":
                self._evict_for(total_pages, ln.free, ln.refs)
            if len(ln.free) < total_pages:
                for sid in matches:            # unwind the match refs
                    self._release(matches[sid], self._free, self._refs)
                raise OutOfPagesError("out of KV pages for chunked prefill")
        params_of = {"_state": self._serve_params,
                     "_dstate": self.draft_params}
        for ln in lanes:
            st = dict(getattr(self, ln.attr))
            for seq_id, slot, _, plen, _ in reqs:
                n_pages = -(-plen // ps)
                shared = matches[seq_id] if ln.attr == "_state" else []
                pages = shared + self._alloc(n_pages - len(shared),
                                             ln.free, ln.refs)
                ln.seq_pages[seq_id] = pages
                # Tail entries -> trash: a padded final chunk's appends
                # beyond the allocated pages must not land on page 0
                # (growth later installs real pages as needed).
                st["table"] = st["table"].at[slot, :].set(ln.trash)
                st["table"] = st["table"].at[slot, :n_pages].set(
                    jnp.asarray(pages, jnp.int32))
            setattr(self, ln.attr, st)

        # Commit slot bookkeeping first: a mid-prefill failure (OOM,
        # interrupt) then leaves sequences that finish() can reclaim.
        # (Donated buffers may still be invalidated by an aborted dispatch
        # — the same exposure every donated step has.)
        for seq_id, slot, _, plen, _ in reqs:
            self._slots[seq_id] = slot
            self._host_len[seq_id] = plen

        plens = np.asarray([plen for _, _, _, plen, _ in reqs])
        suffix = plens - bases                 # tokens each row prefills
        slots_arr = jnp.asarray([slot for _, slot, _, _, _ in reqs],
                                jnp.int32)
        n_chunks = int(-(-suffix.max() // chunk))
        padded = np.zeros((B, n_chunks * chunk), np.int32)
        for i, (_, _, prompt, plen, _) in enumerate(reqs):
            padded[i, :suffix[i]] = np.asarray(prompt)[bases[i]:]
        final_ci = (suffix - 1) // chunk       # row i's last chunk index
        last_logits = None
        for ln in lanes:
            key = (chunk, B, ln.attr)
            if key not in self._jit_chunk:
                self._jit_chunk[key] = self._make_prefill_chunk(
                    chunk, B, ln.gpt, ln.trash)
            fn = self._jit_chunk[key]
            st = getattr(self, ln.attr)
            row_logits = [None] * B
            for ci in range(n_chunks):
                n_valid = np.clip(suffix - ci * chunk, 0, chunk)
                st, lg = fn(st, params_of[ln.attr],
                            jnp.asarray(padded[:, ci * chunk:
                                               (ci + 1) * chunk]),
                            slots_arr,
                            jnp.asarray(bases + ci * chunk, jnp.int32),
                            jnp.asarray(n_valid, jnp.int32))
                # Keep only rows whose FINAL chunk this was — holding every
                # chunk's [B, vocab] logits alive would be O(n_chunks * B
                # * vocab) device memory on long prompts.
                for i in np.nonzero(final_ci == ci)[0]:
                    row_logits[int(i)] = lg[i]
            setattr(self, ln.attr, st)
            if ln.attr == "_state":
                last_logits = jnp.stack(row_logits)

        # Populate the cache: every FULLY-filled prompt page is now
        # content-addressed (the cache holds its own refcount, so entries
        # outlive finish() until evicted).
        if self._prefix_cache is not None:
            for seq_id, slot, prompt, plen, aid in reqs:
                chain = self._prefix_hashes(aid, prompt, plen)
                pages = self._seq_pages[seq_id]
                for i, h in enumerate(chain):
                    if h not in self._prefix_cache:
                        self._prefix_cache[h] = pages[i]
                        self._refs[pages[i]] += 1

        self._seed_stats([(slot, prompt) for _, slot, prompt, _, _ in reqs])
        self._rng, sub = jax.random.split(self._rng)
        toks = self._sample(self._prefill_constrain(last_logits, slots_arr),
                            sub, *self._stat_rows(slots_arr))
        out = {}
        for ln in lanes:
            st = dict(getattr(self, ln.attr))
            for i, (seq_id, slot, _, plen, _) in enumerate(reqs):
                st["lengths"] = st["lengths"].at[slot].set(plen)
                st["last_tok"] = st["last_tok"].at[slot].set(toks[i])
                st["active"] = st["active"].at[slot].set(True)
            setattr(self, ln.attr, st)
        self._count_first(slots_arr, toks)
        self._prefill_dfa_step(slots_arr, toks)
        for i, (seq_id, _, prompt, _, _) in enumerate(reqs):
            out[seq_id] = int(toks[i])
            self._history[seq_id] = ([int(t) for t in np.asarray(prompt)]
                                     + [out[seq_id]])
        return out

    def _make_prefill_chunk(self, chunk, B, gpt, trash):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(state, params, toks, slots, base_len, n_valid):
            # Batch-B view of the lane: the chunk forward touches only the
            # new slots' table rows (B/max_seqs of the FLOPs) and the LM
            # head runs on one position per row instead of
            # [max_seqs, chunk, vocab]. ``base_len`` is PER ROW [B]: with
            # prefix caching, each row starts at its own matched offset.
            view = dict(state)
            view["table"] = jnp.take(state["table"], slots, axis=0)
            view["lengths"] = base_len
            view["active"] = n_valid > 0
            view["last_tok"] = jnp.zeros((B,), jnp.int32)
            view["adapter"] = jnp.take(state["adapter"], slots, axis=0)
            view, hidden = self._forward_tokens(view, params, toks, gpt,
                                                trash, return_hidden=True)
            # Page/scale buffers were appended through the view; table/
            # lengths/active are untouched by _forward_tokens.
            for key in ("k_pages", "v_pages", "k_scales", "v_scales"):
                if key in state:
                    state[key] = view[key]
            pos = jnp.clip(n_valid - 1, 0, chunk - 1)
            last = jnp.take_along_axis(
                hidden, pos[:, None, None].astype(jnp.int32), axis=1)
            logits = self._lm_head(params, last, gpt)
            return state, logits[:, 0]

        return run

    def _pad_kvs(self, kvs, n_pages, plen):
        """Pad collected per-layer K/V to whole pages (compile buckets by
        page COUNT, not token count; padding rows land on the trash page)."""
        padded = n_pages * self.page_size
        return [(jnp.pad(k[0], ((0, 0), (0, padded - plen), (0, 0))),
                 jnp.pad(v[0], ((0, 0), (0, padded - plen), (0, 0))))
                for (k, v) in kvs]

    def _make_prefill(self, n_pages: int, trash: int):
        """Jitted prefill: scatter padded per-layer K/V into the allocated
        pages and activate the slot, donating the engine state."""

        @functools.partial(jax.jit, donate_argnums=(0,))
        def prefill(state, kvs, pages_arr, slot, tok, plen):
            padded = n_pages * self.page_size
            positions = jnp.arange(padded)
            p_idx = jnp.where(positions < plen,
                              pages_arr[positions // self.page_size],
                              trash)
            offs = positions % self.page_size
            for li, (k, v) in enumerate(kvs):
                state = self._append(state, li, p_idx, offs, k, v)
            state["table"] = jax.lax.dynamic_update_slice(
                state["table"], pages_arr[None], (slot, 0))
            state["lengths"] = state["lengths"].at[slot].set(plen)
            state["last_tok"] = state["last_tok"].at[slot].set(tok)
            state["active"] = state["active"].at[slot].set(True)
            return state

        return prefill

    def finish(self, seq_id: int) -> None:
        slot = self._slots.pop(seq_id)
        del self._host_len[seq_id]
        self._history.pop(seq_id, None)
        for ln in self._lanes():
            ln.marks.pop(seq_id, None)
            self._release(ln.seq_pages.pop(seq_id), ln.free, ln.refs)
            st = dict(getattr(self, ln.attr))
            st["active"] = st["active"].at[slot].set(False)
            st["lengths"] = st["lengths"].at[slot].set(0)
            st["adapter"] = st["adapter"].at[slot].set(0)
            if "counts" in st:   # slot reuse must not inherit penalties
                st["counts"] = st["counts"].at[slot].set(0)
                st["prompt_mask"] = st["prompt_mask"].at[slot].set(False)
            if "samp" in st:     # ...nor the previous request's knobs
                st["samp"] = st["samp"].at[slot].set(self._default_row)
                st["samp_bias"] = st["samp_bias"].at[slot].set(0.0)
            if "dfa_id" in st:   # ...nor its grammar
                st["dfa_id"] = st["dfa_id"].at[slot].set(0)
                st["dfa_state"] = st["dfa_state"].at[slot].set(0)
            setattr(self, ln.attr, st)

    # ---- fork: prefix caching via refcounted page sharing -----------------

    def fork(self, parent_id: int, new_id: int) -> None:
        """Clone a live sequence. The child SHARES the parent's full pages
        (refcounted; pages are append-only so no copy-on-write is ever
        needed) and copies only the partial tail page — O(1) pages per fork
        regardless of context length. Both sequences then decode
        independently; ``finish`` frees a page only when its last owner
        leaves. This is serving-side prefix caching: N continuations of one
        long prompt cost one prefill + N-1 forks."""
        if new_id in self._slots:
            raise ValueError(f"sequence {new_id} already live")
        pslot = self._slots[parent_id]
        used = set(self._slots.values())
        free_slots = [s for s in range(self.max_seqs) if s not in used]
        if not free_slots:
            raise RuntimeError(f"all {self.max_seqs} slots busy")
        slot = free_slots[0]
        plen = self._host_len[parent_id]
        full, partial = divmod(plen, self.page_size)
        need = 1 if partial else 0
        self._evict_for(need, self._free, self._refs)
        if any(len(ln.free) < need for ln in self._lanes()):
            raise OutOfPagesError("out of KV pages for fork")
        if not hasattr(self, "_jit_fork"):
            self._jit_fork = self._make_fork()

        for ln in self._lanes():
            parent_pages = ln.seq_pages[parent_id]
            shared = parent_pages[:full]
            for p in shared:
                if p in ln.refs:   # trash placeholders aren't refcounted
                    ln.refs[p] += 1
            child = list(shared)
            if partial:
                dst = self._alloc(1, ln.free, ln.refs)[0]
                src = parent_pages[full]
                child.append(dst)
            else:
                src = dst = ln.trash  # copy trash -> trash: harmless no-op
            row = np.zeros((self.max_pages,), np.int32)
            row[:len(child)] = child
            st = self._jit_fork(getattr(self, ln.attr), jnp.asarray(row),
                                jnp.int32(slot), jnp.int32(pslot),
                                jnp.int32(plen), jnp.int32(src),
                                jnp.int32(dst))
            setattr(self, ln.attr, st)
            ln.seq_pages[new_id] = child
            # The child inherits the parent's reclamation watermark (its
            # page list shares the parent's trash placeholders below it).
            if parent_id in ln.marks:
                ln.marks[new_id] = ln.marks[parent_id]
        self._slots[new_id] = slot
        self._host_len[new_id] = plen
        self._history[new_id] = list(self._history[parent_id])

    def _make_fork(self):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def fork_lane(state, table_row, slot, pslot, plen, src, dst):
            for li in range(len(state["k_pages"])):
                for key in ("k_pages", "v_pages", "k_scales", "v_scales"):
                    if key in state:
                        buf = state[key][li]
                        state[key][li] = buf.at[:, dst].set(buf[:, src])
            state["table"] = jax.lax.dynamic_update_slice(
                state["table"], table_row[None], (slot, 0))
            state["lengths"] = state["lengths"].at[slot].set(plen)
            state["last_tok"] = state["last_tok"].at[slot].set(
                state["last_tok"][pslot])
            state["active"] = state["active"].at[slot].set(True)
            state["adapter"] = state["adapter"].at[slot].set(
                state["adapter"][pslot])
            if "counts" in state:   # child continues the parent's penalties
                state["counts"] = state["counts"].at[slot].set(
                    state["counts"][pslot])
                state["prompt_mask"] = state["prompt_mask"].at[slot].set(
                    state["prompt_mask"][pslot])
            if "samp" in state:     # ...and the parent's knobs/bias
                state["samp"] = state["samp"].at[slot].set(
                    state["samp"][pslot])
                state["samp_bias"] = state["samp_bias"].at[slot].set(
                    state["samp_bias"][pslot])
            if "dfa_id" in state:   # ...and its grammar position
                state["dfa_id"] = state["dfa_id"].at[slot].set(
                    state["dfa_id"][pslot])
                state["dfa_state"] = state["dfa_state"].at[slot].set(
                    state["dfa_state"][pslot])
            return state

        return fork_lane

    # ---- sliding-window page reclamation (streaming serving) --------------

    def _reclaim_window_pages(self) -> None:
        """Free pages that fell entirely out of a sliding-window model's
        attention span (positions < length - window). For a window-trained
        model this BOUNDS per-sequence KV memory at ~window tokens no
        matter how long it decodes — the streaming-serving memory model.

        Safe because expired positions are never *used*: the paged kernel
        masks by ``pos >= length - window`` (and skips whole blocks below
        the band), so a reclaimed-and-reused page is at worst DMA'd and
        discarded. Freed table slots point at the trash page; fork's
        refcounts are respected (a shared page frees when its last owner
        expires it)."""
        for ln in self._lanes():
            w = ln.gpt.config.attention_window
            if w is None or ln.gpt.config.window_pattern > 1:
                # Alternating local/global layers share one page table;
                # the global layers still read the expired positions.
                continue
            upd_slots, upd_poss = [], []
            for seq_id, slot in self._slots.items():
                expired = (self._host_len[seq_id] - w) // self.page_size
                pages = ln.seq_pages[seq_id]
                start = ln.marks.get(seq_id, 0)  # watermark: O(L) total
                for pos in range(start, min(expired, len(pages))):
                    if pages[pos] == ln.trash:
                        continue            # already reclaimed (fork share)
                    self._release([pages[pos]], ln.free, ln.refs)
                    pages[pos] = ln.trash
                    upd_slots.append(slot)
                    upd_poss.append(pos)
                ln.marks[seq_id] = max(start, min(expired, len(pages)))
            if upd_slots:
                st = dict(getattr(self, ln.attr))
                st["table"] = st["table"].at[
                    jnp.asarray(upd_slots),
                    jnp.asarray(upd_poss)].set(ln.trash)
                setattr(self, ln.attr, st)

    # ---- decode step (host wrapper: page growth + one jit dispatch) ------

    def _grow_tables(self, n: int):
        """Ensure every live sequence's page table covers ``n`` more tokens.

        Window-page reclamation runs FIRST (an independent, always-valid
        state transition that can only free pages). The GROWTH itself is
        ALL-OR-NOTHING: allocation needs are computed first and the free
        list / host bookkeeping / device table are only mutated once the
        whole growth is known to fit — an OutOfPagesError here leaves the
        engine state untouched (a partial mutation used to leave a page
        recorded host-side but absent from the device table, silently
        corrupting another sequence's cache on the retry).
        Returns the (possibly updated) device state."""
        self._reclaim_window_pages()
        plans = []
        for lane in self._lanes():
            needs = []                        # (seq_id, slot, n_new_pages)
            total = 0
            for seq_id, slot in self._slots.items():
                ln_len = self._host_len[seq_id]
                if ln_len + n > self._max_tokens:
                    raise OutOfPagesError(
                        f"sequence {seq_id} would exceed the "
                        f"{self._max_tokens}-token capacity (model max_len)")
                need = -(-(ln_len + n) // self.page_size)
                extra = need - len(lane.seq_pages[seq_id])
                if extra > 0:
                    needs.append((seq_id, slot, extra))
                    total += extra
            if lane.attr == "_state":
                self._evict_for(total, lane.free, lane.refs)
            if len(lane.free) < total:
                raise OutOfPagesError(
                    f"out of KV pages ({self.total_pages} total; "
                    f"need {total}, free {len(lane.free)})")
            plans.append((lane, needs))
        for lane, needs in plans:
            if not needs:
                continue
            upd = []                          # (slot, page_pos, new_page)
            for seq_id, slot, extra in needs:
                for _ in range(extra):
                    pg = lane.free.pop()
                    lane.refs[pg] = 1
                    lane.seq_pages[seq_id].append(pg)
                    upd.append((slot, len(lane.seq_pages[seq_id]) - 1, pg))
            slots, poss, pgs = (jnp.asarray(u, jnp.int32) for u in zip(*upd))
            st = dict(getattr(self, lane.attr))
            st["table"] = st["table"].at[slots, poss].set(pgs)
            setattr(self, lane.attr, st)
        return self._state

    def step(self) -> dict:
        """Decode ONE token for every live sequence; returns {seq_id: token}."""
        if not self._slots:
            return {}
        st = self._grow_tables(1)
        self._rng, sub = jax.random.split(self._rng)
        self._state, toks = self._jit_step(st, self._serve_params, sub)
        toks_np = np.asarray(toks)
        out = {}
        for seq_id, slot in sorted(self._slots.items()):
            self._host_len[seq_id] += 1
            out[seq_id] = int(toks_np[slot])
            self._history[seq_id].append(out[seq_id])
        return out

    def step_many(self, n: int) -> dict:
        """Decode ``n`` tokens for every live sequence in ONE device
        dispatch (lax.scan over the step); returns {seq_id: [tokens]}.

        Join/leave still happens between calls — this is the batched inner
        loop of continuous batching. Host pre-grows every page table to
        cover ``n`` more tokens, so no host hop occurs mid-scan. On this
        machine's tunneled TPU a per-token dispatch+readback costs ~45ms
        of round-trip latency; step_many amortizes it n-fold."""
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
        self._state, toks = self._jit_multi[n](st, self._serve_params,
                                               sub)
        toks_np = np.asarray(toks)                         # [n, max_seqs]
        out = {}
        for seq_id, slot in sorted(self._slots.items()):
            self._host_len[seq_id] += n
            out[seq_id] = [int(t) for t in toks_np[:, slot]]
            self._history[seq_id].extend(out[seq_id])
        return out

    # ---- speculative decoding (draft lane) --------------------------------

    def step_speculative(self, gamma: int = 4) -> dict:
        """Speculative decode: the draft model proposes ``gamma`` tokens per
        live sequence, the target verifies all of them in ONE multi-token
        paged forward pass, and each sequence commits its accepted prefix
        plus one target token — between 1 and ``gamma + 1`` tokens per
        sequence per call. One jitted, state-donating dispatch for both
        lanes. Returns ``{seq_id: [tokens]}`` (ragged).

        ``temperature == 0``: greedy — TOKEN-EXACT vs ``step()``.
        ``temperature > 0``: speculative SAMPLING (Leviathan et al.) —
        accept draft token d with probability ``min(1, p_t(d)/p_d(d))``,
        resample rejects from ``norm(max(0, p_t - p_d))`` — the output
        DISTRIBUTION equals target-only sampling. top_k/top_p compose:
        both sides use the same filtered-renormalized distributions (the
        accept/reject theorem holds for any distribution pair).

        Rollback is free: rejected tokens' K/V stay in the pages as stale
        entries beyond ``lengths`` — masked by the length check and
        overwritten when those offsets are legitimately reached again.
        """
        assert self.draft_gpt is not None, (
            "construct the engine with draft_gpt=/draft_params= to use "
            "speculative decoding")
        if not self._slots:
            return {}
        self._grow_tables(gamma + 1)   # worst case: all gamma+1 committed
        if gamma not in self._jit_spec:
            self._jit_spec[gamma] = jax.jit(
                functools.partial(self._spec_device_step, gamma=gamma),
                donate_argnums=(0, 1))
        self._rng, sub = jax.random.split(self._rng)
        self._state, self._dstate, emitted, produced = self._jit_spec[gamma](
            self._state, self._dstate, self._serve_params,
            self.draft_params, sub)
        emitted = np.asarray(emitted)
        produced = np.asarray(produced)
        out = {}
        for seq_id, slot in sorted(self._slots.items()):
            n_new = int(produced[slot])
            self._host_len[seq_id] += n_new
            out[seq_id] = [int(tk) for tk in emitted[slot, :n_new]]
            self._history[seq_id].extend(out[seq_id])
        return out

    def step_speculative_many(self, rounds: int, gamma: int = 4) -> dict:
        """``rounds`` speculative rounds in ONE device dispatch (lax.scan
        over the round; per-round emitted/produced buffers are read back
        once). The speculative analogue of ``step_many`` — on this
        machine's tunneled TPU the per-dispatch round-trip dominates a
        single round, so scanning rounds is what makes speculative decoding
        actually pay. Returns ``{seq_id: [tokens]}`` (ragged)."""
        assert self.draft_gpt is not None
        if not self._slots:
            return {}
        self._grow_tables(rounds * (gamma + 1))
        key = (rounds, gamma)
        if key not in self._jit_spec:
            def multi(state, dstate, params, dparams, rng):
                def body(carry, r):
                    state, dstate = carry
                    state, dstate, emitted, produced = self._spec_device_step(
                        state, dstate, params, dparams,
                        jax.random.fold_in(rng, r), gamma=gamma)
                    return (state, dstate), (emitted, produced)

                (state, dstate), outs = jax.lax.scan(
                    body, (state, dstate), jnp.arange(rounds))
                return state, dstate, outs

            self._jit_spec[key] = jax.jit(multi, donate_argnums=(0, 1))
        self._rng, sub = jax.random.split(self._rng)
        self._state, self._dstate, (emitted, produced) = self._jit_spec[key](
            self._state, self._dstate, self._serve_params,
            self.draft_params, sub)
        emitted = np.asarray(emitted)            # [rounds, S, gamma+1]
        produced = np.asarray(produced)          # [rounds, S]
        out = {}
        for seq_id, slot in sorted(self._slots.items()):
            toks = []
            for r in range(rounds):
                toks.extend(int(tk) for tk in
                            emitted[r, slot, :produced[r, slot]])
            self._host_len[seq_id] += len(toks)
            out[seq_id] = toks
            self._history[seq_id].extend(toks)
        return out

    # ---- prompt-lookup decoding (draft-free speculation) -------------------

    def step_lookup(self, gamma: int = 4, ngram: int = 3) -> dict:
        """Draft-FREE speculative decoding (prompt lookup / n-gram): each
        live sequence's next ``gamma`` tokens are proposed from the
        rightmost match of its last ``ngram`` tokens in its OWN history
        (prompt + everything emitted), then the target verifies all
        ``gamma+1`` positions in ONE multi-token paged forward and commits
        the accepted prefix plus one target token — TOKEN-EXACT vs greedy
        ``step()``. No draft model, no draft pages, no extra memory: a
        wrong proposal costs nothing beyond the fixed-width verify pass.
        Wins whenever output repeats prompt/earlier output (extraction,
        code edits, RAG answers); degrades to 1 token/call otherwise.

        Proposals are host-side (the history lives on the host anyway),
        so each call is one device dispatch + readback — there is no
        scanned multi-round variant. Returns {seq_id: [tokens]} (ragged)."""
        assert (self.temperature == 0.0 and self._sp is None
                and not self.per_request_sampling), (
            "prompt-lookup decoding verifies with a plain greedy argmax — "
            "sampling configs would break the token-exactness guarantee")
        assert self.draft_gpt is None, (
            "step_lookup on a draft-lane engine would desync the draft "
            "cache lengths; use step_speculative instead")
        assert self._dfa_trans is None, (
            "step_lookup's verify argmax bypasses the constraint masks — "
            "use step() with constrained engines")
        if not self._slots:
            return {}
        self._grow_tables(gamma + 1)
        drafts = np.zeros((self.max_seqs, gamma), np.int32)
        for seq_id, slot in self._slots.items():
            drafts[slot] = self._propose_lookup(self._history[seq_id],
                                                gamma, ngram)
        if gamma not in self._jit_lookup:
            self._jit_lookup[gamma] = jax.jit(self._lookup_device_step,
                                              donate_argnums=(0,))
        self._state, emitted, produced = self._jit_lookup[gamma](
            self._state, self._serve_params, jnp.asarray(drafts))
        emitted = np.asarray(emitted)
        produced = np.asarray(produced)
        out = {}
        for seq_id, slot in sorted(self._slots.items()):
            n_new = int(produced[slot])
            self._host_len[seq_id] += n_new
            out[seq_id] = [int(t) for t in emitted[slot, :n_new]]
            self._history[seq_id].extend(out[seq_id])
        return out

    @staticmethod
    def _propose_lookup(hist, gamma: int, ngram: int):
        """Rightmost-match n-gram continuation from ``hist`` (host-side
        numpy). Shorter grams are tried down to 1 so fresh sequences still
        propose; no match returns zeros (harmless — they just reject)."""
        h = np.asarray(hist, np.int32)
        for n in range(min(ngram, len(h) - 1), 0, -1):
            pat = h[len(h) - n:]
            win = np.lib.stride_tricks.sliding_window_view(h, n)
            hits = np.nonzero((win == pat).all(axis=1))[0]
            hits = hits[hits < len(h) - n]      # exclude the pattern itself
            if len(hits):
                j = int(hits[-1]) + n
                prop = h[j:j + gamma]
                return np.pad(prop, (0, gamma - len(prop)))
        return np.zeros((gamma,), np.int32)

    def _lookup_device_step(self, state, params, drafts):
        """Verify externally-proposed drafts [S, gamma] in one forward and
        commit the greedily-accepted prefix + 1 (the draft-free half of
        ``_spec_device_step``; same rollback-free stale-page invariant)."""
        active = state["active"]
        base = state["lengths"]
        cur = state["last_tok"]
        gamma = drafts.shape[1]
        block = jnp.concatenate([cur[:, None], drafts], axis=1)
        state, logits = self._forward_tokens(state, params, block,
                                             self.gpt, self._trash)
        t_hat = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        ok = (drafts == t_hat[:, :-1]).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(ok, axis=1), axis=1)
        nxt = jnp.take_along_axis(t_hat, n_acc[:, None], axis=1)[:, 0]
        produced = jnp.where(active, n_acc + 1, 0)
        i = jnp.arange(gamma + 1)[None]
        drafts_pad = jnp.concatenate(
            [drafts, jnp.zeros((drafts.shape[0], 1), jnp.int32)], axis=1)
        emitted = jnp.where(i < n_acc[:, None], drafts_pad,
                            jnp.where(i == n_acc[:, None], nxt[:, None], -1))
        emitted = jnp.where(active[:, None], emitted, -1)
        state["lengths"] = base + produced
        state["last_tok"] = jnp.where(active, nxt, cur)
        return state, emitted, produced

    def _spec_device_step(self, state, dstate, params, dparams, key, *,
                          gamma):
        active = state["active"]
        base_t = state["lengths"]
        base_d = dstate["lengths"]
        cur = state["last_tok"]
        greedy = self.temperature == 0.0

        # 1. Draft proposes gamma tokens (sequential small steps), keeping
        # its per-step logits for the sampling-mode accept ratio.
        def dbody(dstate, i):
            dstate, _tok, lg = self._device_step(
                dstate, dparams, jax.random.fold_in(key, i),
                self.draft_gpt, self._dtrash, return_logits=True)
            return dstate, (dstate["last_tok"], lg)

        dstate, (drafts, d_logits) = jax.lax.scan(dbody, dstate,
                                                  jnp.arange(gamma))
        drafts = drafts.T                                   # [S, gamma]
        d_logits = jnp.swapaxes(d_logits, 0, 1)             # [S, g, V]
        # One more draft step caches d_gamma's K/V so a fully-accepted
        # round leaves the draft cache complete (its sampled token and
        # bookkeeping are overwritten below).
        dstate, _ = self._device_step(dstate, dparams, None,
                                      self.draft_gpt, self._dtrash)

        # 2. Target verifies all gamma+1 positions in one forward.
        block = jnp.concatenate([cur[:, None], drafts], axis=1)
        state, logits = self._forward_tokens(state, params, block,
                                             self.gpt, self._trash)

        # 3. Accept a prefix; commit one target token.
        if greedy:
            t_hat = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            ok = (drafts == t_hat[:, :-1]).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(ok, axis=1), axis=1)  # [S] in [0,g]
            nxt = jnp.take_along_axis(t_hat, n_acc[:, None], axis=1)[:, 0]
        else:
            from np_modeling_tpu.models.speculative import (
                speculative_accept_logits)
            n_acc, nxt = speculative_accept_logits(
                logits, d_logits, drafts, jax.random.fold_in(key, 7777),
                self.temperature, self.top_k, self.top_p)
        produced = jnp.where(active, n_acc + 1, 0)

        i = jnp.arange(gamma + 1)[None]
        drafts_pad = jnp.concatenate(
            [drafts, jnp.zeros((drafts.shape[0], 1), jnp.int32)], axis=1)
        emitted = jnp.where(i < n_acc[:, None], drafts_pad,
                            jnp.where(i == n_acc[:, None], nxt[:, None], -1))
        emitted = jnp.where(active[:, None], emitted, -1)

        # 4. Commit lengths/last_tok on both lanes (rollback = shorter
        # lengths; stale page entries are masked/overwritten later).
        state["lengths"] = base_t + produced
        state["last_tok"] = jnp.where(active, nxt, cur)
        dstate["lengths"] = base_d + produced
        dstate["last_tok"] = jnp.where(active, nxt, dstate["last_tok"])
        return state, dstate, emitted, produced

    # ---- the jitted device step ------------------------------------------

    def _forward_tokens(self, state, params, tokens, gpt, trash,
                        return_hidden=False):
        """Run ``gpt`` over ``tokens`` [S, t], appending their K/V to this
        lane's pages. Returns (state, logits [S, t, vocab]) — or the
        final-norm hidden states with ``return_hidden=True`` (chunked
        prefill computes the LM head for one position only). Does NOT
        touch lengths/last_tok — bookkeeping belongs to the caller."""
        c = gpt.config
        t = tokens.shape[1]
        lengths = state["lengths"]
        x = ops.embedding_lookup(params["embedding"]["table"], tokens)
        if c.embed_scale:
            x = x * jnp.asarray(c.d_model ** 0.5, x.dtype)
        if c.positional == "learned":
            pos = jnp.clip(lengths[:, None] + jnp.arange(t), 0,
                           c.max_len - 1)
            x = x + ops.embedding_lookup(params["pos_embedding"]["table"],
                                         pos)
        if c.dtype is not None:
            x = x.astype(c.dtype)

        lora = params.get("_lora")
        for li in range(c.num_layers):
            x, state = self._block_step(params[f"layer_{li}"], x, li, state,
                                        gpt, trash, lora)

        x = gpt.final_norm.apply(params["final_norm"], x)
        if return_hidden:
            return state, x
        return state, self._lm_head(params, x, gpt)

    @staticmethod
    def _lm_head(params, x, gpt):
        if gpt.config.tie_embeddings:
            table = params["embedding"]["table"]
            logits = jnp.einsum("bsd,vd->bsv", x, table.astype(x.dtype),
                                preferred_element_type=jnp.float32)
        else:
            logits = gpt.lm_head.apply(params["lm_head"], x)
        logits = logits.astype(jnp.float32)
        cap = gpt.config.final_logit_softcap
        if cap is not None:
            logits = cap * jnp.tanh(logits / cap)
        return logits

    def _device_step(self, state, params, key, gpt=None, trash=None,
                     return_logits=False):
        gpt = gpt if gpt is not None else self.gpt
        trash = self._trash if trash is None else trash
        active = state["active"]
        state, logits = self._forward_tokens(state, params,
                                             state["last_tok"][:, None],
                                             gpt, trash)
        step_logits = logits[:, 0]
        if "dfa_state" in state:
            step_logits = self._constrain_logits(
                step_logits, state["dfa_id"], state["dfa_state"])
        new_tok = self._sample(step_logits, key, state.get("counts"),
                               state.get("prompt_mask"), state.get("samp"),
                               state.get("samp_bias"))
        if "dfa_state" in state:
            state["dfa_state"] = jnp.where(
                active,
                jnp.maximum(self._dfa_trans[state["dfa_id"],
                                            state["dfa_state"], new_tok], 0),
                state["dfa_state"])
        if "counts" in state:
            # In-graph penalty bookkeeping: the sampled token joins this
            # slot's generated-token histogram (inactive slots don't count).
            rows = jnp.arange(new_tok.shape[0])
            state["counts"] = state["counts"].at[rows, new_tok].add(
                active.astype(jnp.int32))
        state["last_tok"] = jnp.where(active, new_tok, state["last_tok"])
        state["lengths"] = state["lengths"] + active.astype(jnp.int32)
        out = jnp.where(active, new_tok, -1)
        if return_logits:
            return state, out, logits[:, 0]
        return state, out

    def _sample(self, logits, key, counts=None, prompt_mask=None,
                samp=None, bias=None):
        """Greedy (temperature=0) or in-graph temperature/top-k/top-p
        sampling (same semantics as models.GPT._sample). With a
        ``sampling=SamplingParams``, the full processor chain runs instead
        (penalties over ``counts``/``prompt_mask`` rows, min_p, logit
        bias) — serving.sampling.sample. Per-request mode draws each row
        under its own knob row — serving.sampling.sample_batch."""
        if self.per_request_sampling:
            from np_modeling_tpu.serving import sampling as _sampling
            return _sampling.sample_batch(logits, key, samp, counts,
                                          prompt_mask, bias)
        if self._sp is not None:
            from np_modeling_tpu.serving import sampling as _sampling
            return _sampling.sample(logits, key, self._sp, counts,
                                    prompt_mask, self._sp_bias)
        if self.temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        from np_modeling_tpu.models.transformer_lm import GPT
        return GPT._sample(logits, key, self.temperature, 0,
                           self.top_k, self.top_p).astype(jnp.int32)

    def _append(self, state, li, pages, offs, k_new, v_new):
        """Scatter [hkv, N, dk] new K/V into layer li's pages at
        (pages[n], offs[n]) — one batched scatter, device-side, in place
        on the donated per-layer buffer."""
        if self.quantize_kv:
            from np_modeling_tpu.ops.quantization import quantize_int8
            kq = quantize_int8(k_new)
            state["k_scales"][li] = state["k_scales"][li].at[
                :, pages, offs].set(kq.scales)
            k_new = kq.values
            if v_new is not None:
                vq = quantize_int8(v_new)
                state["v_scales"][li] = state["v_scales"][li].at[
                    :, pages, offs].set(vq.scales)
                v_new = vq.values
        state["k_pages"][li] = state["k_pages"][li].at[:, pages, offs].set(
            k_new.astype(state["k_pages"][li].dtype))
        if v_new is not None:
            state["v_pages"][li] = state["v_pages"][li].at[
                :, pages, offs].set(v_new.astype(state["v_pages"][li].dtype))
        return state

    @staticmethod
    def _window_for(li, c):
        """Layer li's sliding window (None = global). Mirrors
        GPT._block_for's Gemma-2 alternation."""
        if c.window_pattern > 1 and li % c.window_pattern != 0:
            return None
        return c.attention_window

    def _block_step_mla(self, bp, x, li, state, gpt, trash):
        """One MLA block on the [S, t, d] decode slice: latent page append
        + ABSORBED paged attention. The pages hold concat(c_kv, k_pe)
        (kv_lora_rank + rope numbers per token, one shared head); the page
        row doubles as v — k_pages is passed as BOTH paged-attention
        operands and the latent output is the first kv_lora_rank columns.
        Mirrors nn.mla.MLAttention._decode over non-contiguous pages."""
        import math as _math
        block = gpt._block_for(li)
        attn = block.attn
        assert (block.norm_first and not block.parallel_residual
                and not block.sandwich_norm)
        active, lengths = state["active"], state["lengths"]
        t = x.shape[1]

        skip = x
        y = block.norm1.apply(bp["norm1"], x)
        ap = bp["self_attention"]
        q = attn._q_heads(ap, y)              # [S, hq, t, nope+rope]
        q_nope, q_pe = jnp.split(q, [attn.qk_nope_head_dim], axis=-1)
        c_lat, k_pe = attn._latent(ap, y)     # [S, 1, t, rank] / [.., rope]

        from np_modeling_tpu.ops.rope import apply_rope
        pos = lengths[:, None] + jnp.arange(t)              # [S, t]
        q_pe = apply_rope(q_pe, pos, attn.rope_base, None, attn.rope_scaling)
        k_pe = apply_rope(k_pe, pos, attn.rope_base, None, attn.rope_scaling)
        k_new = jnp.concatenate([c_lat, k_pe], axis=-1)     # [S, 1, t, w]

        tok_pos = pos
        page_pos = tok_pos // self.page_size
        slot_off = (tok_pos % self.page_size).reshape(-1)
        pages = jnp.take_along_axis(state["table"], page_pos, axis=1)
        pages = jnp.where(active[:, None], pages, trash).reshape(-1)
        width = k_new.shape[-1]
        k_flat = jnp.swapaxes(k_new, 0, 1).reshape(1, -1, width)
        state = self._append(state, li, pages, slot_off, k_flat, None)

        att_len = jnp.where(active, lengths + t, 0)
        kwargs = {}
        if self.quantize_kv:
            # One scale set: the dequantized latent serves as both k and v.
            sc = state["k_scales"][li]
            kwargs = {"k_scales": sc, "v_scales": sc}
        wk = ap["kv_b"][:, :, :attn.qk_nope_head_dim]       # [rank, hq, n]
        q_abs = jnp.einsum("bhtn,rhn->bhtr", q_nope,
                           wk.astype(q_nope.dtype))
        q_eff = jnp.concatenate([q_abs, q_pe], axis=-1)     # [S, hq, t, w]
        scale = 1.0 / _math.sqrt(attn.qk_head_dim)
        kp = state["k_pages"][li]
        o = ops.paged_attention(jnp.swapaxes(q_eff, 1, 2), kp, kp,
                                att_len, state["table"], scale=scale,
                                **kwargs)
        o_lat = o[..., :attn.kv_lora_rank]                  # [S, t, hq, r]
        wv = ap["kv_b"][:, :, attn.qk_nope_head_dim:]       # [rank, hq, v]
        o_heads = jnp.einsum("bthr,rhv->bthv",
                             o_lat.astype(jnp.float32),
                             wv.astype(jnp.float32))
        hq, vd = o_heads.shape[2], o_heads.shape[3]
        wo = ap["wo"].astype(x.dtype)
        y = ops.linear(o_heads.reshape(x.shape[0], t, hq * vd).astype(
            x.dtype), wo.reshape(hq * vd, -1), None)
        y = y + skip

        skip = y
        z = block.norm2.apply(bp["norm2"], y)
        if "moe" in bp:
            z, _ = block.moe.apply_with_aux(bp["moe"], z)
        else:
            z = block._ffn(bp, z, x.shape[-1]).astype(x.dtype)
        return z + skip, state

    def _block_step(self, bp, x, li, state, gpt, trash, lora=None):
        """One transformer block on the [S, t, d] decode slice (t = 1 for
        plain decode; t = gamma+1 for speculative verification): batched
        page append + paged attention + FFN/MoE. Mirrors
        TransformerEncoderBlock.apply (eval mode, both norm orders).
        ``lora``: stacked multi-LoRA tensors — per-slot factored deltas are
        added to the q/k/v/o projections (slot's adapter index from
        ``state['adapter']``; 0 = base)."""
        c = gpt.config
        block = gpt._block_for(li)
        attn = block.attn
        # Route by THIS gpt's config, not the engine flag: an MLA target
        # can verify with a dense MHA draft (separate lane, same step fn).
        if getattr(c, "mla", None):
            return self._block_step_mla(bp, x, li, state, gpt, trash)
        active, lengths = state["active"], state["lengths"]
        t = x.shape[1]

        skip = x
        y = block.norm1.apply(bp["norm1"], x) if block.norm_first else x
        n1 = y                     # parallel-residual blocks reuse this
        ap = bp["self_attention"]
        q = attn._project(y, ap["wq"], ap.get("bq"))        # [S, hq, t, dk]
        k = attn._project(y, ap["wk"], ap.get("bk"))
        v = attn._project(y, ap["wv"], ap.get("bv"))
        if lora is not None:
            aidx = state["adapter"]

            def _adapt(t_, name):
                d_ = self._lora_qkv_delta(lora, li, name, y, aidx)
                return t_ if d_ is None else t_ + d_.astype(t_.dtype)

            q, k, v = _adapt(q, "wq"), _adapt(k, "wk"), _adapt(v, "wv")
        if attn.qk_norm:
            q, k = attn._apply_qk_norm(ap, q, k)
        if attn.rope:
            from np_modeling_tpu.ops.rope import apply_rope
            pos = lengths[:, None] + jnp.arange(t)          # [S, t]
            q = apply_rope(q, pos, attn.rope_base, attn.rope_dim,
                           attn.rope_scaling)
            k = apply_rope(k, pos, attn.rope_base, attn.rope_dim,
                           attn.rope_scaling)

        # Batched append: slot n's token i writes
        # (page_of(lengths[n] + i), (lengths[n] + i) % ps);
        # inactive slots write the trash page.
        tok_pos = lengths[:, None] + jnp.arange(t)          # [S, t]
        page_pos = tok_pos // self.page_size
        slot_off = (tok_pos % self.page_size).reshape(-1)
        pages = jnp.take_along_axis(state["table"], page_pos, axis=1)
        pages = jnp.where(active[:, None], pages, trash).reshape(-1)
        hkv = k.shape[1]
        dk_ = k.shape[-1]
        k_flat = jnp.swapaxes(k, 0, 1).reshape(hkv, -1, dk_)  # [hkv, S*t, dk]
        v_flat = jnp.swapaxes(v, 0, 1).reshape(hkv, -1, dk_)
        state = self._append(state, li, pages, slot_off, k_flat, v_flat)

        att_len = jnp.where(active, lengths + t, 0)
        kwargs = {}
        if self.quantize_kv:
            kwargs = {"k_scales": state["k_scales"][li],
                      "v_scales": state["v_scales"][li]}
        if attn.attn_scale is not None:
            kwargs["scale"] = attn.attn_scale
        if attn.attn_softcap is not None:
            kwargs["softcap"] = attn.attn_softcap
        if attn.attn_sinks:
            kwargs["sinks"] = ap["sinks"]
        o = self._paged(jnp.swapaxes(q, 1, 2),              # [S, t, hq, dk]
                        state["k_pages"][li], state["v_pages"][li],
                        att_len, state["table"],
                        window=self._window_for(li, c), kwargs=kwargs)
        hq, dk, d_out = ap["wo"].shape
        o4 = o.astype(x.dtype)                              # [S, t, hq, dk]
        o = o4.reshape(x.shape[0], t, hq * dk)
        bo = ap.get("bo")
        y = ops.linear(o, ap["wo"].reshape(hq * dk, d_out).astype(x.dtype),
                       bo.astype(x.dtype) if bo is not None else None)
        if lora is not None:
            d_ = self._lora_o_delta(lora, li, o4, state["adapter"])
            if d_ is not None:
                y = y + d_.astype(y.dtype)
        if block.sandwich_norm:
            y = block.post_norm1.apply(bp["post_norm1"], y)
        if block.parallel_residual:
            # x + attn(n1(x)) + ffn(norm2(x) | n1(x)) — mirrors
            # TransformerEncoderBlock.apply's parallel form.
            f_in = (n1 if block.parallel_shared_norm
                    else block.norm2.apply(bp["norm2"], x))
            if "moe" in bp:
                z, _ = block.moe.apply_with_aux(bp["moe"], f_in)
            else:
                z = block._ffn(bp, f_in, x.shape[-1]).astype(x.dtype)
            return x + y + z, state
        y = y + skip
        if not block.norm_first:
            y = block.norm1.apply(bp["norm1"], y)

        skip = y
        z = block.norm2.apply(bp["norm2"], y) if block.norm_first else y
        if "moe" in bp:
            z, _ = block.moe.apply_with_aux(bp["moe"], z)
        else:
            z = block._ffn(bp, z, x.shape[-1]).astype(x.dtype)
        if block.sandwich_norm:
            z = block.post_norm2.apply(bp["post_norm2"], z)
        z = z + skip
        if not block.norm_first:
            z = block.norm2.apply(bp["norm2"], z)
        return z, state
