"""Continuous-batching serving for selective-SSM (Mamba-1/2) models.

The transformer engine's whole job is managing a growing KV cache (paged
tables, window reclamation, chunked prefill). An SSM needs NONE of that:
each sequence's decode state is a fixed-size pytree — per layer a conv
window plus the SSM state, whose layout the MODEL owns via
``init_state(batch)`` (Mamba-1: [d_inner, d_state]; Mamba-2: per-head
[heads, head_dim, d_state] fed by the chunked-SSD prefill) — O(1)
in generated length. Serving therefore reduces to a SLOT BUFFER: state
arrays with a leading ``max_seqs`` axis, one jitted donated step for all
live slots (embed → per-slot recurrence → sample), and host-side slot
assignment. Joining is a parallel-scan prefill (the full prompt in one
associative-scan forward) scattered into the slot's rows; leaving is
just freeing the slot — there is nothing to reclaim.

Token-exact vs ``Mamba.generate`` greedy for every sequence regardless of
join order (tested with staggered continuous batching).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu.models.transformer_lm import GPT


class OutOfSlotsError(RuntimeError):
    pass


@dataclasses.dataclass
class SSMEngine:
    """``temperature=0`` decodes greedily; otherwise temperature/top-k/
    top-p sampling runs in-graph with per-slot, per-step folded keys."""

    model: object                # models.Mamba or models.Mamba2
    params: dict
    max_seqs: int = 16
    temperature: float = 0.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    seed: int = 0

    def __post_init__(self):
        s = self.max_seqs
        # The model owns its decode-state layout (Mamba-1: [d_inner, n]
        # SSM states; Mamba-2: [heads, head_dim, n] + a wider conv over
        # the shared x|B|C channels) — the engine just allocates slots.
        self._states = self.model.init_state(s)
        self._last = jnp.zeros((s,), jnp.int32)
        self._free = list(range(s))
        self._slot = {}                      # seq_id -> slot
        self._pending = {}                   # seq_id -> first sampled token
        self._key = jax.random.PRNGKey(self.seed)
        self._step_count = 0

        model = self.model

        def step_many_fn(params, states, last, delay, key, step0, n_static):
            """``delay`` [max_seqs]: slot i is FROZEN for the first
            ``delay[i]`` iterations (just-joined slots already hold their
            prefill-sampled token — stepping them immediately would drop
            it). Frozen slots re-emit their held token; their states do
            not move."""
            def body(carry, i):
                last, states = carry
                logits, new_states = model.step(params, last, states)
                nxt = GPT._sample(logits, key, self.temperature,
                                  step0 + i, self.top_k, self.top_p)
                act = i >= delay

                def sel(old, new):
                    m = act.reshape((-1,) + (1,) * (new.ndim - 1))
                    return jnp.where(m, new, old)

                states = jax.tree.map(sel, states, new_states)
                last = jnp.where(act, nxt, last)
                return (last, states), last

            (last, states), toks = jax.lax.scan(
                body, (last, states), jnp.arange(n_static))
            return toks, last, states

        # States and the token buffer are DONATED: decode is in place.
        self._step_many = jax.jit(step_many_fn, static_argnums=(6,),
                                  donate_argnums=(1, 2))

    # ---- control plane ----------------------------------------------------

    def add_request(self, seq_id: int, prompt_tokens) -> None:
        """Prefill the prompt (one parallel-scan forward) and claim a slot.
        The first generated token is sampled here and returned by the next
        ``step()``."""
        if seq_id in self._slot:
            raise ValueError(f"seq {seq_id} already live")
        if not self._free:
            raise OutOfSlotsError(
                f"all {self.max_seqs} slots busy; remove() one first")
        slot = self._free.pop()
        prompt = jnp.asarray(prompt_tokens, jnp.int32)[None]
        logits, states = self.model.prefill(self.params, prompt)
        first = GPT._sample(logits, jax.random.fold_in(self._key, seq_id),
                            self.temperature, self._step_count,
                            self.top_k, self.top_p)[0]
        self._states = jax.tree.map(
            lambda buf, st: buf.at[slot].set(st[0]), self._states,
            list(states))
        self._last = self._last.at[slot].set(first)
        self._slot[seq_id] = slot
        self._pending[seq_id] = int(first)

    def add_requests(self, prompts: dict) -> None:
        for seq_id, toks in prompts.items():
            self.add_request(seq_id, toks)

    def remove(self, seq_id: int) -> None:
        self._free.append(self._slot.pop(seq_id))
        self._pending.pop(seq_id, None)

    @property
    def live(self):
        return sorted(self._slot)

    # ---- data plane ---------------------------------------------------------

    def step(self) -> dict:
        """One token for EVERY live sequence in a single dispatch;
        just-joined sequences return their prefill-sampled first token
        (their state stays frozen this call), so each per-sequence stream
        matches ``Mamba.generate`` exactly regardless of join order."""
        return {s: t[0] for s, t in self.step_many(1).items()}

    def step_many(self, n: int) -> dict:
        """n tokens per live sequence in ONE device dispatch (lax.scan);
        returns {seq_id: [tokens]}. Just-joined sequences contribute
        their pending prefill token as token 0 and are frozen for one
        scan iteration, so every stream stays exact."""
        if not self._slot or n <= 0:
            return {}
        delay = np.zeros((self.max_seqs,), np.int32)
        out = {}
        for s in list(self._pending):
            out[s] = [self._pending.pop(s)]
            delay[self._slot[s]] = 1
        key = jax.random.fold_in(self._key, 2 ** 21 + self._step_count)
        toks, self._last, self._states = self._step_many(
            self.params, self._states, self._last, jnp.asarray(delay),
            key, self._step_count, n)
        self._step_count += n
        toks = np.asarray(toks)              # [n, max_seqs]
        for s, slot in self._slot.items():
            start = int(delay[slot])         # frozen rows repeat the held
            col = toks[start:n, slot]        # token — skip them
            out.setdefault(s, []).extend(int(t) for t in col)
        return out
