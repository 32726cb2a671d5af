"""Sampling params + in-graph logits processors for serving.

The OpenAI/vLLM-standard decode-time controls the model zoo's plain
``generate(temperature, top_k, top_p)`` surface doesn't cover:

- ``repetition_penalty`` (HF semantics: logits of every token SEEN —
  prompt or generated — are divided by γ when positive, multiplied
  when negative),
- ``presence_penalty`` / ``frequency_penalty`` (OpenAI semantics:
  subtract ``p·1[count>0] + f·count`` over GENERATED tokens only),
- ``min_p`` (keep tokens whose post-temperature probability is at
  least ``min_p`` times the top token's),
- ``logit_bias`` (per-token additive bias) and ``banned_tokens``
  (hard -inf).

Everything is a pure [..., vocab] -> [..., vocab] jnp transform so the
engines run it INSIDE the jitted decode step: the per-slot token
statistics (an int32 count table and a prompt-membership mask) live in
the engine's donated state pytree and are updated in-graph as tokens
are sampled — no host round-trip per token. Tested against
``transformers``' RepetitionPenaltyLogitsProcessor / MinPLogitsWarper
and hand-computed OpenAI-style penalties (tests/test_sampling.py).

Reference lineage: the reference has no serving tier (SURVEY.md §5
"Serving (beyond ref)"); semantics follow the de-facto public APIs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-engine decode-time sampling configuration.

    ``temperature=0`` is greedy (argmax of the PROCESSED logits — the
    penalties still apply). ``logit_bias`` maps token id -> additive
    bias; ``banned_tokens`` is a hard never-emit set."""

    temperature: float = 0.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    min_p: Optional[float] = None
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    logit_bias: Optional[dict] = None
    banned_tokens: Optional[tuple] = None

    @property
    def needs_token_stats(self) -> bool:
        """True when sampling reads per-sequence token statistics (the
        engines then carry count/prompt-mask tables in device state)."""
        return (self.repetition_penalty != 1.0
                or self.presence_penalty != 0.0
                or self.frequency_penalty != 0.0)


def static_bias(params: SamplingParams, vocab_size: int):
    """Fold ``logit_bias`` + ``banned_tokens`` into one [vocab] additive
    vector (or None). Computed once per engine, closed over by the jitted
    step — no per-token scatter."""
    if not params.logit_bias and not params.banned_tokens:
        return None
    bias = jnp.zeros((vocab_size,), jnp.float32)
    if params.logit_bias:
        ids = jnp.asarray(sorted(params.logit_bias), jnp.int32)
        vals = jnp.asarray([params.logit_bias[int(i)] for i in ids],
                           jnp.float32)
        bias = bias.at[ids].add(vals)
    if params.banned_tokens:
        bias = bias.at[jnp.asarray(params.banned_tokens, jnp.int32)].set(
            -jnp.inf)
    return bias


def process_logits(logits, params: SamplingParams, counts=None,
                   prompt_mask=None, bias=None):
    """Apply penalties/bias to raw fp32 logits [..., vocab].

    ``counts`` int[..., vocab]: per-sequence GENERATED-token counts.
    ``prompt_mask`` bool[..., vocab]: prompt membership. ``bias``: the
    precomputed :func:`static_bias` vector."""
    lg = logits.astype(jnp.float32)
    if bias is not None:
        lg = lg + bias
    if params.repetition_penalty != 1.0:
        assert counts is not None and prompt_mask is not None
        seen = prompt_mask | (counts > 0)
        g = jnp.float32(params.repetition_penalty)
        lg = jnp.where(seen, jnp.where(lg > 0, lg / g, lg * g), lg)
    if params.presence_penalty != 0.0:
        lg = lg - params.presence_penalty * (counts > 0)
    if params.frequency_penalty != 0.0:
        lg = lg - params.frequency_penalty * counts.astype(jnp.float32)
    return lg


def min_p_filter(lg, min_p: float):
    """Drop tokens with probability < ``min_p`` * p(top token). On
    logits this is a threshold at ``max + log(min_p)`` — no softmax
    needed."""
    cutoff = jnp.max(lg, axis=-1, keepdims=True) + jnp.log(min_p)
    return jnp.where(lg < cutoff, -jnp.inf, lg)


def sample(logits, key, params: SamplingParams, counts=None,
           prompt_mask=None, bias=None):
    """Penalties -> temperature -> top-k/top-p/min-p -> draw. Greedy
    (``temperature=0`` or ``key=None``) still applies the processors.
    Returns int32 token ids [...]."""
    from np_modeling_tpu.models.transformer_lm import filter_logits
    lg = process_logits(logits, params, counts, prompt_mask, bias)
    if params.temperature == 0.0 or key is None:
        return jnp.argmax(lg, axis=-1).astype(jnp.int32)
    lg = filter_logits(lg / params.temperature, params.top_k, params.top_p)
    if params.min_p is not None:
        lg = min_p_filter(lg, params.min_p)   # post-temperature (HF order)
    # fold_in(0) mirrors GPT._sample's salt so a penalties-free
    # SamplingParams draws the SAME stream as the legacy plain fields.
    key = jax.random.fold_in(key, 0)
    return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)


def token_histogram(tokens, vocab_size: int):
    """int tokens [n] -> int32 counts [vocab] (host-side helper for
    prompt masks / prefill count rows)."""
    return jnp.zeros((vocab_size,), jnp.int32).at[
        jnp.asarray(tokens, jnp.int32)].add(1)
