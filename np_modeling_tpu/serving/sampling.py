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


# ---- per-request sampling (vLLM-style) ------------------------------------
#
# The engine's per-request mode keeps ONE [S, 7] fp32 parameter table in
# device state — a row per slot, columns below — so every live sequence
# decodes with its own controls in the same jitted dispatch. All knobs are
# data (not trace constants), so joining/leaving requests never recompiles.

PARAM_COLS = ("temperature", "top_k", "top_p", "min_p",
              "repetition_penalty", "presence_penalty", "frequency_penalty")
# Disabled-knob encodings (a row of these == greedy argmax):
_OFF = {"temperature": 0.0, "top_k": 0.0, "top_p": 1.0, "min_p": 0.0,
        "repetition_penalty": 1.0, "presence_penalty": 0.0,
        "frequency_penalty": 0.0}


def params_row(sp: Optional[SamplingParams]):
    """Encode one SamplingParams as a length-7 fp32 row (None = greedy).
    ``logit_bias``/``banned_tokens`` are NOT in the row — they fold into
    the engine's per-slot bias table (see :func:`static_bias`)."""
    import numpy as np
    if sp is None:
        return np.asarray([_OFF[c] for c in PARAM_COLS], np.float32)
    vals = [sp.temperature, sp.top_k, sp.top_p, sp.min_p,
            sp.repetition_penalty, sp.presence_penalty, sp.frequency_penalty]
    return np.asarray([_OFF[c] if v is None else float(v)
                       for c, v in zip(PARAM_COLS, vals)], np.float32)


def sample_batch(logits, key, table, counts=None, prompt_mask=None,
                 bias=None):
    """Per-ROW processor chain + draw: logits [S, V], ``table`` [S, 7]
    (:data:`PARAM_COLS`), optional counts/prompt_mask [S, V] and bias
    [S, V]. Rows with temperature 0 take the (processed) argmax; sampled
    rows draw from their own temperature/top-k/top-p/min-p distribution.
    One descending sort serves both per-row top-k and top-p. Matches the
    single-config :func:`sample` exactly when every row encodes the same
    SamplingParams (asserted in tests/test_sampling.py)."""
    lg = logits.astype(jnp.float32)
    V = lg.shape[-1]
    if bias is not None:
        lg = lg + bias
    rep = table[:, 4:5]
    if counts is not None:
        seen = prompt_mask | (counts > 0)
        pen = jnp.where(lg > 0, lg / rep, lg * rep)
        lg = jnp.where(seen & (rep != 1.0), pen, lg)
        lg = lg - table[:, 5:6] * (counts > 0)
        lg = lg - table[:, 6:7] * counts.astype(jnp.float32)
    greedy_tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)

    t = table[:, 0:1]
    lgt = lg / jnp.where(t > 0, t, 1.0)
    srt = -jnp.sort(-lgt, axis=-1)                       # descending
    # top-k: kth-largest per row (k=0 -> V, i.e. keep everything).
    k = jnp.where(table[:, 1] > 0, table[:, 1], V).astype(jnp.int32)
    kth = jnp.take_along_axis(srt, jnp.clip(k - 1, 0, V - 1)[:, None],
                              axis=-1)
    keep = lgt >= kth
    # top-p: smallest kept logit of each row's nucleus (p=1 keeps all).
    # filter_logits applies top-k FIRST, so the nucleus is over the
    # top-k-renormalized distribution — mask srt's tail before softmax
    # (srt is descending, so rank == index).
    srt = jnp.where(jnp.arange(V)[None, :] < k[:, None], srt, -jnp.inf)
    probs = jax.nn.softmax(srt, axis=-1)
    nucleus = jnp.cumsum(probs, axis=-1) - probs < table[:, 2:3]
    cutoff_p = jnp.min(jnp.where(nucleus, srt, jnp.inf), axis=-1,
                       keepdims=True)
    keep &= lgt >= cutoff_p
    # min_p: threshold at max + log(min_p); min_p=0 -> -inf (off).
    cutoff_m = (jnp.max(lgt, axis=-1, keepdims=True)
                + jnp.log(table[:, 3:4]))
    keep &= lgt >= cutoff_m
    lgt = jnp.where(keep, lgt, -jnp.inf)
    drawn = jax.random.categorical(jax.random.fold_in(key, 0), lgt,
                                   axis=-1).astype(jnp.int32)
    return jnp.where(table[:, 0] == 0.0, greedy_tok, drawn)
