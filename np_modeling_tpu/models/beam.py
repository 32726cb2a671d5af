"""Beam-search decoding over the KV-cache decode path.

Decoding-side extension (the reference has no inference path at all —
``TODO: support cache``, /root/reference/layers/transformer.py:120; our GPT
adds greedy/sampled ``generate``; this adds width-``beam_size`` search).

TPU-native shape: the beam dimension is folded into the batch
(``[b * beam]`` rows decode in one jitted step — one dispatch for all
hypotheses), beams are reordered by gathering cache rows along the batch
axis, and the whole search is a fixed-length ``lax.scan``. Optional EOS
handling freezes finished hypotheses (they may only extend with EOS at zero
cost) and ranking can apply the GNMT length penalty
``((5 + len) / 6) ** alpha``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _tile_cache(caches, beam, batch_axis=0):
    """Cache leaves -> beam-tiled along the batch axis; leaves with no
    batch axis (scalar index; per-layer [L] index in the scan layout) are
    untouched."""
    return jax.tree_util.tree_map(
        lambda a: (a if a.ndim <= batch_axis
                   else jnp.repeat(a, beam, axis=batch_axis)), caches)


def _gather_cache(caches, rows, batch_axis=0):
    """Reorder cache rows (beam reassignment) by global row indices.

    A top-level dict key ``"aux"`` is gather-EXEMPT: enc-dec adapters put
    beam-INVARIANT conditioning there (encoder memory, source segment
    ids). Beam reassignment only permutes rows within a batch row's beam
    block, where those leaves are identical — the gather would be a
    semantic no-op that still re-materializes the full tiled memory every
    generated token."""
    if isinstance(caches, dict) and "aux" in caches:
        out = _gather_cache({k: v for k, v in caches.items()
                             if k != "aux"}, rows, batch_axis)
        out["aux"] = caches["aux"]
        return out
    return jax.tree_util.tree_map(
        lambda a: (a if a.ndim <= batch_axis
                   else jnp.take(a, rows, axis=batch_axis)), caches)


def beam_search(model, params, prompt_tokens, steps: int, beam_size: int,
                eos_id: int | None = None, alpha: float = 0.0):
    """Search for high-likelihood continuations of ``prompt_tokens``.

    ``model``: a GPT-like module (``init_cache`` + ``apply(decode=True)``).
    Returns ``(tokens [b, beam, steps], scores [b, beam])`` sorted
    best-first. Scores are total log-probabilities; with ``alpha > 0`` the
    ranking (not the search) divides by the GNMT length penalty, using each
    hypothesis' EOS-terminated length.
    """
    b, plen = prompt_tokens.shape
    beam = beam_size
    cfg = getattr(model, "config", None)
    # scan_layers caches are stacked [num_layers, batch, ...]: the batch
    # axis to tile/gather is 1 (and the [num_layers] index leaf, ndim 1,
    # is correctly left alone by the <= batch_axis guard).
    batch_axis = (1 if cfg is not None
                  and getattr(cfg, "scan_layers", False) else 0)

    caches = model.init_cache(b, plen + steps)
    logits, caches = model.apply(params, prompt_tokens, caches=caches,
                                 decode=True, logits_last_only=True)
    logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32))  # [b, V]
    vocab = logp.shape[-1]

    # First expansion: top beam_size distinct first tokens per batch row.
    # beam > vocab (e.g. exhaustive-mode tests): pad with dead hypotheses
    # at NEG_INF — they are outscored by every live continuation.
    k0 = min(beam, vocab)
    scores, first = jax.lax.top_k(logp, k0)                  # [b, k0]
    if k0 < beam:
        pad = beam - k0
        scores = jnp.pad(scores, ((0, 0), (0, pad)),
                         constant_values=NEG_INF)
        first = jnp.pad(first, ((0, 0), (0, pad)))
    caches = _tile_cache(caches, beam, batch_axis)

    seqs = jnp.zeros((b, beam, steps), jnp.int32)
    seqs = seqs.at[:, :, 0].set(first)
    finished = (first == eos_id) if eos_id is not None else jnp.zeros(
        (b, beam), bool)
    lengths = jnp.where(finished, 1, steps)
    batch_base = jnp.arange(b)[:, None] * beam               # [b, 1]

    def step(carry, t):
        caches, scores, seqs, finished, lengths = carry
        last = jax.lax.dynamic_index_in_dim(seqs, t - 1, axis=2,
                                            keepdims=False)  # [b, beam]
        logits, new_caches = model.apply(params, last.reshape(b * beam, 1),
                                         caches=caches, decode=True)
        logp = jax.nn.log_softmax(
            logits[:, -1].astype(jnp.float32)).reshape(b, beam, vocab)
        if eos_id is not None:
            # Finished beams: only EOS continues, at zero additional cost.
            frozen = jnp.full((vocab,), NEG_INF).at[eos_id].set(0.0)
            logp = jnp.where(finished[:, :, None], frozen, logp)

        total = scores[:, :, None] + logp                    # [b, beam, V]
        scores, idx = jax.lax.top_k(total.reshape(b, beam * vocab), beam)
        parent = idx // vocab                                # [b, beam]
        token = idx % vocab

        rows = (batch_base + parent).reshape(-1)             # [b*beam]
        caches = _gather_cache(new_caches, rows, batch_axis)
        seqs = jnp.take_along_axis(seqs, parent[:, :, None], axis=1)
        seqs = seqs.at[:, :, t].set(token)
        finished = jnp.take_along_axis(finished, parent, axis=1)
        lengths = jnp.take_along_axis(lengths, parent, axis=1)
        if eos_id is not None:
            just_done = ~finished & (token == eos_id)
            lengths = jnp.where(just_done, t + 1, lengths)
            finished = finished | just_done
        return (caches, scores, seqs, finished, lengths), None

    if steps > 1:
        (caches, scores, seqs, finished, lengths), _ = jax.lax.scan(
            step, (caches, scores, seqs, finished, lengths),
            jnp.arange(1, steps))

    ranking = scores
    if alpha > 0.0:
        ranking = scores / (((5.0 + lengths.astype(jnp.float32)) / 6.0)
                            ** alpha)
    order = jnp.argsort(-ranking, axis=1)
    seqs = jnp.take_along_axis(seqs, order[:, :, None], axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    return seqs, scores


def encdec_beam_search(init_dec_cache, decode_step, params, batch,
                       bos_token: int, steps: int, beam_size: int,
                       memory, kv_seg=None, eos_id=None, alpha: float = 0.0,
                       prompt=None, aux_extra=None):
    """Beam search for encoder-decoder models (Seq2SeqTransformer, T5,
    Whisper).

    Wraps :func:`beam_search` with the shared cache-riding contract:
    encoder ``memory`` (and optional source segment ids ``kv_seg``) live
    under the gather-exempt ``"aux"`` cache key so every hypothesis stays
    paired with its batch row's conditioning at zero per-step cost.

    ``init_dec_cache(b, max_len)``: decoder self-attention caches.
    ``decode_step(params, tokens, dec_caches, aux) -> (logits, dec_caches)``
    runs the decoder stack one chunk (aux = {"mem", optional "kv_seg"}).
    ``prompt`` [b, plen]: a forced multi-token decoder prefix (Whisper's
    ``<sot><lang><task>``) instead of the single ``bos_token``.
    ``aux_extra``: additional beam-invariant conditioning to ride the aux
    cache (e.g. Whisper's precomputed cross-attention k/v).
    Returns ``(tokens [b, beam, steps], scores [b, beam])`` best-first.
    """

    class _DecoderLM:
        def init_cache(self, b, max_len):
            aux = {"mem": memory}
            if kv_seg is not None:
                aux["kv_seg"] = kv_seg
            if aux_extra is not None:
                aux.update(aux_extra)
            return {"dec": init_dec_cache(b, max_len), "aux": aux}

        def apply(self, params, tokens, caches=None, decode=True,
                  logits_last_only=False):
            logits, dec = decode_step(params, tokens, caches["dec"],
                                      caches["aux"])
            if logits_last_only:
                logits = logits[:, -1:]
            return logits, {"dec": dec, "aux": caches["aux"]}

    if prompt is None:
        prompt = jnp.full((batch, 1), bos_token, jnp.int32)
    return beam_search(_DecoderLM(), params, jnp.asarray(prompt, jnp.int32),
                       steps, beam_size, eos_id=eos_id, alpha=alpha)
