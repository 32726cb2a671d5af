"""Speculative decoding: a small draft model proposes, the target verifies.

Serving-side extension (the reference has no decoding story at all — its
decoder has ``TODO: support cache``, /root/reference/layers/transformer.py:120).
Implements the standard draft-verify scheme (Leviathan et al. 2023 /
Chen et al. 2023):

- the DRAFT model autoregressively proposes ``gamma`` tokens,
- the TARGET scores all ``gamma + 1`` positions in ONE forward pass
  (turning ``gamma`` sequential target steps into one parallel one),
- greedy mode accepts the longest prefix whose tokens match the target's
  argmax — output is TOKEN-EXACT vs running the target alone;
- sampling mode does the accept/reject correction (accept ``d`` with
  probability ``min(1, p_t(d)/p_d(d))``, resample rejects from
  ``norm(max(0, p_t - p_d))``) so the output DISTRIBUTION equals target-only
  sampling.

KV-cache rollback: both models keep dense caches; a rejected suffix is
"erased" by resetting the cache's write index — stale k/v beyond the index
are masked by the decode mask and overwritten by later writes (see
nn/attention.py ``_update_cache``). Batched: per-row acceptance lengths
diverge, so the caches carry PER-ROW ``[b]`` write indices (rows roll back
independently); finished rows idle until the slowest row completes. The
whole loop is one jittable ``lax.while_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def speculative_accept(p_t, p_d, drafts, key):
    """Batched accept/resample core of speculative SAMPLING (shared by
    :func:`speculative_generate` and the serving engine's draft lane).

    ``p_t [..., gamma+1, V]``: target probabilities (position i predicts
    the token after input i); ``p_d [..., gamma, V]``: draft probabilities
    (position i is the distribution ``drafts[..., i]`` was drawn from);
    ``drafts [..., gamma]``. Accepts draft token d with probability
    ``min(1, p_t(d)/p_d(d))``; the first reject resamples from the
    normalized residual ``max(0, p_t - p_d)``; full acceptance draws from
    ``p_t[..., -1, :]``. Returns ``(n_acc [...], nxt [...])``.
    """
    gamma = drafts.shape[-1]
    kacc, kres = jax.random.split(key)
    pt_d = jnp.take_along_axis(p_t[..., :gamma, :], drafts[..., None],
                               axis=-1)[..., 0]
    pd_d = jnp.take_along_axis(p_d, drafts[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(kacc, drafts.shape)
    ok = (u < jnp.minimum(1.0, pt_d / jnp.maximum(pd_d, 1e-20)))
    n_acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=-1), axis=-1)
    j = jnp.minimum(n_acc, gamma - 1)
    pt_j = jnp.take_along_axis(p_t, j[..., None, None], axis=-2)[..., 0, :]
    pd_j = jnp.take_along_axis(p_d, j[..., None, None], axis=-2)[..., 0, :]
    resid = jnp.maximum(pt_j - pd_j, 0.0)
    resid = resid / jnp.maximum(jnp.sum(resid, -1, keepdims=True), 1e-20)
    dist = jnp.where((n_acc < gamma)[..., None], resid, p_t[..., -1, :])
    nxt = jax.random.categorical(kres, jnp.log(dist + 1e-30),
                                 axis=-1).astype(jnp.int32)
    return n_acc, nxt


def speculative_accept_logits(t_logits, d_logits, drafts, key, temperature,
                              top_k=None, top_p=None):
    """:func:`speculative_accept` on raw logits: both sides go through the
    SAME temperature + top-k/top-p filtering (GPT._sample's distribution),
    which is what makes filtered speculative sampling distribution-exact."""
    from np_modeling_tpu.models.transformer_lm import filter_logits
    p_t = jax.nn.softmax(filter_logits(t_logits / temperature, top_k,
                                       top_p), axis=-1)
    p_d = jax.nn.softmax(filter_logits(d_logits / temperature, top_k,
                                       top_p), axis=-1)
    return speculative_accept(p_t, p_d, drafts, key)


def _reset_index(caches, new_index):
    """Roll a cache pytree's write positions back to ``new_index``.

    Broadcasting keeps the index leaf's shape: scalar / ``[b]`` per-row for
    the list cache layout, ``[num_layers]`` / ``[num_layers, b]`` for the
    scan_layers stacked layout (a shape change would alter the while_loop
    carry type and fail to trace). ``new_index`` may be scalar or ``[b]``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            jnp.broadcast_to(new_index, leaf.shape).astype(leaf.dtype)
            if path[-1].key == "index" else leaf),
        caches, is_leaf=None)


def _per_row_index(caches, batch):
    """Convert a cache pytree's shared scalar write positions to per-row
    ``[b]`` indices (rows may then commit different lengths per round —
    see nn/attention.py ``_update_cache``)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            jnp.broadcast_to(leaf[..., None], (*leaf.shape, batch))
            if path[-1].key == "index" else leaf),
        caches, is_leaf=None)


def speculative_generate(target, target_params, draft, draft_params,
                         prompt_tokens, steps: int, gamma: int = 4,
                         key=None, temperature: float = 0.0,
                         top_k=None, top_p=None,
                         return_stats: bool = False):
    """Decode ``steps`` tokens from ``target`` using ``draft`` proposals.

    ``target``/``draft``: GPT instances (may differ in size/config; they
    only need to share the vocab). ``temperature=0`` or ``key=None`` is
    greedy (token-exact vs ``target.generate``, every row); otherwise
    speculative sampling. ``prompt_tokens`` may be ANY batch size — rows
    accept different draft lengths per round, tracked with per-row cache
    write indices (nn/attention.py ``_update_cache``); rows that reach
    ``steps`` idle (produce 0) until the slowest row finishes. Returns
    ``[b, steps]`` tokens (plus ``(accepted, rounds)`` totals if
    ``return_stats`` — ``accepted / (active_rows * gamma)`` summed over
    rounds gives the draft acceptance rate).
    """
    b, plen = prompt_tokens.shape
    greedy = temperature == 0.0 or key is None
    if key is None:
        key = jax.random.PRNGKey(0)

    max_len = plen + steps + gamma + 1
    t_caches = target.init_cache(b, max_len)
    d_caches = draft.init_cache(b, max_len)

    # Invariant: before each round, both caches hold exactly the tokens
    # BEFORE cur_tok for every row (after prefill: the prompt).
    t_logits, t_caches = target.apply(target_params, prompt_tokens,
                                      caches=t_caches, decode=True,
                                      logits_last_only=True)
    _, d_caches = draft.apply(draft_params, prompt_tokens,
                              caches=d_caches, decode=True,
                              logits_last_only=True)
    # Rows commit different lengths per round: per-row write indices.
    t_caches = _per_row_index(t_caches, b)
    d_caches = _per_row_index(d_caches, b)

    from np_modeling_tpu.models.transformer_lm import filter_logits

    def sample(logits, k):
        if greedy:
            return jnp.argmax(logits, axis=-1)
        return jax.random.categorical(
            k, filter_logits(logits / temperature, top_k, top_p), axis=-1)

    cur = sample(t_logits[:, -1], jax.random.fold_in(key, 0))

    # Output buffer with gamma+1 slack so the final round's fixed-width
    # write never lands out of bounds.
    out = jnp.zeros((b, steps + gamma + 1), jnp.int32)

    def cond(state):
        return jnp.min(state[0]) < steps

    def body(state):
        n, cur, out, t_caches, d_caches, key, acc_total, rounds = state
        key = jax.random.fold_in(key, rounds + 1)
        done = n >= steps                                     # [b]

        # ---- draft proposes gamma tokens (sequential, cheap model) ------
        def d_body(carry, i):
            tok, caches = carry
            lg, caches = draft.apply(draft_params, tok[:, None],
                                     caches=caches, decode=True)
            lg = lg[:, -1]
            nxt = sample(lg, jax.random.fold_in(key, i))
            return (nxt, caches), (nxt, lg)

        (_, d_caches), (drafts, d_logits) = jax.lax.scan(
            d_body, (cur, d_caches), jnp.arange(gamma))
        drafts = drafts.T                   # [b, gamma]
        d_logits = jnp.swapaxes(d_logits, 0, 1)  # [b, gamma, vocab]
        # Write the last proposal's k/v too, so a fully-accepted round
        # leaves the draft cache complete (logits discarded).
        _, d_caches = draft.apply(draft_params, drafts[:, -1:],
                                  caches=d_caches, decode=True)

        # ---- target verifies all gamma+1 positions in one pass ----------
        block = jnp.concatenate([cur[:, None], drafts], axis=1)  # [b, g+1]
        t_logits, t_caches = target.apply(target_params, block,
                                          caches=t_caches, decode=True)

        if greedy:
            t_choice = jnp.argmax(t_logits, axis=-1)        # [b, g+1]
            ok = drafts == t_choice[:, :-1]                  # [b, g]
            n_acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1),
                            axis=1)                          # [b]
            nxt = jnp.take_along_axis(t_choice, n_acc[:, None],
                                      axis=1)[:, 0]
        else:
            n_acc, nxt = speculative_accept_logits(
                t_logits, d_logits, drafts, jax.random.fold_in(key, 7777),
                temperature, top_k, top_p)

        # ---- commit: write tokens, roll back rejected cache suffix ------
        # Per-row write at offset n[row]; finished rows keep their output
        # (the clamped write below them is discarded by the where).
        out_new = jax.vmap(lambda o, blk, p: jax.lax.dynamic_update_slice(
            o, blk, (p,)))(out, block, n)
        out = jnp.where(done[:, None], out, out_new)
        produced = jnp.where(done, 0, n_acc + 1)  # cur + accepted drafts;
                                                  # idle rows commit nothing
        base_t = _cache_index(target, t_caches) - (gamma + 1)
        base_d = _cache_index(draft, d_caches) - (gamma + 1)
        t_caches = _reset_index(t_caches, base_t + produced)
        d_caches = _reset_index(d_caches, base_d + produced)
        cur = jnp.where(done, cur, nxt)
        return (n + produced, cur, out, t_caches, d_caches, key,
                acc_total + jnp.sum(jnp.where(done, 0, n_acc)), rounds + 1)

    state = (jnp.zeros((b,), jnp.int32), cur, out, t_caches, d_caches, key,
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    n, cur, out, *_, acc_total, rounds = jax.lax.while_loop(cond, body,
                                                            state)
    tokens = out[:, :steps]
    if return_stats:
        return tokens, (acc_total, rounds)
    return tokens


def _cache_index(model, caches):
    """Current write position of a GPT cache pytree (scan or list layout)."""
    if model.config.scan_layers:
        return caches["index"][0]
    return caches[0]["index"]
