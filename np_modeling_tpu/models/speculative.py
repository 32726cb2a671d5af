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
"erased" by resetting the cache's ``index`` scalar — stale k/v beyond the
index are masked by the decode mask and overwritten by later writes (see
nn/attention.py ``_update_cache``). The whole loop is one jittable
``lax.while_loop``; batch size 1 (per-row acceptance lengths diverge, which
a shared dense cache index cannot represent — serve batches as lanes).
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

    ``full_like`` keeps the index leaf's shape: scalar for the list cache
    layout, ``[num_layers]`` for the scan_layers stacked layout (a scalar
    here would change the while_loop carry type and fail to trace)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: (jnp.full_like(leaf, new_index)
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
    greedy (token-exact vs ``target.generate``); otherwise speculative
    sampling. Returns ``[1, steps]`` tokens (plus ``(accepted, rounds)``
    totals if ``return_stats`` — ``accepted / (rounds * gamma)`` is the
    draft acceptance rate).
    """
    b, plen = prompt_tokens.shape
    assert b == 1, "speculative decoding is per-sequence (batch==1)"
    greedy = temperature == 0.0 or key is None
    if key is None:
        key = jax.random.PRNGKey(0)

    max_len = plen + steps + gamma + 1
    t_caches = target.init_cache(b, max_len)
    d_caches = draft.init_cache(b, max_len)

    # Invariant: before each round, both caches hold exactly the tokens
    # BEFORE cur_tok (after prefill: the prompt).
    t_logits, t_caches = target.apply(target_params, prompt_tokens,
                                      caches=t_caches, decode=True,
                                      logits_last_only=True)
    _, d_caches = draft.apply(draft_params, prompt_tokens,
                              caches=d_caches, decode=True,
                              logits_last_only=True)

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
        return state[0] < steps

    def body(state):
        n, cur, out, t_caches, d_caches, key, acc_total, rounds = state
        key = jax.random.fold_in(key, rounds + 1)

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
        drafts = drafts.T                   # [1, gamma]
        d_logits = jnp.swapaxes(d_logits, 0, 1)  # [1, gamma, vocab]
        # Write the last proposal's k/v too, so a fully-accepted round
        # leaves the draft cache complete (logits discarded).
        _, d_caches = draft.apply(draft_params, drafts[:, -1:],
                                  caches=d_caches, decode=True)

        # ---- target verifies all gamma+1 positions in one pass ----------
        block = jnp.concatenate([cur[:, None], drafts], axis=1)  # [1, g+1]
        t_logits, t_caches = target.apply(target_params, block,
                                          caches=t_caches, decode=True)

        if greedy:
            t_choice = jnp.argmax(t_logits, axis=-1)        # [1, g+1]
            ok = drafts == t_choice[:, :-1]                  # [1, g]
            n_acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1))
            nxt = t_choice[0, n_acc][None]
        else:
            n_acc_v, nxt = speculative_accept_logits(
                t_logits, d_logits, drafts, jax.random.fold_in(key, 7777),
                temperature, top_k, top_p)
            n_acc = n_acc_v[0]

        # ---- commit: write tokens, roll back rejected cache suffix ------
        out = jax.lax.dynamic_update_slice(out, block, (0, n))
        produced = n_acc + 1                 # cur + accepted drafts
        base_t = _cache_index(target, t_caches) - (gamma + 1)
        base_d = _cache_index(draft, d_caches) - (gamma + 1)
        t_caches = _reset_index(t_caches, base_t + produced)
        d_caches = _reset_index(d_caches, base_d + produced)
        return (n + produced, nxt, out, t_caches, d_caches, key,
                acc_total + n_acc, rounds + 1)

    state = (jnp.zeros((), jnp.int32), cur, out, t_caches, d_caches, key,
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
