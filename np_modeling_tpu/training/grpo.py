"""GRPO — group-relative policy optimization (DeepSeekMath / R1 recipe).

Critic-free RL post-training: sample G responses per prompt, normalize
rewards WITHIN each group into advantages, and take the PPO-style
clipped-ratio step with a Schulman k3 KL penalty against a frozen
reference policy. Extends the loss tier (SURVEY.md L4) alongside
``training.dpo``; everything is a pure function of per-token logprobs,
so it composes with any causal family (``token_logprobs`` wires the
flagship GPT).

TPU notes: rows are (prompt, response) pairs packed [b = P·G, s] so the
three forwards (policy, old, ref — the latter two under stop_gradient /
precomputed) are standard GPT calls; the group statistics are two
reshaped reductions, no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops


def token_logprobs(gpt, params, tokens, training=False, rngs=None):
    """Per-token ``log p(t_i | t_<i)`` for a causal LM: [b, s-1]
    (position i scores target token i+1)."""
    logits = gpt.apply(params, tokens[:, :-1], training=training, rngs=rngs)
    return -ops.softmax_cross_entropy_with_integer_labels(
        logits, tokens[:, 1:])


def group_advantages(rewards, group_size: int, eps: float = 1e-4):
    """[P·G] rewards (rows grouped per prompt, G consecutive) ->
    group-normalized advantages ``(r − mean_G) / (std_G + eps)``."""
    r = rewards.reshape(-1, group_size)
    mean = jnp.mean(r, axis=-1, keepdims=True)
    std = jnp.std(r, axis=-1, keepdims=True)
    return ((r - mean) / (std + eps)).reshape(-1)


def grpo_loss(policy_logps, old_logps, ref_logps, advantages, mask,
              clip_eps: float = 0.2, kl_beta: float = 0.04):
    """Clipped-ratio GRPO objective; returns ``(loss, aux)``.

    Inputs are PER-TOKEN logprobs [b, s-1] (``token_logprobs``),
    ``advantages`` [b] (``group_advantages``), ``mask`` [b, s-1] marking
    response tokens (position i masks target token i+1 — pass the
    response mask shifted like the tokens). ``old_logps``: the sampling
    policy's logprobs (== policy at the first inner step); ``ref_logps``:
    the frozen pre-RL reference for the KL penalty (Schulman k3 estimator
    ``exp(ref−π) − (ref−π) − 1``, non-negative). Token-mean semantics
    (the DeepSeekMath form: normalize per sequence by its token count,
    mean over rows)."""
    mask = mask.astype(jnp.float32)
    ratio = jnp.exp(policy_logps - jax.lax.stop_gradient(old_logps))
    adv = advantages[:, None]
    unclipped = ratio * adv
    clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
    gain = jnp.minimum(unclipped, clipped)
    d = jax.lax.stop_gradient(ref_logps) - policy_logps
    kl = jnp.exp(d) - d - 1.0
    per_tok = -(gain - kl_beta * kl) * mask
    tok_counts = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    loss = jnp.mean(jnp.sum(per_tok, axis=-1) / tok_counts)
    aux = {
        "kl": jnp.sum(kl * mask) / jnp.sum(tok_counts),
        "clip_frac": jnp.sum((jnp.abs(ratio - 1.0) > clip_eps) * mask)
        / jnp.sum(tok_counts),
    }
    return loss, aux


def gpt_grpo_loss(gpt, params, ref_params, tokens, rewards, mask,
                  group_size: int, old_logps=None, clip_eps: float = 0.2,
                  kl_beta: float = 0.04, training=False, rngs=None):
    """GRPO step loss for the flagship GPT.

    ``tokens`` [P·G, s] (G responses per prompt, consecutive rows),
    ``rewards`` [P·G], ``mask`` [P·G, s] marking response TOKENS.
    ``old_logps``: pass the sampling-time logprobs when doing multiple
    inner epochs per batch; defaults to the current policy's (single
    inner step — ratio 1, pure policy gradient)."""
    pol = token_logprobs(gpt, params, tokens, training=training, rngs=rngs)
    ref = jax.lax.stop_gradient(token_logprobs(gpt, ref_params, tokens))
    if old_logps is None:
        old_logps = jax.lax.stop_gradient(pol)
    adv = group_advantages(rewards, group_size)
    return grpo_loss(pol, old_logps, ref, adv, mask[:, 1:],
                     clip_eps=clip_eps, kl_beta=kl_beta)
