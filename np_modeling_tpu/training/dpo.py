"""Direct Preference Optimization (and IPO) — preference post-training.

The reference has no post-training objectives; this extends the loss tier
(SURVEY.md L4) with the standard RLHF-free preference losses (Rafailov et
al. DPO; Azar et al. IPO). Everything is a pure function of per-sequence
log-probabilities, so the same ``dpo_loss`` serves any model family; the
``gpt_dpo_loss`` convenience wires it to the flagship GPT with a frozen
reference-policy forward under ``stop_gradient``.

TPU notes: ``sequence_logprobs`` rides the one-hot-free integer-label CE
(fp32 statistics, bf16 matmuls), so the policy and reference forwards are
two standard GPT calls that XLA fuses/schedules like the train step; pack
chosen and rejected into ONE [2b, s] batch (as ``gpt_dpo_loss`` does) so
the MXU sees one large matmul stream instead of two half-size ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops


def sequence_logprobs(gpt, params, tokens, mask=None, training=False,
                      rngs=None):
    """Per-sequence ``sum_i log p(t_i | t_<i)`` for a causal LM, [b].

    ``mask`` [b, s] marks tokens that COUNT AS TARGETS (e.g. the response
    span in a prompt+response row; position i masks target token i —
    the prompt and padding get 0). Defaults to all positions past the
    first."""
    logits = gpt.apply(params, tokens[:, :-1], training=training, rngs=rngs)
    targets = tokens[:, 1:]
    nll = ops.softmax_cross_entropy_with_integer_labels(logits, targets)
    if mask is not None:
        nll = nll * mask[:, 1:].astype(nll.dtype)
    return -jnp.sum(nll, axis=-1)


def dpo_loss(policy_chosen_lp, policy_rejected_lp, ref_chosen_lp,
             ref_rejected_lp, beta: float = 0.1,
             label_smoothing: float = 0.0, variant: str = "sigmoid"):
    """Preference loss from per-sequence logprobs; returns
    ``(loss, (chosen_rewards, rejected_rewards))``.

    - ``sigmoid`` (DPO): ``−log σ(β·h)`` with label smoothing mixing in
      ``−log σ(−β·h)``, where ``h = (π_c − ref_c) − (π_r − ref_r)``.
    - ``ipo``: ``(h − 1/(2β))²`` — bounded, no sigmoid saturation.

    Rewards are the implicit ``β·(π − ref)`` terms (stop-gradient'd,
    for logging/early-stopping: their margin should grow)."""
    h = ((policy_chosen_lp - ref_chosen_lp)
         - (policy_rejected_lp - ref_rejected_lp))
    if variant == "sigmoid":
        loss = (-jax.nn.log_sigmoid(beta * h) * (1.0 - label_smoothing)
                - jax.nn.log_sigmoid(-beta * h) * label_smoothing)
    elif variant == "ipo":
        loss = (h - 1.0 / (2.0 * beta)) ** 2
    else:
        raise ValueError(f"unknown dpo variant: {variant!r}")
    chosen_rewards = beta * jax.lax.stop_gradient(
        policy_chosen_lp - ref_chosen_lp)
    rejected_rewards = beta * jax.lax.stop_gradient(
        policy_rejected_lp - ref_rejected_lp)
    return jnp.mean(loss), (chosen_rewards, rejected_rewards)


def gpt_dpo_loss(gpt, params, ref_params, chosen, rejected,
                 chosen_mask=None, rejected_mask=None, beta: float = 0.1,
                 label_smoothing: float = 0.0, variant: str = "sigmoid",
                 training=False, rngs=None):
    """DPO/IPO step loss for the flagship GPT.

    ``chosen``/``rejected`` [b, s]: token rows (prompt + response, same
    prompt per pair); masks select the response span. The reference
    policy (``ref_params``, typically the pre-DPO checkpoint) runs under
    ``stop_gradient``. Chosen and rejected rows are packed into one
    [2b, s] forward per policy. Returns ``(loss, aux)`` with
    ``aux = {"chosen_rewards", "rejected_rewards", "accuracy"}``."""
    b = chosen.shape[0]
    both = jnp.concatenate([chosen, rejected], axis=0)
    mask = None
    if chosen_mask is not None or rejected_mask is not None:
        ones = jnp.ones_like(chosen)
        mask = jnp.concatenate(
            [ones if chosen_mask is None else chosen_mask,
             ones if rejected_mask is None else rejected_mask], axis=0)

    pol = sequence_logprobs(gpt, params, both, mask, training=training,
                            rngs=rngs)
    ref = jax.lax.stop_gradient(
        sequence_logprobs(gpt, ref_params, both, mask))
    loss, (cr, rr) = dpo_loss(pol[:b], pol[b:], ref[:b], ref[b:],
                              beta=beta, label_smoothing=label_smoothing,
                              variant=variant)
    aux = {"chosen_rewards": cr, "rejected_rewards": rr,
           "accuracy": jnp.mean((cr > rr).astype(jnp.float32))}
    return loss, aux
