"""Knowledge distillation (Hinton et al. 2015): train a student to match a
teacher's output distribution.

The production use here is draft-model training for speculative decoding
(models/speculative.py, serving/engine.py): a distilled draft's acceptance
rate directly multiplies serving throughput — tested end-to-end in
tests/test_distill.py (acceptance rises after distillation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops


def distill_loss(student_logits, teacher_logits, temperature: float = 1.0,
                 labels=None, alpha: float = 1.0, valid=None):
    """``alpha * T^2 * KL(teacher_T || student_T) + (1-alpha) * CE(labels)``.

    ``temperature`` softens both distributions (the ``T^2`` factor keeps
    gradient magnitudes comparable across temperatures, per the paper).
    ``labels``: optional integer targets for the hard-label CE term
    (required if ``alpha < 1``). ``valid``: optional 0/1 position weights.
    The teacher is stop-gradiented — only the student learns.
    """
    t = jax.lax.stop_gradient(teacher_logits)
    kl = ops.kl_divergence_from_logits(student_logits / temperature,
                                       t / temperature)
    loss = alpha * (temperature ** 2) * kl
    if alpha < 1.0:
        assert labels is not None, "alpha < 1 needs hard labels"
        ce = ops.softmax_cross_entropy_with_integer_labels(student_logits,
                                                           labels)
        loss = loss + (1.0 - alpha) * ce
    if valid is not None:
        w = valid.astype(jnp.float32)
        return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(loss)


def distill_gpt_loss(student, student_params, teacher, teacher_params,
                     tokens, temperature: float = 1.0, alpha: float = 1.0,
                     segment_ids=None):
    """Sequence-level KD for GPTs: student matches the teacher's next-token
    distributions over ``tokens``. Differentiable in ``student_params``
    only. The hard-label term uses the data's own next tokens."""
    s_logits = student.apply(student_params, tokens[..., :-1],
                             segment_ids=(segment_ids[..., :-1]
                                          if segment_ids is not None
                                          else None))
    t_logits = teacher.apply(teacher_params, tokens[..., :-1],
                             segment_ids=(segment_ids[..., :-1]
                                          if segment_ids is not None
                                          else None))
    valid = None
    if segment_ids is not None:
        valid = (segment_ids[..., 1:] == segment_ids[..., :-1])
    return distill_loss(s_logits, t_logits, temperature,
                        labels=tokens[..., 1:], alpha=alpha, valid=valid)
