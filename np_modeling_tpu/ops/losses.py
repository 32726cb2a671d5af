"""Loss ops with hand-written VJPs.

Reference parity:
- MSELoss: /root/reference/loss.py:20-29 — fwd ``Σ(y−t)²/y.size``, bwd
  ``2(y−t)/y.size``.
- CrossEntropyLoss: /root/reference/loss.py:32-39 — operates on
  *probabilities* (expects a prior softmax), unnormalized sum ``−Σ t·log y``,
  bwd ``−t/y``. Kept as-is for parity (`cross_entropy_probs`).
- Fused softmax+CE: the composition the reference tests at
  /root/reference/loss_test.py:49-66 (Softmax layer + CrossEntropyLoss vs
  optax.softmax_cross_entropy). Here it's a single fused op on logits whose
  manual gradient is ``softmax(logits) − labels`` — the numerically stable
  form that never materializes probabilities' log.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu.ops.matmul import round_up


@jax.custom_vjp
def mse(y: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.sum(jnp.square(y - targets)) / y.size


def _mse_fwd(y, targets):
    return jnp.sum(jnp.square(y - targets)) / y.size, (y, targets)


def _mse_bwd(res, g):
    y, targets = res
    d = (2.0 / y.size) * (y - targets) * g
    return d, -d


mse.defvjp(_mse_fwd, _mse_bwd)


@jax.custom_vjp
def cross_entropy_probs(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """−Σ t·log(p) on probabilities (unnormalized sum, reference loss.py:33-36)."""
    return -jnp.sum(targets * jnp.log(probs))


def _cep_fwd(probs, targets):
    return -jnp.sum(targets * jnp.log(probs)), (probs, targets)


def _cep_bwd(res, g):
    probs, targets = res
    # Reference bwd: −t/y (loss.py:38-39).
    return (-targets / probs * g, -jnp.log(probs) * g)


cross_entropy_probs.defvjp(_cep_fwd, _cep_bwd)


@jax.custom_vjp
def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-example CE from logits: ``logsumexp(logits) − Σ labels·logits``.

    Returns shape ``logits.shape[:-1]``. Manual VJP: ``softmax(logits) − labels``.
    Reduce outside (sum/mean) as desired.
    """
    return _sxe_impl(logits, labels)[0]


def _sxe_impl(logits, labels):
    m = jnp.max(logits, axis=-1, keepdims=True)
    shifted = logits - jax.lax.stop_gradient(m)
    e = jnp.exp(shifted)
    sum_e = jnp.sum(e, axis=-1, keepdims=True)
    log_z = jnp.log(sum_e) + m
    ce = jnp.squeeze(log_z, -1) - jnp.sum(labels * logits, axis=-1)
    probs = e / sum_e
    return ce, probs


def _sxe_fwd(logits, labels):
    ce, probs = _sxe_impl(logits, labels)
    return ce, (probs, labels, logits)


def _sxe_bwd(res, g):
    probs, labels, logits = res
    g = g[..., None]
    dlogits = (probs - labels) * g
    dlabels = -logits * g
    return dlogits, dlabels


softmax_cross_entropy.defvjp(_sxe_fwd, _sxe_bwd)


@jax.custom_vjp
def softmax_cross_entropy_with_integer_labels(logits: jax.Array,
                                              labels: jax.Array) -> jax.Array:
    """CE from logits with int class labels, one-hot-free END TO END.

    Forward gathers the correct-class logit (``take_along_axis``) instead of
    one-hotting to [.., vocab]; residuals are O(n) (logits + lse + labels —
    no one-hot saved). The manual VJP computes ``(softmax − onehot)·g`` as
    one fused elementwise expression (iota-compare, no scatter) and emits
    no wasted ``dlabels`` (labels are integers — no cotangent). At v=32k
    this removes a full [batch, seq, vocab] fp32 temp from the default
    (non-fused) GPT.loss path. Returns fp32 per-example CE, shape
    ``logits.shape[:-1]``.
    """
    return _sxe_int_impl(logits, labels)[0]


def _sxe_int_impl(logits, labels):
    lf = logits.astype(jnp.float32)
    v = lf.shape[-1]
    m = jnp.max(lf, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(lf - m), axis=-1)) + jnp.squeeze(m, -1)
    # Out-of-range labels keep the one-hot semantics this replaced:
    # one_hot(oob) == 0 -> ce = lse, dlogits = p*g (no correct-class term).
    valid = (labels >= 0) & (labels < v)
    clamped = jnp.clip(labels, 0, v - 1)
    correct = jnp.take_along_axis(lf, clamped[..., None], axis=-1)[..., 0]
    return lse - jnp.where(valid, correct, 0.0), lse


def _sxe_int_fwd(logits, labels):
    ce, lse = _sxe_int_impl(logits, labels)
    return ce, (logits, labels, lse)


def _sxe_int_bwd(res, g):
    # d = (softmax - onehot) * g as ONE fused elementwise expression: the
    # iota==label compare fuses into the exp/mul loop, so no [n, v] one-hot
    # buffer AND no scatter. The earlier .at[].add scatter formulation
    # measured +11.5 ms/step on the s4096/b4 headline GPT (90.4 vs 78.9 ms,
    # probe 153 TF/s) — TPU scatter lowering is serial-ish; never scatter
    # what a broadcast-compare can express.
    logits, labels, lse = res
    v = logits.shape[-1]
    p = jnp.exp(logits.astype(jnp.float32) - lse[..., None])
    lab = labels[..., None]
    valid = (lab >= 0) & (lab < v)     # match the forward's where(valid, ...)
    classes = jax.lax.broadcasted_iota(jnp.int32, p.shape, p.ndim - 1)
    onehot = ((classes == lab) & valid).astype(jnp.float32)
    d = (p - onehot) * g[..., None].astype(jnp.float32)
    return d.astype(logits.dtype), None


softmax_cross_entropy_with_integer_labels.defvjp(_sxe_int_fwd, _sxe_int_bwd)


# ---------------------------------------------------------------------------
# Fused LM head + cross-entropy (chunked over the sequence): the [N, vocab]
# fp32 logits are NEVER materialized — at 32k+ vocab the logits tensor (and
# its backward) dominates a language model's activation memory.
# ---------------------------------------------------------------------------


def _auto_chunk(n_total: int, vocab: int) -> int:
    """Default chunk for ``fused_lm_head_loss`` (chunk=None): 512, by
    measurement.

    An r5 theory said larger chunks must win (the backward drags a
    [vocab, d] fp32 dtable accumulator through the chunk scan — read+write
    PER ITERATION — and re-streams the head table per chunk). The
    slope-timed sweep (exp_head_chunk.py, v5e, n=16k V=8k d=1024, isolated
    fwd+bwd) refuted it: 512 -> 4952us, 1024 -> 5027, 2048 -> 5119,
    4096 -> 5656, 8192 -> 5672, 16384 -> 5159. The chunk loop is
    matmul-bound and XLA overlaps the accumulator traffic with compute, so
    shrinking the iteration count buys nothing; larger chunks only add
    [chunk, vocab] buffer pressure. Kept as a hook so the policy has one
    place to change if a future shape measures differently.
    """
    del n_total, vocab
    return 512


def fused_lm_head_loss(x: jax.Array, table: jax.Array, labels: jax.Array,
                       *, chunk: int | None = None, valid=None,
                       table_layout: str = "vd",
                       bias: jax.Array | None = None) -> jax.Array:
    """mean CE of ``softmax(x @ head)`` against integer labels.

    ``x``: [..., d] final hidden states; ``table``: the LM head — either
    a tied embedding table [vocab, d] (``table_layout="vd"``, default) or
    an untied Linear head weight [d, vocab] (``table_layout="dv"``), fp32
    master; ``labels``: [...] int. ``valid``: optional [...] 0/1 weights
    (packed-sequence boundary masking) — the mean is over valid positions.
    Logits for each ``chunk`` of positions are computed, reduced to
    (lse, correct-logit), and discarded; the backward recomputes per-chunk
    softmax and accumulates dx and dtable. Peak memory is O(chunk * vocab)
    instead of O(N * vocab).

    Measured (v5e, GPT-4L d1024 v32k b8 s2048, same-process A/B): 0.82x
    step time (the backward recomputes the logits matmul) for -2.14 GiB
    temp memory — a time/memory trade for when activations bind.
    """
    assert table_layout in ("vd", "dv"), table_layout
    d = x.shape[-1]
    n_total = int(np.prod(x.shape[:-1]))
    if chunk is None:
        vocab = table.shape[0] if table_layout == "vd" else table.shape[1]
        chunk = _auto_chunk(n_total, vocab)
    xf = x.reshape(n_total, d)
    lf = labels.reshape(n_total)
    vf = (jnp.ones(n_total, jnp.float32) if valid is None
          else valid.reshape(n_total).astype(jnp.float32))
    if bias is not None:
        # Biased head (Phi-style): absorb the bias into the matmul by
        # augmenting — logits = [x, 1] @ [head; b]. The concatenates are
        # ordinary differentiable ops OUTSIDE the custom VJP, so autodiff
        # splits dhead_aug back into (dhead, dbias) exactly.
        assert table_layout == "dv", "bias implies an untied [d, vocab] head"
        xf = jnp.concatenate([xf, jnp.ones((n_total, 1), xf.dtype)], axis=1)
        table = jnp.concatenate(
            [table, bias[None, :].astype(table.dtype)], axis=0)
    if table_layout == "dv":
        # Normalize to [vocab, d] internally; the transpose is a layout
        # change XLA folds into the chunk matmuls' dimension numbers.
        return _fused_lm_loss_dv(xf, table, lf, vf, chunk)
    return _fused_lm_loss(xf, table, lf, vf, chunk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_lm_loss_dv(x, head, labels, valid, chunk):
    loss, _ = _fused_lm_fwd_impl(x, head.T, labels, valid, chunk)
    return loss


def _fused_lm_dv_fwd(x, head, labels, valid, chunk):
    loss, res = _fused_lm_fwd(x, head.T, labels, valid, chunk)
    return loss, res


def _fused_lm_dv_bwd(chunk, res, dy):
    dx, dtable, _, _ = _fused_lm_bwd(chunk, res, dy)
    return dx, dtable.T, None, None


_fused_lm_loss_dv.defvjp(_fused_lm_dv_fwd, _fused_lm_dv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_lm_loss(x, table, labels, valid, chunk):
    loss, _ = _fused_lm_fwd_impl(x, table, labels, valid, chunk)
    return loss


def _pad_rows(x, labels, valid, chunk):
    n = x.shape[0]
    n_p = round_up(n, chunk)
    if n_p != n:
        x = jnp.pad(x, ((0, n_p - n), (0, 0)))
        labels = jnp.pad(labels, (0, n_p - n))
        valid = jnp.pad(valid, (0, n_p - n))   # padded rows: weight 0
    return x, labels, valid, n_p


def _fused_lm_fwd_impl(x, table, labels, valid, chunk):
    xp, lp, vp, n_p = _pad_rows(x, labels, valid, chunk)
    # Matmul operands in x.dtype / fp32 MXU accumulation (r5): the previous
    # unconditional fp32-operand matmuls ran at the v5e's fp32-decomposed
    # rate even for bf16 models — the isolated head loss measured 9.6ms
    # where the bf16 matmul floor is ~4.3ms. Casting the head to the
    # HIDDEN-STATE dtype matches the unfused path's semantics exactly
    # (nn.Linear computes in module dtype: bf16 models get bf16 matmuls,
    # fp32 models stay exact); lse/softmax statistics stay fp32 on the
    # fp32-accumulated logits (house invariant).
    tb = table.astype(x.dtype)

    def body(acc, args):
        xc, lc, vc = args
        logits = jax.lax.dot_general(
            xc, tb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [chunk, vocab]
        lse = jax.nn.logsumexp(logits, axis=-1)
        correct = jnp.take_along_axis(logits, lc[:, None], axis=1)[:, 0]
        loss_sum, n_valid = acc
        return (loss_sum + jnp.sum(vc * (lse - correct)),
                n_valid + jnp.sum(vc)), None

    n_chunks = n_p // chunk
    reshape = lambda a: a.reshape(n_chunks, chunk, *a.shape[1:])
    (loss_sum, n_valid), _ = jax.lax.scan(
        body, (jnp.float32(0), jnp.float32(0)),
        (reshape(xp), reshape(lp), reshape(vp)))
    denom = jnp.maximum(n_valid, 1.0)
    return loss_sum / denom, denom


def _fused_lm_fwd(x, table, labels, valid, chunk):
    loss, denom = _fused_lm_fwd_impl(x, table, labels, valid, chunk)
    return loss, (x, table, labels, valid, denom)


def _fused_lm_bwd(chunk, res, dy):
    x, table, labels, valid, denom = res
    xp, lp, vp, n_p = _pad_rows(x, labels, valid, chunk)
    tb = table.astype(x.dtype)           # matmuls in the hidden dtype (r5)
    scale = dy / denom

    def body(dtable, args):
        xc, lc, vc = args
        logits = jax.lax.dot_general(
            xc, tb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1)
        # (p - onehot) via iota-compare — fuses into the softmax loop; the
        # earlier .at[].add scatter serializes on TPU (see _sxe_int_bwd's
        # measured +11.5 ms/step note).
        classes = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        dlogits = ((p - (classes == lc[:, None]).astype(jnp.float32))
                   * (vc * scale)[:, None])             # [chunk, vocab] f32
        dlc = dlogits.astype(x.dtype)
        dxc = jax.lax.dot_general(dlc, tb, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dtable = dtable + jax.lax.dot_general(
            dlc, xc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dtable, dxc

    n_chunks = n_p // chunk
    reshape = lambda a: a.reshape(n_chunks, chunk, *a.shape[1:])
    dtable, dx = jax.lax.scan(
        body, jnp.zeros(table.shape, jnp.float32),   # fp32 grad accumulator
        (reshape(xp), reshape(lp), reshape(vp)))
    dx = dx.reshape(n_p, -1)[:x.shape[0]]
    return dx.astype(x.dtype), dtable.astype(table.dtype), None, None


_fused_lm_loss.defvjp(_fused_lm_fwd, _fused_lm_bwd)


@jax.custom_vjp
def kl_divergence_from_logits(student_logits: jax.Array,
                              teacher_logits: jax.Array) -> jax.Array:
    """Per-example ``KL(softmax(teacher) || softmax(student))`` from logits.

    The knowledge-distillation objective (Hinton et al. 2015) in its
    numerically safe form: both distributions come from log-softmax, no
    explicit ``p log p`` on zero-probability entries. Returns
    ``logits.shape[:-1]``; reduce outside. Hand-written VJP (framework
    invariant): ``d/ds = softmax(s) - softmax(t)``,
    ``d/dt_j = p_j * ((log p_j - logsoftmax(s)_j) - KL)``.
    """
    return _kl_impl(student_logits, teacher_logits)[0]


def _kl_impl(s, t):
    ls = jax.nn.log_softmax(s, axis=-1)
    lt = jax.nn.log_softmax(t, axis=-1)
    p = jnp.exp(lt)
    kl = jnp.sum(p * (lt - ls), axis=-1)
    return kl, (ls, lt, p)


def _kl_fwd(s, t):
    kl, res = _kl_impl(s, t)
    return kl, (*res, kl)


def _kl_bwd(res, g):
    ls, lt, p, kl = res
    g = g[..., None]
    ds = (jnp.exp(ls) - p) * g
    dt = p * ((lt - ls) - kl[..., None]) * g
    return ds, dt


kl_divergence_from_logits.defvjp(_kl_fwd, _kl_bwd)
