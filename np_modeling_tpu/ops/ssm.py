"""Selective state-space scan (Mamba's core recurrence) as a parallel op.

The recurrence ``h_t = a_t * h_{t-1} + b_t`` (h_0 = 0, everything
elementwise over [batch, L, ...]) is the hot loop of selective SSMs
(Mamba's CUDA ``selective_scan_fn``). The TPU-native formulation is a
PARALLEL PREFIX: ``jax.lax.associative_scan`` over the time axis — the
first-order linear recurrence composes as ``(a2, b2) ∘ (a1, b1) =
(a2·a1, a2·b1 + b2)`` — which XLA lowers to a log-depth tree of fused
elementwise ops (no sequential loop, full VPU occupancy) instead of a
hand-written sequential kernel.

Hand-written VJP (repo invariant: no autodiffed backwards): the adjoint
of a linear recurrence is the SAME recurrence run in reverse time with
the coefficients shifted one step — ``λ_t = g_t + a_{t+1}·λ_{t+1}`` —
so the backward is one more associative scan (flip, shift, scan, flip)
plus two elementwise products: ``db_t = λ_t``, ``da_t = λ_t · h_{t-1}``.
Verified against ``jax.grad`` of an independent ``lax.scan`` oracle in
tests/test_ssm.py.

Reference lineage: the reference has no SSMs; this extends the ops tier
(SURVEY.md §2.1) the same way flash attention extended its attention
test-kernel (layers/attentions_test.py:158-265) — a first-class fused
op with a manual backward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a2 * a1, a2 * b1 + b2


def _scan(a, b):
    return jax.lax.associative_scan(_combine, (a, b), axis=1)[1]


@jax.custom_vjp
def selective_scan(a: jax.Array, b: jax.Array) -> jax.Array:
    """All states of ``h_t = a_t * h_{t-1} + b_t`` with ``h_0 = 0``.

    ``a``/``b``: [batch, L, ...] (elementwise; trailing dims are typically
    Mamba's [d_inner, d_state]). Returns h, same shape. fp32 recommended:
    the products telescope, so low precision compounds over L.
    """
    return _scan(a, b)


def _fwd(a, b):
    h = _scan(a, b)
    return h, (a, h)


def _bwd(res, g):
    a, h = res
    # λ_t = g_t + a_{t+1} λ_{t+1}: reverse-time recurrence; reuse the
    # forward scan on flipped arrays with the coefficient shifted left
    # (the first reverse step's coefficient is unused — padded with 1).
    a_next = jnp.concatenate([a[:, 1:], jnp.ones_like(a[:, :1])], axis=1)
    lam = jnp.flip(_scan(jnp.flip(a_next, axis=1), jnp.flip(g, axis=1)),
                   axis=1)
    h_prev = jnp.concatenate([jnp.zeros_like(h[:, :1]), h[:, :-1]], axis=1)
    return lam * h_prev, lam


selective_scan.defvjp(_fwd, _bwd)


def selective_scan_step(ssm_state, a_t, b_t):
    """One decode step: ``h_t = a_t * h + b_t`` ([batch, ...], no L axis)."""
    return a_t * ssm_state + b_t


# ---- SSD: the chunked "state-space dual" form (Mamba-2) -----------------


def _segsum_exp(a):
    """a [..., c] -> L [..., c, c] with ``L[i, j] = exp(sum_{k=j+1..i} a_k)``
    for i >= j (diag = 1) and 0 above the diagonal.

    The mask is applied BEFORE the exp (−inf, not a post-exp where): for
    i < j the cumsum difference is ≥ 0 and can overflow to +inf, and a
    where over an inf branch poisons the backward with NaNs.
    """
    cs = jnp.cumsum(a, axis=-1)
    diff = cs[..., :, None] - cs[..., None, :]
    tril = jnp.tril(jnp.ones((a.shape[-1], a.shape[-1]), bool))
    return jnp.exp(jnp.where(tril, diff, -jnp.inf))


def ssd(x, dt, A, B, C, chunk_size: int = 256, return_final_state=False):
    """Mamba-2's multi-head selective SSM in the chunked SSD form.

    Per head h with per-head scalar decay ``A[h] < 0``::

        s_t = exp(dt_t A) * s_{t-1} + dt_t * B_t x_t^T      (state [p, n])
        y_t = s_t C_t

    Args: ``x`` [b, L, h, p], ``dt`` [b, L, h] (post-softplus, ≥ 0),
    ``A`` [h], ``B``/``C`` [b, L, g, n] with g dividing h (GQA-style
    group broadcast). Returns fp32 ``y`` [b, L, h, p] (and the final
    state [b, h, p, n] when asked — the prefill→decode handoff).

    TPU-first: instead of a sequential per-token kernel (the CUDA
    ``mamba_chunk_scan_combined``), the sequence is cut into chunks of
    ``chunk_size``; within a chunk the SSM is an attention-like pair of
    MXU matmuls masked by the decay matrix (``C B^T ⊙ L``), between
    chunks it is a length-L/chunk first-order recurrence that reuses
    :func:`selective_scan` (log-depth prefix, hand-written VJP). All the
    FLOPs land in einsums; the only elementwise-heavy piece is the
    [c, c] decay mask. Statistics (dt, cumsums, exp) are fp32
    (CLAUDE.md invariant); the backward composes the einsum transposes
    with the scan's manual reverse-time VJP.

    Reference lineage: SURVEY.md §2 ops tier; the reference has no SSMs
    (see ops/ssm.py module docstring).
    """
    b, L, h, p = x.shape
    g, n = B.shape[2], B.shape[3]
    c = chunk_size
    x = x.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    reps = h // g
    if reps > 1:
        B = jnp.repeat(B, reps, axis=2)
        C = jnp.repeat(C, reps, axis=2)

    xd = x * dt[..., None]                      # dt-discretized input
    a = dt * A.astype(jnp.float32)              # [b, L, h], ≤ 0
    pad = (-L) % c
    if pad:
        # Zero-padding is exact: a=0 -> decay 1, xd=0 -> no contribution,
        # so the final state is untouched and padded y rows are dropped.
        zpad = lambda t: jnp.pad(t, [(0, 0), (0, pad)] +
                                 [(0, 0)] * (t.ndim - 2))
        xd, a, B, C = map(zpad, (xd, a, B, C))
    nc = (L + pad) // c
    xd = xd.reshape(b, nc, c, h, p)
    B = B.reshape(b, nc, c, h, n)
    C = C.reshape(b, nc, c, h, n)
    a = a.reshape(b, nc, c, h).transpose(0, 3, 1, 2)        # [b, h, nc, c]
    a_cs = jnp.cumsum(a, axis=-1)

    # Intra-chunk (diagonal blocks): decay-masked attention on the MXU.
    L_mat = _segsum_exp(a)                                  # [b,h,nc,c,c]
    G = jnp.einsum("bclhn,bcshn->bhcls", C, B)
    y = jnp.einsum("bhcls,bcshp->bclhp", G * L_mat, xd)

    # Per-chunk input->state contribution, decayed to the chunk end.
    decay_states = jnp.exp(a_cs[..., -1:] - a_cs)           # [b,h,nc,c]
    states = jnp.einsum("bcshn,bhcs,bcshp->bchpn", B, decay_states, xd)

    # Inter-chunk recurrence over nc chunk states (manual-VJP scan).
    chunk_decay = jnp.exp(a_cs[..., -1]).transpose(0, 2, 1)  # [b, nc, h]
    h_incl = selective_scan(chunk_decay[..., None, None], states)
    states_prev = jnp.concatenate(
        [jnp.zeros_like(h_incl[:, :1]), h_incl[:, :-1]], axis=1)

    # State -> output for every position (off-diagonal blocks).
    y = y + jnp.einsum("bclhn,bchpn,bhcl->bclhp", C, states_prev,
                       jnp.exp(a_cs))
    y = y.reshape(b, nc * c, h, p)[:, :L]
    if return_final_state:
        return y, h_incl[:, -1]                              # [b, h, p, n]
    return y


def ssd_step(ssm_state, x_t, dt_t, A, B_t, C_t):
    """One Mamba-2 decode step. ``ssm_state`` [b, h, p, n]; ``x_t``
    [b, h, p]; ``dt_t`` [b, h]; ``A`` [h]; ``B_t``/``C_t`` [b, g, n].
    Returns (y_t [b, h, p] fp32, new state)."""
    h_heads, g = ssm_state.shape[1], B_t.shape[1]
    if g != h_heads:
        B_t = jnp.repeat(B_t, h_heads // g, axis=1)
        C_t = jnp.repeat(C_t, h_heads // g, axis=1)
    x_t = x_t.astype(jnp.float32)
    dt_t = dt_t.astype(jnp.float32)
    da = jnp.exp(dt_t * A.astype(jnp.float32))               # [b, h]
    db_x = (dt_t[..., None] * x_t)[..., None] * \
        B_t.astype(jnp.float32)[:, :, None, :]               # [b, h, p, n]
    new = da[..., None, None] * ssm_state + db_x
    y = jnp.einsum("bhpn,bhn->bhp", new, C_t.astype(jnp.float32))
    return y, new
