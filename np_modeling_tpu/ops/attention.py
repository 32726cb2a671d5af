"""Flash attention: Pallas TPU kernels with a hand-written VJP.

This promotes the reference's *test-only* blockwise online-softmax attention
(/root/reference/layers/attentions_test.py:158-265: 32x32 tiles, running max
``m_i``, running denominator ``l_i``, accumulator rescale) to a first-class
MXU/VMEM-tiled Pallas kernel, and adds what the reference lacks:

- a manual backward (FlashAttention-2 style recompute with saved LSE; the
  reference's non-flash backward materializes O(S^3) softmax Jacobians,
  activations.py:42-45, and raises NotImplementedError for masked backward,
  attentions.py:152-153 — both closed here),
- causal masking with whole-tile skipping,
- GQA (grouped-query attention; reference test-only at
  attentions_test.py:267-358) via head-index folding in the BlockSpecs,
- IN-KERNEL boolean masks (reference attentions.py:106-107 semantics,
  True = attend) and additive score bias (ALiBi / T5-relative), both
  streamed as [bq, bkv] tiles — padded BERT batches and biased attention
  run the flash kernels, not an O(sq*skv)-materializing fallback. Bias is
  differentiable: the dq kernel also emits the per-tile dbias.

Layouts: q [b, hq, sq, d]; k/v [b, hkv, skv, d]; hq % hkv == 0.
Softmax statistics are fp32; LSE residuals are stored lane-broadcast as
[b, h, sq, 128] (the TPU T(8,128) tiling's natural shape).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from np_modeling_tpu.ops import dispatch
from np_modeling_tpu.ops.matmul import round_up

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
NUM_LANES = 128
NUM_SUBLANES = 8

# Skip structural (causal/window/pad) masking on interior tiles via
# lax.cond. Slope-timed r5 re-measure under the fixed harness (v5e,
# b4 h8 s4096 d128 causal fwd, 512x512 blocks, exp_fwd_sweep.py): cond is
# 2220.0us vs 1325.9-1399.3us baseline — decisively SLOWER (the r4 verdict
# stands with clean numbers). Stays OFF.
STRUCT_MASK_COND = False

# Block sizes are a per-pass MEASURED policy (block_q/block_kv=None picks
# them). Slope-timed r5 sweeps at the headline shape (b4 h8 s4096 d128
# causal bf16, v5e, probes 169-176 TF/s, exp_fwd_sweep.py /
# exp_bwd_sweep.py):
#   fwd:  512x512 wins — 1399.3us (recheck 1325.9) vs 1024x1024 1442.4,
#         1024x512 1449.2, 512x1024 1505.3, 2048x512 1591.8,
#         2048x1024 1622.3, 1024x2048 1673.7, 512x2048 1676.0.
#   bwd:  1024x1024 wins — 4614.8us fwd+bwd vs 512x1024 4700.9,
#         1024x512 4833.8, 512x512 5246.5; 2048-wide blocks are
#         scoped-VMEM infeasible for the fused dkvq tile.
# The r4 note claiming 1024x1024 won the FORWARD too predates the harness
# fix (RTT-biased). An explicit block_q/block_kv applies to both passes.
FWD_BLOCK_Q, FWD_BLOCK_KV = 512, 512
BWD_BLOCK_Q, BWD_BLOCK_KV = 1024, 1024

# Compute softmax via exp2 with log2(e) folded into the q pre-scale — the
# hypothesis being that Mosaic lowers exp(x) as exp2(x * log2e), a VPU
# multiply pass over every [bq, bkv] score tile, three times per element
# per layer (fwd p, dq-kernel p, dkv-kernel p), which the fold would
# delete. MEASURED (same process, probe 122 TF/s, b4 h8 s4096 d128 causal
# fwd+bwd): exp2 is 0.961x (8590 vs 8255 us) — i.e. SLOWER, so exp does
# not pay a separate multiply pass on this toolchain (and jnp.exp2 may
# itself lower through exp). r5 RE-MEASURE under the fixed slope harness
# (fwd only, 512x512 blocks, exp_fwd_sweep.py): 1427.7us vs
# 1325.9-1399.3us baseline — still slower. Kept as a tested flag;
# default OFF. Gradient
# bookkeeping when ON: ds stays the true d/ds_e, dq's outside `* scale` is
# unchanged, dk picks up one `* ln2` on its small group-summed output, and
# dbias is unchanged (bias is pre-scaled by log2e on the way in).
EXP2_SCORES = False
_LOG2E = float(np.log2(np.e))
_LN2 = float(np.log(2.0))

# Lane width of the LSE / di residual arrays in HBM. The kernels only read
# lane 0, so narrower residuals LOOK like a 16x HBM-traffic saving — but a
# same-process A/B (probe 150 TF/s, b4 h8 s4096 d128 causal fwd+bwd) measured
# lanes=8 at 0.994x of lanes=128 (7789 vs 7741 us): XLA tiles the minor dim
# to 128 lanes in HBM regardless, so nothing is actually saved. Kept at the
# natural T(8,128) width.
RESID_LANES = NUM_LANES

# Process TWO kv halves per forward grid step with both score matmuls
# issued before the softmax VPU work (independent MXU/VPU chains for the
# Mosaic scheduler to overlap). MEASURED (b4 h8 s4096 d128 bf16, probe
# 129.8, same process): full attention 0.99x (noise — Mosaic does NOT
# exploit the cross-half overlap), causal 1.08x SLOWER (the diagonal
# 2*bkv tiles compute their out-of-band half as all-masked work). The
# forward stays serialized on its VPU softmax passes; kept as a tested
# flag (interpret-mode equality vs the single-block kernel), default OFF.
FWD_DUAL_KV = False

# Compute the forward's softmax numerator p in bf16 (sub + exp on a bf16
# tile instead of fp32). p already feeds the p@v matmul as bf16; the only
# extra rounding is in l's summands (sum accumulates fp32; relative error
# ~2^-8/sqrt(bkv) — noise next to the bf16 output cast). MEASURED (same
# process, b4 h8 s4096 d128 causal, probe 125.6): 1.0097x — a WASH;
# Mosaic does not pack bf16 transcendentals, so halving the tile bytes
# saves nothing. r5 RE-MEASURE under the fixed slope harness (fwd,
# 512x512 blocks, exp_fwd_sweep.py): 1439.6us vs 1325.9-1399.3us
# baseline — slower, verdict unchanged. Kept as a tested flag;
# default OFF.
FWD_BF16_EXP = False


# ---------------------------------------------------------------------------
# Pure-jnp oracle (no custom gradient) — the trusted baseline tests diff against.
# ---------------------------------------------------------------------------


def attention_reference(q, k, v, mask=None, causal=False, scale=None,
                        softcap=None):
    """Plain attention in jnp; autodiff-able. Used as the test oracle."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    g = q.shape[1] // k.shape[1]
    kk = jnp.repeat(k, g, axis=1) if g > 1 else k
    vv = jnp.repeat(v, g, axis=1) if g > 1 else v
    s = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                   preferred_element_type=jnp.float32) * scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    s = _apply_masks(s, mask, causal)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vv,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _apply_masks(s, mask, causal, window=None):
    if causal:
        sq, skv = s.shape[-2], s.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        keep = col <= row
        if window is not None:
            keep = keep & (col > row - window)
        s = jnp.where(keep, s, DEFAULT_MASK_VALUE)
    if mask is not None:
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    return s


# ---------------------------------------------------------------------------
# The op: custom_vjp wrapping pallas kernels (TPU) / manual jnp math (fallback)
# ---------------------------------------------------------------------------


def flash_attention(q, k, v, mask=None, bias=None, segment_ids=None, *,
                    causal=False, window=None, scale=None, block_q=None,
                    block_kv=None, softcap=None, sinks=None):
    """Scaled dot-product attention with a hand-written VJP.

    ``mask``: optional boolean [b|1, h|1, sq, skv], True = attend (reference
    convention, attentions.py:106-107); streamed through the Pallas kernels
    as int8 tiles. ``bias``: optional additive score bias (ALiBi /
    T5-relative style) [b|1, h|1, sq, skv]; differentiable — the backward
    kernel emits dbias (cost: one [b, hq, sq, skv] fp32 store; prefer
    segment_ids/window/causal for structural masking, which is free).
    ``segment_ids``: optional (q_seg [b, sq], kv_seg [b, skv]) int arrays
    for packed-sequence masking — handled INSIDE the Pallas kernels
    (lane/sublane-broadcast tiles), composable with causal.
    ``window``: sliding-window (local) attention width W — position i
    attends to [i-W+1, i]; requires causal=True; whole KV tiles outside the
    band are skipped in the kernels. Masks/biases with collapsed sq/skv
    dims (not materialized to [.., sq, skv]) run on the manual jnp path.
    ``softcap``: Gemma-2-style logit soft-capping — scaled scores pass
    through ``cap * tanh(s / cap)`` BEFORE bias/mask/softmax, inside the
    kernels (one extra VPU pass per score tile; the backward chains the
    ``1 - tanh^2`` factor through the same recompute).
    ``sinks``: per-head learnable attention-sink logits [hq] (gpt-oss) —
    a virtual no-value key joining each row's softmax. Mathematically
    ``o = o_std * sigmoid(lse_std - sink)``, so it runs as a POST-KERNEL
    rescale; the standard FA2 backward is already exact given the
    sink-inclusive ``lse_tot = logaddexp(lse_std, sink)`` (ds keeps the
    p*(dp - di) form because the sink row has no value), plus
    ``dsink = -sum_q exp(sink - lse_tot) * di``. Differentiable.
    """
    d = q.shape[-1]
    scale = float(scale if scale is not None else 1.0 / math.sqrt(d))
    assert q.shape[1] % k.shape[1] == 0, "q heads must be a multiple of kv heads"
    assert k.shape[:2] == v.shape[:2] and k.shape[2] == v.shape[2]
    for name, x in (("mask", mask), ("bias", bias)):
        if x is not None:
            assert x.ndim == 4, f"{name} must be [b|1, h|1, sq, skv]"
            assert x.shape[0] in (1, q.shape[0]), name
            assert x.shape[1] in (1, q.shape[1]), name
    assert window is None or (causal and window >= 1), (
        "window requires causal=True and a positive width")
    if softcap is not None:
        softcap = float(softcap)
        assert softcap > 0, "softcap must be a positive cap value"
        assert not EXP2_SCORES, (
            "softcap folds tanh around the scaled scores; the EXP2_SCORES "
            "log2e-in-q folding would change its argument — disable one")
    if segment_ids is not None and not isinstance(segment_ids, (tuple, list)):
        segment_ids = (segment_ids, segment_ids)   # self-attention shorthand
    q_seg, kv_seg = segment_ids if segment_ids is not None else (None, None)
    if q_seg is not None:
        assert q_seg.shape == (q.shape[0], q.shape[2])
        assert kv_seg.shape == (k.shape[0], k.shape[2])
    if sinks is not None:
        assert sinks.shape == (q.shape[1],), sinks.shape
        return _attn_sinks(q, k, v, sinks, mask, bias, q_seg, kv_seg,
                           causal, window, scale, block_q, block_kv,
                           softcap)
    return _attn(q, k, v, mask, bias, q_seg, kv_seg, causal, window, scale,
                 block_q, block_kv, softcap)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _attn(q, k, v, mask, bias, q_seg, kv_seg, causal, window, scale, block_q,
          block_kv, softcap):
    # Primal (not under grad): skip the LSE residual entirely — the kernel
    # neither computes nor stores it (measured 1.028x fwd at the headline
    # shape; jax-FA's save_residuals=False does the same).
    o, _ = _attn_fwd_impl(q, k, v, mask, bias, q_seg, kv_seg, causal, window,
                          scale, block_q, block_kv, softcap, need_lse=False)
    return o


def _tileable(x, q, k):
    """mask/bias is kernel-tileable iff its sq/skv dims are materialized."""
    return x.shape[2:] == (q.shape[2], k.shape[2])


_warned_untileable = False


def _warn_untileable(name, x, q, k):
    """Warn ONCE per process when a broadcast-shaped mask/bias silently
    forces the score-materializing jnp path (VERDICT r2 weak #9): callers
    usually meant to pass a materialized [.., sq, skv] array."""
    global _warned_untileable
    if _warned_untileable:
        return
    _warned_untileable = True
    import warnings
    warnings.warn(
        f"flash_attention: {name} has collapsed score dims "
        f"{x.shape[2:]} != (sq={q.shape[2]}, skv={k.shape[2]}); falling "
        "back to the score-materializing jnp path. Broadcast the "
        f"{name} to full [.., sq, skv] shape to keep the Pallas kernel.",
        stacklevel=4)


def _use_flash_kernel(q, k, mask, bias) -> bool:
    """Measured dispatch policy (TPU v5e, fwd+bwd): the Pallas kernel beats
    XLA's fused attention from ~2k kv sequence (1.3-1.7x), or ~1k when
    head_dim is already lane-aligned (128); below that XLA wins because the
    kernel pads head_dim 64->128. In-kernel int8-streamed masks keep the
    advantage (b2 h8 d128: 1.24x/1.14x fwd / fwd+bwd at s=2048, 2.21x/1.56x
    at s=4096 vs the score-materializing jnp path) and cost ~nothing over
    the unmasked kernel. Short-query shapes (sq < 128, e.g. dense KV-cache
    decode) stay on XLA: the kernel would pad q 128x.
    force_pallas() overrides (tests)."""
    if mask is not None and not _tileable(mask, q, k):
        _warn_untileable("mask", mask, q, k)
        return False
    if bias is not None and not _tileable(bias, q, k):
        _warn_untileable("bias", bias, q, k)
        return False
    f = dispatch.forced()
    if f is not None:
        return f
    sq, skv, d = q.shape[2], k.shape[2], q.shape[3]
    return (dispatch.on_tpu() and sq >= 128
            and (skv >= 2048 or (skv >= 1024 and d >= 128)))


def _segment_mask(q_seg, kv_seg):
    return (q_seg[:, None, :, None] == kv_seg[:, None, None, :])


def _merge_seg_into_mask(mask, q_seg, kv_seg):
    if q_seg is None:
        return mask
    smask = _segment_mask(q_seg, kv_seg)
    return smask if mask is None else (mask & smask)


def _attn_fwd_impl(q, k, v, mask, bias, q_seg, kv_seg, causal, window,
                   scale, block_q, block_kv, softcap, need_lse=True):
    if _use_flash_kernel(q, k, mask, bias):
        return _flash_fwd_pallas(q, k, v, mask, bias, q_seg, kv_seg, causal,
                                 window, scale, block_q, block_kv, softcap,
                                 need_lse=need_lse)
    mask = _merge_seg_into_mask(mask, q_seg, kv_seg)
    return _attn_fwd_jnp(q, k, v, mask, bias, causal, window, scale, softcap)


def _attn_fwd(q, k, v, mask, bias, q_seg, kv_seg, causal, window, scale,
              block_q, block_kv, softcap):
    o, lse = _attn_fwd_impl(q, k, v, mask, bias, q_seg, kv_seg, causal,
                            window, scale, block_q, block_kv, softcap)
    return o, (q, k, v, o, lse, mask, bias, q_seg, kv_seg)


def _attn_bwd(causal, window, scale, block_q, block_kv, softcap, res, do):
    q, k, v, o, lse, mask, bias, q_seg, kv_seg = res
    if _use_flash_kernel(q, k, mask, bias):
        dq, dk, dv, dbias = _flash_bwd_pallas(q, k, v, o, lse, do, mask,
                                              bias, q_seg, kv_seg, causal,
                                              window, scale, block_q,
                                              block_kv, softcap)
    else:
        mask = _merge_seg_into_mask(mask, q_seg, kv_seg)
        dq, dk, dv, dbias = _attn_bwd_jnp(q, k, v, o, lse, do, mask, bias,
                                          causal, window, scale, softcap)
    return dq, dk, dv, None, dbias, None, None


_attn.defvjp(_attn_fwd, _attn_bwd)


# ---- attention sinks (gpt-oss): a virtual no-value key per head ----------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _attn_sinks(q, k, v, sinks, mask, bias, q_seg, kv_seg, causal, window,
                scale, block_q, block_kv, softcap):
    o, _ = _attn_sinks_fwd(q, k, v, sinks, mask, bias, q_seg, kv_seg,
                           causal, window, scale, block_q, block_kv,
                           softcap)
    return o


def _attn_sinks_fwd(q, k, v, sinks, mask, bias, q_seg, kv_seg, causal,
                    window, scale, block_q, block_kv, softcap):
    o_std, lse = _attn_fwd_impl(q, k, v, mask, bias, q_seg, kv_seg, causal,
                                window, scale, block_q, block_kv, softcap)
    sink3 = sinks.astype(jnp.float32)[None, :, None]      # [1, h, 1]
    lse_tot = jnp.logaddexp(lse, sink3)
    o = (o_std.astype(jnp.float32)
         * jnp.exp(lse - lse_tot)[..., None]).astype(q.dtype)
    # Residuals carry the SINK-INCLUSIVE o and lse: the standard FA2
    # backward is then exact for dq/dk/dv/dbias (the sink's value is zero,
    # so ds = p*(dp - di) is unchanged with p = exp(s - lse_tot) and
    # di = rowsum(do * o)).
    return o, (q, k, v, o, lse_tot, mask, bias, q_seg, kv_seg, sinks)


def _attn_sinks_bwd(causal, window, scale, block_q, block_kv, softcap, res,
                    do):
    q, k, v, o, lse_tot, mask, bias, q_seg, kv_seg, sinks = res
    if _use_flash_kernel(q, k, mask, bias):
        dq, dk, dv, dbias = _flash_bwd_pallas(q, k, v, o, lse_tot, do, mask,
                                              bias, q_seg, kv_seg, causal,
                                              window, scale, block_q,
                                              block_kv, softcap)
    else:
        mask_m = _merge_seg_into_mask(mask, q_seg, kv_seg)
        dq, dk, dv, dbias = _attn_bwd_jnp(q, k, v, o, lse_tot, do, mask_m,
                                          bias, causal, window, scale,
                                          softcap)
    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    p_sink = jnp.exp(sinks.astype(jnp.float32)[None, :, None] - lse_tot)
    dsinks = (-jnp.sum(p_sink * di, axis=(0, 2))).astype(sinks.dtype)
    return dq, dk, dv, dsinks, None, dbias, None, None


_attn_sinks.defvjp(_attn_sinks_fwd, _attn_sinks_bwd)


def _unbroadcast_bias(dbias, bias):
    """Sum dbias over the dims where bias was broadcast ([b|1, h|1, ..])."""
    for ax in range(4):
        if bias.shape[ax] == 1 and dbias.shape[ax] != 1:
            dbias = jnp.sum(dbias, axis=ax, keepdims=True)
    return dbias.astype(bias.dtype)


# ---------------------------------------------------------------------------
# Manual jnp path (CPU fallback; also handles non-tileable masks/biases)
# ---------------------------------------------------------------------------


def _attn_fwd_jnp(q, k, v, mask, bias, causal, window, scale, softcap=None):
    g = q.shape[1] // k.shape[1]
    kk = jnp.repeat(k, g, axis=1) if g > 1 else k
    vv = jnp.repeat(v, g, axis=1) if g > 1 else v
    s = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                   preferred_element_type=jnp.float32) * scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    if bias is not None:
        s = s + bias
    s = _apply_masks(s, mask, causal, window)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vv,
                   preferred_element_type=jnp.float32) / l
    lse = jnp.squeeze(m, -1) + jnp.log(jnp.squeeze(l, -1))
    return o.astype(q.dtype), lse


def _attn_bwd_jnp(q, k, v, o, lse, do, mask, bias, causal, window, scale,
                  softcap=None):
    """FlashAttention-2-style manual gradients (recompute p from saved LSE)."""
    g = q.shape[1] // k.shape[1]
    kk = jnp.repeat(k, g, axis=1) if g > 1 else k
    vv = jnp.repeat(v, g, axis=1) if g > 1 else v
    s = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                   preferred_element_type=jnp.float32) * scale
    cap_grad = None
    if softcap is not None:
        t = jnp.tanh(s / softcap)
        cap_grad = 1.0 - t * t         # d(cap*tanh(s/cap))/ds
        s = softcap * t
    if bias is not None:
        s = s + bias
    s = _apply_masks(s, mask, causal, window)
    p = jnp.exp(s - lse[..., None])
    do32 = do.astype(jnp.float32)
    dv_full = jnp.einsum("bhqk,bhqd->bhkd", p, do32,
                         preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do32, vv.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    di = jnp.sum(do32 * o.astype(jnp.float32), axis=-1, keepdims=True)
    ds_raw = p * (dp - di)             # grad wrt the post-bias scores
    ds = ds_raw if cap_grad is None else ds_raw * cap_grad
    ds = ds * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kk.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    dk_full = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    dk, dv = _group_sum(dk_full, g), _group_sum(dv_full, g)
    dbias = _unbroadcast_bias(ds_raw, bias) if bias is not None else None
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias)


def _group_sum(x_full, g):
    """Sum per-q-head kv grads over each GQA group: [b,hq,..] -> [b,hkv,..]."""
    if g == 1:
        return x_full
    b, hq = x_full.shape[:2]
    return x_full.reshape(b, hq // g, g, *x_full.shape[2:]).sum(axis=2)


# ---------------------------------------------------------------------------
# Pallas kernels — shared tile helpers
# ---------------------------------------------------------------------------


def _tile_mask(s, q_idx, kv_idx, causal, window, kv_len, block_q, block_kv,
               n_kv, seg, mask_ref):
    """Apply causal / kv-padding / segment / user masks to a [bq, bkv] score
    tile.

    With STRUCT_MASK_COND=True the structural component runs under a
    lax.cond keyed on the tile indices, so INTERIOR tiles (fully inside the
    causal band, away from the kv-pad edge) skip its ~5 VPU passes; with
    False it applies unconditionally. A/B these in ONE process with
    bench_probe.ab — the chip's throughput drifts across runs.

    ``seg``: None or (qseg_ref, kvseg_ref) with tiles [1, bq, 128] and
    [1, 8, bkv] (lane/sublane-broadcast segment ids). ``mask_ref``: None or
    an int8 [1, 1, bq, bkv] tile (nonzero = attend)."""
    kv_padded = n_kv * block_kv != kv_len
    if causal or kv_padded or window is not None:
        def apply_struct(s):
            shape = (block_q, block_kv)
            col = (jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                   + kv_idx * block_kv)
            mask = None
            if kv_padded:
                mask = col < kv_len
            if causal:
                row = (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                       + q_idx * block_q)
                cmask = col <= row
                if window is not None:
                    cmask = cmask & (col > row - window)
                mask = cmask if mask is None else (mask & cmask)
            return jnp.where(mask, s, DEFAULT_MASK_VALUE)

        if STRUCT_MASK_COND:
            parts = []
            if kv_padded:
                parts.append(kv_idx == n_kv - 1)
            if causal:
                parts.append((kv_idx + 1) * block_kv - 1 > q_idx * block_q)
                if window is not None:
                    parts.append(kv_idx * block_kv
                                 <= (q_idx + 1) * block_q - 1 - window)
            needs = functools.reduce(jnp.logical_or, parts)
            s = jax.lax.cond(needs, apply_struct, lambda s: s, s)
        else:
            s = apply_struct(s)
    mask = None
    if seg is not None:
        qseg_ref, kvseg_ref = seg
        qseg = qseg_ref[0][:, 0:1]      # [bq, 1]
        kvseg = kvseg_ref[0][0:1, :]    # [1, bkv]
        smask = qseg == kvseg
        mask = smask
    if mask_ref is not None:
        user = mask_ref[0, 0] != 0
        mask = user if mask is None else (mask & user)
    if mask is not None:
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    return s


def _lanes(x, width):
    """Tile a lane-replicated [rows, 128] statistic to [rows, width].

    Subtracting/multiplying a [:, 0:1] lane-0 broadcast against a [rows,
    width] tile makes Mosaic emit a cross-lane broadcast inside the VPU
    pass — slope-measured 1.26x SLOWER on the fwd exp pass at the headline
    shape (exp_fwd_opt.py: lane0 1485us vs tiled 1183us, probe 174). The
    stats are lane-replicated [rows, 128], so a jnp.tile is layout-aligned
    and free. Narrow tiles (width < 128, interpret-mode test shapes) slice
    instead; a non-multiple width falls back to the lane-0 broadcast."""
    cur = x.shape[1]
    if width == cur:
        return x
    if width < cur:
        return x[:, :width]
    if width % cur == 0:
        return jnp.tile(x, (1, width // cur))
    return x[:, 0:1]


def _make_wrapper(tile, n_in, has_seg, has_mask, has_bias):
    """Adapter from pallas's positional refs to a tile fn taking optional
    (seg, mask_ref, bias_ref) slots. Ref order: n_in main inputs, then
    [qseg, kvseg], [mask], [bias] as enabled, then outputs + scratch."""
    def kernel(*refs):
        i = n_in
        seg = mask_ref = bias_ref = None
        if has_seg:
            seg = (refs[i], refs[i + 1])
            i += 2
        if has_mask:
            mask_ref = refs[i]
            i += 1
        if has_bias:
            bias_ref = refs[i]
            i += 1
        tile(*refs[:n_in], seg, mask_ref, bias_ref, *refs[i:])
    return kernel


def _should_run(q_idx, kv_idx, causal, window, block_q, block_kv):
    if not causal:
        return True
    ok = (q_idx + 1) * block_q - 1 >= kv_idx * block_kv
    if window is not None:
        ok = jnp.logical_and(
            ok, (kv_idx + 1) * block_kv - 1 > q_idx * block_q - window)
    return ok


def _band_ok(iq, ik, causal, window, bq, bkv):
    """Traced predicate: does (q tile iq, kv tile ik) intersect the causal
    (and window) band? Gates the pl.when compute skips."""
    if not causal:
        return None
    ok = (iq + 1) * bq - 1 >= ik * bkv
    if window is not None:
        ok = jnp.logical_and(ok, (ik + 1) * bkv - 1 > iq * bq - window)
    return ok


def _clamp_kv(iq, ik, causal, window, bq, bkv):
    """Remap a (possibly skipped) kv tile index to the NEAREST running tile
    of q-row iq — identity for in-band tiles. Skipped tiles land on an
    adjacent running block so consecutive grid steps keep the same index
    and the block DMA is elided. MEASURED vs the legacy remap-to-block-0:
    a wash (0.9997x fwd / 0.998x fwd+bwd, probe 155 — Mosaic's prefetch
    pipelining already hid the block-0 refetches); kept because it is
    strictly never a new fetch, also covers the dkv kernels' lse/di
    streams, and needs no band predicate."""
    if not causal:
        return ik
    last_ok = ((iq + 1) * bq - 1) // bkv
    ik = jnp.minimum(ik, last_ok)
    if window is not None:
        first_ok = jnp.maximum(0, (iq * bq - window + 1) // bkv)
        ik = jnp.maximum(ik, first_ok)
    return ik


def _clamp_q(iq, ik, causal, window, bq, bkv):
    """Dual of :func:`_clamp_kv` for kv-major grids (dkv/fused backward):
    remap a skipped q tile index to the nearest running tile of kv-column
    ik. Skips there happen BEFORE the band (iq < first running row), so
    clamping up prefetches exactly the block the first running step needs."""
    if not causal:
        return iq
    iq = jnp.maximum(iq, (ik * bkv) // bq)
    if window is not None:
        last_ok = ((ik + 1) * bkv + window - 2) // bq
        iq = jnp.minimum(iq, last_ok)
    return iq


def _pad4(x, s_to, d_to, fill=0):
    ps, pd = s_to - x.shape[2], d_to - x.shape[3]
    if ps or pd:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ps), (0, pd)),
                    constant_values=fill)
    return x


def _seg_arrays(q_seg, kv_seg, sq_p, skv_p):
    """Broadcast segment ids to kernel-tileable layouts.

    q: [b, sq_p, NUM_LANES] (ids down sublanes); kv: [b, NUM_SUBLANES, skv_p]
    (ids along lanes). Padded q rows get -1 and kv cols -2 so padding never
    matches anything.
    """
    b, sq = q_seg.shape
    skv = kv_seg.shape[1]
    qb = jnp.pad(q_seg.astype(jnp.int32), ((0, 0), (0, sq_p - sq)),
                 constant_values=-1)
    kvb = jnp.pad(kv_seg.astype(jnp.int32), ((0, 0), (0, skv_p - skv)),
                  constant_values=-2)
    qb = jnp.broadcast_to(qb[:, :, None], (b, sq_p, NUM_LANES))
    kvb = jnp.broadcast_to(kvb[:, None, :], (b, NUM_SUBLANES, skv_p))
    return qb, kvb


def _seg_specs(bq, bkv, order):
    """BlockSpecs for (q_seg, kv_seg); ``order``: 'qkv' = grid (b,h,iq,ikv),
    'kvq' = grid (b,h,ikv,iq)."""
    if order == "qkv":
        qmap = lambda ib, ih, iq, ik: (ib, iq, 0)
        kvmap = lambda ib, ih, iq, ik: (ib, 0, ik)
    else:
        qmap = lambda ib, ih, ik, iq: (ib, iq, 0)
        kvmap = lambda ib, ih, ik, iq: (ib, 0, ik)
    return (pl.BlockSpec((1, bq, NUM_LANES), qmap),
            pl.BlockSpec((1, NUM_SUBLANES, bkv), kvmap))


def _mb_spec(mb, mh, bq, bkv, order, causal, window):
    """BlockSpec for a [mb, mh, sq_p, skv_p] mask/bias array (mb/mh may be
    1 = broadcast). Skipped band tiles remap the fetch so no new DMA
    is issued for them."""
    if order == "qkv":
        def imap(ib, ih, iq, ik):
            ik = _clamp_kv(iq, ik, causal, window, bq, bkv)
            return (ib if mb > 1 else 0, ih if mh > 1 else 0, iq, ik)
    else:
        def imap(ib, ih, ik, iq):
            iq = _clamp_q(iq, ik, causal, window, bq, bkv)
            return (ib if mb > 1 else 0, ih if mh > 1 else 0, iq, ik)
    return pl.BlockSpec((1, 1, bq, bkv), imap)


def _mb_inputs(mask, bias, sq_p, skv_p, bq, bkv, order, causal, window):
    """(inputs, specs) for the optional mask (int8) and bias (fp32) operands."""
    inputs, specs = [], []
    if mask is not None:
        m8 = _pad4(mask.astype(jnp.int8), sq_p, skv_p, fill=0)
        inputs.append(m8)
        specs.append(_mb_spec(mask.shape[0], mask.shape[1], bq, bkv, order,
                              causal, window))
    if bias is not None:
        b32 = _pad4(bias.astype(jnp.float32), sq_p, skv_p, fill=0)
        inputs.append(b32)
        specs.append(_mb_spec(bias.shape[0], bias.shape[1], bq, bkv, order,
                              causal, window))
    return inputs, specs


def _clamp_blocks(block_q, block_kv, mask, bias):
    """fp32 bias adds a double-buffered [bq, bkv] streaming operand (and a
    dbias output in the dq kernel): cap blocks at 512 to stay inside the
    16MB scoped-VMEM budget. int8 masks are 4x smaller — measured faster
    at the full 1024 blocks (no clamp)."""
    if bias is not None:
        return min(block_q, 512), min(block_kv, 512)
    return block_q, block_kv


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------


def _fwd_tile_dual(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                   acc_scr, *, causal, window, kv_len, block_q, block_kv,
                   n_kv2, scale=1.0):
    """Two kv HALVES per grid step with both score matmuls issued before
    any softmax VPU work, giving Mosaic independent MXU/VPU chains to
    overlap (the single-block forward serializes s-matmul -> exp -> pv).
    Structural (causal/window) masking only — the mask math runs per half
    with sub-indices 2*kv_idx(+1); a half fully outside the band is
    naturally all-masked (p == 0, m untouched), so only whole-2*bkv skips
    need the pl.when."""
    q_idx, kv_idx = pl.program_id(2), pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    run0 = _should_run(q_idx, 2 * kv_idx, causal, window, block_q, block_kv)
    run1 = _should_run(q_idx, 2 * kv_idx + 1, causal, window, block_q,
                       block_kv)

    @pl.when(jnp.logical_or(run0, run1))
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]                       # [2*bkv, d]
        v = v_ref[0, 0]
        halves = []
        for h in range(2):
            kh = k[h * block_kv:(h + 1) * block_kv]
            halves.append(jax.lax.dot_general(
                q, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        for h, s in enumerate(halves):
            if scale != 1.0:
                s = s * scale
            s = _tile_mask(s, q_idx, 2 * kv_idx + h, causal, window,
                           kv_len, block_q, block_kv, n_kv2, None, None)
            m_prev, l_prev = m_scr[...], l_scr[...]
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - _lanes(m_next, block_kv))
            l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
            m_scr[...], l_scr[...] = m_next, l_next
            vh = v[h * block_kv:(h + 1) * block_kv]
            pv = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_scr[...] = (acc_scr[...]
                            * _lanes(alpha, acc_scr.shape[1]) + pv)

    @pl.when(kv_idx == pl.num_programs(3) - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...]
                       * _lanes(l_inv, acc_scr.shape[1])).astype(o_ref.dtype)
        safe_l = jnp.where(l == 0.0, 1.0, l)
        lse = m_scr[...] + jnp.log(safe_l)
        lse_ref[0, 0] = lse[:, :lse_ref.shape[-1]]


def _fwd_tile(q_ref, k_ref, v_ref, seg, mask_ref, bias_ref, o_ref, lse_ref,
              m_scr, l_scr, acc_scr, *,
              causal, window, kv_len, block_q, block_kv, n_kv,
              softcap=None, scale=1.0):
    q_idx, kv_idx = pl.program_id(2), pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = _should_run(q_idx, kv_idx, causal, window, block_q, block_kv)

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            # In-kernel score scaling: one VPU pass per [bq, bkv] tile,
            # hidden under the MXU chain (slope-measured free) — the old
            # out-of-kernel q pre-scale paid a full HBM read+write of q
            # per call. EXP2_SCORES still pre-scales (base-2 algebra).
            s = s * scale
        if softcap is not None:         # s IS the scaled scores: cap here
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        if bias_ref is not None:
            s = s + bias_ref[0, 0]
        s = _tile_mask(s, q_idx, kv_idx, causal, window, kv_len, block_q,
                       block_kv, n_kv, seg, mask_ref)

        m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]                 # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)                 # [bq, 128]
        exp_fn = jnp.exp2 if EXP2_SCORES else jnp.exp
        alpha = exp_fn(m_prev - m_next)
        if FWD_BF16_EXP:
            # exp on a bf16 score tile: p feeds the bf16 p@v matmul anyway,
            # so the only extra rounding is in l's summands (see flag note).
            p = exp_fn((s - _lanes(m_next, block_kv)).astype(jnp.bfloat16))
            l_next = (alpha * l_prev
                      + jnp.sum(p, axis=1, dtype=jnp.float32)[:, None])
        else:
            p = exp_fn(s - _lanes(m_next, block_kv))
            l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[...], l_scr[...] = m_next, l_next

        v = v_ref[0, 0]
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] = (acc_scr[...] * _lanes(alpha, acc_scr.shape[1])
                        + pv)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...]
                       * _lanes(l_inv, acc_scr.shape[1])).astype(o_ref.dtype)
        if lse_ref is not None:
            safe_l = jnp.where(l == 0.0, 1.0, l)
            if EXP2_SCORES:
                # m is in base-2 score units; publish the residual in base
                # e (ln2*m + ln(l)) so the jnp fallback stays
                # interchangeable.
                lse = _LN2 * m_scr[...] + jnp.log(safe_l)
            else:
                lse = m_scr[...] + jnp.log(safe_l)
            lse_ref[0, 0] = lse[:, :lse_ref.shape[-1]]


def _flash_fwd_pallas(q, k, v, mask, bias, q_seg, kv_seg, causal, window,
                      scale, block_q, block_kv, softcap=None,
                      need_lse=True):
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    g = hq // hkv
    block_q = FWD_BLOCK_Q if block_q is None else block_q
    block_kv = FWD_BLOCK_KV if block_kv is None else block_kv
    block_q, block_kv = _clamp_blocks(block_q, block_kv, mask, bias)
    bq = min(round_up(sq, 128), block_q)
    bkv = min(round_up(skv, 128), block_kv)
    sq_p, skv_p, d_p = round_up(sq, bq), round_up(skv, bkv), round_up(d, 128)
    # EXP2_SCORES folds scale*log2e into q (base-2 algebra relies on it);
    # the default path scales IN-KERNEL (see _fwd_tile) — the pre-scale's
    # extra HBM read+write of q was a measured ~6% of the forward.
    if EXP2_SCORES:
        qp = _pad4((q * (scale * _LOG2E)).astype(q.dtype), sq_p, d_p)
        kscale = 1.0
    else:
        qp = _pad4(q, sq_p, d_p)
        kscale = scale
    kp = _pad4(k, skv_p, d_p)
    vp = _pad4(v, skv_p, d_p)
    if bias is not None and EXP2_SCORES:
        bias = bias * _LOG2E
    n_kv = skv_p // bkv

    dual = (FWD_DUAL_KV and mask is None and bias is None
            and q_seg is None and not EXP2_SCORES and not FWD_BF16_EXP
            and softcap is None and n_kv % 2 == 0)
    if dual:
        return _flash_fwd_dual(qp, kp, vp, b, hq, g, sq, d, sq_p, d_p, skv,
                               causal, window, bq, bkv, n_kv, q.dtype,
                               scale=kscale)

    grid = (b, hq, sq_p // bq, n_kv)
    has_seg = q_seg is not None
    tile = functools.partial(_fwd_tile, causal=causal, window=window,
                             kv_len=skv, block_q=bq,
                             block_kv=bkv, n_kv=n_kv, softcap=softcap,
                             scale=kscale)
    if not need_lse:
        # No LSE output ref exists: re-slot the remaining refs around a
        # None lse_ref so the tile skips the residual store entirely.
        inner = tile
        tile = (lambda q_r, k_r, v_r, seg, m_r, b_r, o_r, ms, ls, acc:
                inner(q_r, k_r, v_r, seg, m_r, b_r, o_r, None, ms, ls, acc))
    kernel = _make_wrapper(tile, 3, has_seg, mask is not None,
                           bias is not None)

    def kv_map(ib, ih, iq, ik):
        ik = _clamp_kv(iq, ik, causal, window, bq, bkv)  # skip: elided DMA
        return (ib, ih // g, ik, 0)

    in_specs = [
        pl.BlockSpec((1, 1, bq, d_p), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        pl.BlockSpec((1, 1, bkv, d_p), kv_map),
        pl.BlockSpec((1, 1, bkv, d_p), kv_map),
    ]
    inputs = [qp, kp, vp]
    if has_seg:
        qsb, kvsb = _seg_arrays(q_seg, kv_seg, sq_p, skv_p)
        in_specs.extend(_seg_specs(bq, bkv, "qkv"))
        inputs.extend([qsb, kvsb])
    mb_in, mb_specs = _mb_inputs(mask, bias, sq_p, skv_p, bq, bkv, "qkv",
                                 causal, window)
    inputs.extend(mb_in)
    in_specs.extend(mb_specs)
    o_spec = pl.BlockSpec((1, 1, bq, d_p),
                          lambda ib, ih, iq, ik: (ib, ih, iq, 0))
    o_shape = jax.ShapeDtypeStruct((b, hq, sq_p, d_p), q.dtype)
    lse_spec = pl.BlockSpec((1, 1, bq, RESID_LANES),
                            lambda ib, ih, iq, ik: (ib, ih, iq, 0))
    lse_shape = jax.ShapeDtypeStruct((b, hq, sq_p, RESID_LANES),
                                     jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[o_spec, lse_spec] if need_lse else [o_spec],
        out_shape=[o_shape, lse_shape] if need_lse else [o_shape],
        scratch_shapes=[
            pltpu.VMEM((bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((bq, d_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * skv * d,
            bytes_accessed=(qp.size + kp.size + vp.size + qp.size) * qp.dtype.itemsize,
            transcendentals=b * hq * sq * skv),
        interpret=dispatch.interpret_mode(),
    )(*inputs)
    o = outs[0]
    lse = outs[1][:, :, :sq, 0] if need_lse else None
    return o[:, :, :sq, :d], lse


def _flash_fwd_dual(qp, kp, vp, b, hq, g, sq, d, sq_p, d_p, skv, causal,
                    window, bq, bkv, n_kv, out_dtype, scale=1.0):
    """FWD_DUAL_KV dispatch: grid over 2*bkv kv blocks, two halves per
    step (see :func:`_fwd_tile_dual`)."""
    tile = functools.partial(_fwd_tile_dual, causal=causal, window=window,
                             kv_len=skv, block_q=bq, block_kv=bkv,
                             n_kv2=n_kv, scale=scale)

    def kv_map(ib, ih, iq, ik):
        ik = _clamp_kv(iq, ik, causal, window, bq, 2 * bkv)
        return (ib, ih // g, ik, 0)

    o, lse = pl.pallas_call(
        tile,
        grid=(b, hq, sq_p // bq, n_kv // 2),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_p),
                         lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
            pl.BlockSpec((1, 1, 2 * bkv, d_p), kv_map),
            pl.BlockSpec((1, 1, 2 * bkv, d_p), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d_p),
                         lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
            pl.BlockSpec((1, 1, bq, RESID_LANES),
                         lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, sq_p, d_p), out_dtype),
            jax.ShapeDtypeStruct((b, hq, sq_p, RESID_LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((bq, d_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(      # same model as the single path
            flops=4 * b * hq * sq * (n_kv * bkv) * d,
            bytes_accessed=(qp.size + kp.size + vp.size
                            + qp.size) * qp.dtype.itemsize,
            transcendentals=b * hq * sq * n_kv * bkv),
        interpret=dispatch.interpret_mode(),
    )(qp, kp, vp)
    return o[:, :, :sq, :d], lse[:, :, :sq, 0]


# ---------------------------------------------------------------------------
# Pallas backward kernels (FlashAttention-2: dq kernel + dkv kernel)
# ---------------------------------------------------------------------------


def _dq_tile(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, seg, mask_ref,
             bias_ref, *rest, causal, window, kv_len, block_q,
             block_kv, n_kv, softcap=None, scale=1.0):
    if bias_ref is not None:
        dq_ref, dbias_ref, dq_scr = rest
    else:
        (dq_ref, dq_scr), dbias_ref = rest, None
    q_idx, kv_idx = pl.program_id(2), pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    should_run = _should_run(q_idx, kv_idx, causal, window, block_q, block_kv)

    @pl.when(should_run)
    def _run():
        q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
        lse, di = lse_ref[0, 0], di_ref[0, 0]
        if EXP2_SCORES:
            lse = lse * _LOG2E   # residual is base e; kernel works in base 2
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale        # in-kernel (VPU-hidden); see _fwd_tile
        cap_grad = None
        if softcap is not None:
            t = jnp.tanh(s * (1.0 / softcap))
            cap_grad = 1.0 - t * t
            s = softcap * t
        if bias_ref is not None:
            s = s + bias_ref[0, 0]
        s = _tile_mask(s, q_idx, kv_idx, causal, window, kv_len, block_q,
                       block_kv, n_kv, seg, mask_ref)
        p = (jnp.exp2 if EXP2_SCORES else jnp.exp)(
            s - _lanes(lse, block_kv))
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds_raw = p * (dp - _lanes(di, block_kv))      # grad wrt post-bias scores
        if dbias_ref is not None:
            dbias_ref[0, 0] = ds_raw
        if cap_grad is not None:            # chain through cap*tanh(s/cap)
            ds_raw = ds_raw * cap_grad
        if scale != 1.0:
            # ds/dq = scale * k: fold here (VPU-hidden) — the old
            # out-of-kernel `dq * scale` paid an HBM pass over dq.
            ds_raw = ds_raw * scale
        dq_scr[...] += jax.lax.dot_general(
            ds_raw.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if dbias_ref is not None and causal:
        # Skipped band tiles still own a distinct dbias output block.
        @pl.when(jnp.logical_not(should_run))
        def _zero_dbias():
            dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_tile(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, seg, mask_ref,
              bias_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
              causal, window, kv_len, block_q, block_kv, n_q, n_kv,
              softcap=None, scale=1.0):
    kv_idx, q_idx = pl.program_id(2), pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    should_run = _should_run(q_idx, kv_idx, causal, window, block_q, block_kv)

    @pl.when(should_run)
    def _run():
        q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
        lse, di = lse_ref[0, 0], di_ref[0, 0]
        if EXP2_SCORES:
            lse = lse * _LOG2E   # residual is base e; kernel works in base 2
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale        # in-kernel (VPU-hidden); see _fwd_tile
        cap_grad = None
        if softcap is not None:
            t = jnp.tanh(s * (1.0 / softcap))
            cap_grad = 1.0 - t * t
            s = softcap * t
        if bias_ref is not None:
            s = s + bias_ref[0, 0]
        s = _tile_mask(s, q_idx, kv_idx, causal, window, kv_len, block_q,
                       block_kv, n_kv, seg, mask_ref)
        p = (jnp.exp2 if EXP2_SCORES else jnp.exp)(
            s - _lanes(lse, block_kv))                          # [bq, bkv]
        # dv += pᵀ @ do ; transpose folded into dot_general contraction dims.
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds_raw = p * (dp - _lanes(di, block_kv))
        if cap_grad is not None:            # chain through cap*tanh(s/cap)
            ds_raw = ds_raw * cap_grad
        if scale != 1.0:
            ds_raw = ds_raw * scale         # ds/dk = scale * q
        dk_scr[...] += jax.lax.dot_general(
            ds_raw.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _dkvq_tile(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, seg, mask_ref,
               bias_ref, *rest, causal, window, kv_len, block_q,
               block_kv, n_q, n_kv, softcap=None, scale=1.0):
    """FUSED backward tile: one (s, p, dp, ds) recompute feeds dk, dv AND a
    dq partial — 5 matmuls per tile pair vs 7 for the split dq/dkv kernels.
    dq partials [b, h, n_kv, sq, d] are reduced over n_kv outside."""
    if bias_ref is not None:
        dk_ref, dv_ref, dqp_ref, dbias_ref, dk_scr, dv_scr = rest
    else:
        (dk_ref, dv_ref, dqp_ref, dk_scr, dv_scr), dbias_ref = rest, None
    kv_idx, q_idx = pl.program_id(2), pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    should_run = _should_run(q_idx, kv_idx, causal, window, block_q, block_kv)

    @pl.when(should_run)
    def _run():
        q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
        lse, di = lse_ref[0, 0], di_ref[0, 0]
        if EXP2_SCORES:
            lse = lse * _LOG2E   # residual is base e; kernel works in base 2
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale        # in-kernel (VPU-hidden); see _fwd_tile
        cap_grad = None
        if softcap is not None:
            t = jnp.tanh(s * (1.0 / softcap))
            cap_grad = 1.0 - t * t
            s = softcap * t
        if bias_ref is not None:
            s = s + bias_ref[0, 0]
        s = _tile_mask(s, q_idx, kv_idx, causal, window, kv_len, block_q,
                       block_kv, n_kv, seg, mask_ref)
        p = (jnp.exp2 if EXP2_SCORES else jnp.exp)(
            s - _lanes(lse, block_kv))
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds_raw = p * (dp - _lanes(di, block_kv))
        if dbias_ref is not None:
            dbias_ref[0, 0] = ds_raw
        if cap_grad is not None:            # chain through cap*tanh(s/cap)
            ds_raw = ds_raw * cap_grad
        if scale != 1.0:
            ds_raw = ds_raw * scale         # ds/dk, ds/dq both carry scale
        dk_scr[...] += jax.lax.dot_general(
            ds_raw.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqp_ref[0, 0, 0] = jax.lax.dot_general(
            ds_raw.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dqp_ref.dtype)

    if causal:
        # Skipped band tiles still own distinct dq-partial/dbias blocks.
        @pl.when(jnp.logical_not(should_run))
        def _zero():
            dqp_ref[0, 0, 0] = jnp.zeros_like(dqp_ref[0, 0, 0])
            if dbias_ref is not None:
                dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


# Backward strategy: 'fused' recomputes (s, p, dp, ds) ONCE per tile pair
# and emits dk, dv, and dq partials (5 matmuls/tile, + an HBM pass for the
# [b,h,n_kv,sq,d] partials reduced outside); 'split' runs separate
# dq and dkv kernels (7 matmuls/tile, no partials traffic). MEASURED on
# v5e (h8 d128 causal bf16, 1024x1024 blocks): with fp32 partials fused
# lost (0.875x at b8/s2048 — partials HBM writes + reduction cost more
# than the two saved matmuls). With partials in q.dtype (bf16 — same
# rounding as the split path's bf16 dq output, summed in fp32) the
# traffic halves and fused WINS: 0.891x of split at b4/s4096 (8283 vs
# 9296us fwd+bwd, probe 150.6) and 0.933x at b8/s2048 (6449 vs 6913us,
# probe 145), dq max|Δ| 7.8e-3 on |g|~12 (one bf16 ulp). FUSED is the
# default; the split path stays tested for fp32-exact comparisons.
FUSED_BWD = True


def _flash_bwd_pallas(q, k, v, o, lse, do, mask, bias, q_seg, kv_seg, causal,
                      window, scale, block_q, block_kv, softcap=None):
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    g = hq // hkv
    block_q = BWD_BLOCK_Q if block_q is None else block_q
    block_kv = BWD_BLOCK_KV if block_kv is None else block_kv
    block_q, block_kv = _clamp_blocks(block_q, block_kv, mask, bias)
    bq = min(round_up(sq, 128), block_q)
    bkv = min(round_up(skv, 128), block_kv)
    sq_p, skv_p, d_p = round_up(sq, bq), round_up(skv, bkv), round_up(d, 128)
    n_q, n_kv = sq_p // bq, skv_p // bkv

    # EXP2 pre-scales q (base-2 algebra); default scales IN-KERNEL and
    # folds scale into ds — no out-of-kernel passes over q or dq (see
    # _fwd_tile / _dq_tile notes).
    if EXP2_SCORES:
        qp = _pad4((q * (scale * _LOG2E)).astype(q.dtype), sq_p, d_p)
        kscale = 1.0
    else:
        qp = _pad4(q, sq_p, d_p)
        kscale = scale
    kp, vp = _pad4(k, skv_p, d_p), _pad4(v, skv_p, d_p)
    dop = _pad4(do, sq_p, d_p)
    if bias is not None and EXP2_SCORES:
        bias = bias * _LOG2E
    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    # Lane-broadcast [b,h,sq,RESID_LANES]; pad the seq axis. Padded q rows
    # are harmless: their do rows are zero, so dv += pᵀ@do and
    # ds = p*(dp-di) both vanish; padded dq rows are sliced away below.
    lse4 = jnp.broadcast_to(lse[..., None], (*lse.shape, RESID_LANES))
    di4 = jnp.broadcast_to(di[..., None], (*di.shape, RESID_LANES))
    lse4 = jnp.pad(lse4, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    di4 = jnp.pad(di4, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))

    def kv_map(ib, ih, iq, ik):
        ik = _clamp_kv(iq, ik, causal, window, bq, bkv)
        return (ib, ih // g, ik, 0)

    q_spec = pl.BlockSpec((1, 1, bq, d_p), lambda ib, ih, iq, ik: (ib, ih, iq, 0))
    kv_spec = pl.BlockSpec((1, 1, bkv, d_p), kv_map)
    lm_spec = pl.BlockSpec((1, 1, bq, RESID_LANES),
                           lambda ib, ih, iq, ik: (ib, ih, iq, 0))

    has_seg = q_seg is not None
    has_bias = bias is not None
    if has_seg:
        qsb, kvsb = _seg_arrays(q_seg, kv_seg, sq_p, skv_p)
    dbias = None

    if not FUSED_BWD:
        dq_tile = functools.partial(_dq_tile, causal=causal, window=window,
                                    kv_len=skv, block_q=bq,
                                    block_kv=bkv, n_kv=n_kv, softcap=softcap,
                                    scale=kscale)
        dq_kernel = _make_wrapper(dq_tile, 6, has_seg, mask is not None,
                                  has_bias)
        dq_specs = [q_spec, kv_spec, kv_spec, q_spec, lm_spec, lm_spec]
        dq_inputs = [qp, kp, vp, dop, lse4, di4]
        if has_seg:
            dq_specs.extend(_seg_specs(bq, bkv, "qkv"))
            dq_inputs.extend([qsb, kvsb])
        mb_in, mb_specs = _mb_inputs(mask, bias, sq_p, skv_p, bq, bkv, "qkv",
                                     causal, window)
        dq_inputs.extend(mb_in)
        dq_specs.extend(mb_specs)
        dq_out_spec = pl.BlockSpec((1, 1, bq, d_p),
                                   lambda ib, ih, iq, ik: (ib, ih, iq, 0))
        dq_out_shape = jax.ShapeDtypeStruct((b, hq, sq_p, d_p), q.dtype)
        if has_bias:
            # dbias streams out one [bq, bkv] fp32 tile per grid step.
            dbias_spec = pl.BlockSpec((1, 1, bq, bkv),
                                      lambda ib, ih, iq, ik: (ib, ih, iq, ik))
            out_specs = [dq_out_spec, dbias_spec]
            out_shape = [dq_out_shape,
                         jax.ShapeDtypeStruct((b, hq, sq_p, skv_p),
                                              jnp.float32)]
        else:
            out_specs, out_shape = dq_out_spec, dq_out_shape
        dq_out = pl.pallas_call(
            dq_kernel,
            grid=(b, hq, n_q, n_kv),
            in_specs=dq_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((bq, d_p), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
            interpret=dispatch.interpret_mode(),
        )(*dq_inputs)
        if has_bias:
            dq, dbias_full = dq_out
            dbias = _unbroadcast_bias(dbias_full[:, :, :sq, :skv], bias)
        else:
            dq = dq_out

    # dk/dv (and, when fused, dq partials + dbias): grid loops kv tiles in
    # the 3rd dim, q tiles sequentially in the 4th. Computed per q-head
    # ([b, hq, skv, d]) then group-summed for GQA.
    def q_map_t(ib, ih, ikv, iq):
        iq = _clamp_q(iq, ikv, causal, window, bq, bkv)
        return (ib, ih, iq, 0)

    q_spec_t = pl.BlockSpec((1, 1, bq, d_p), q_map_t)
    kv_spec_t = pl.BlockSpec((1, 1, bkv, d_p),
                             lambda ib, ih, ikv, iq: (ib, ih // g, ikv, 0))
    lm_spec_t = pl.BlockSpec(
        (1, 1, bq, RESID_LANES),
        lambda ib, ih, ikv, iq: (ib, ih,
                                 _clamp_q(iq, ikv, causal, window, bq, bkv),
                                 0))
    dkv_out_spec = pl.BlockSpec((1, 1, bkv, d_p),
                                lambda ib, ih, ikv, iq: (ib, ih, ikv, 0))
    tile_cls = _dkvq_tile if FUSED_BWD else _dkv_tile
    dkv_tile = functools.partial(tile_cls, causal=causal, window=window,
                                 kv_len=skv, block_q=bq,
                                 block_kv=bkv, n_q=n_q, n_kv=n_kv,
                                 softcap=softcap, scale=kscale)
    dkv_kernel = _make_wrapper(dkv_tile, 6, has_seg, mask is not None,
                               has_bias)
    dkv_specs = [q_spec_t, kv_spec_t, kv_spec_t, q_spec_t, lm_spec_t,
                 lm_spec_t]
    dkv_inputs = [qp, kp, vp, dop, lse4, di4]
    if has_seg:
        dkv_specs.extend(_seg_specs(bq, bkv, "kvq"))
        dkv_inputs.extend([qsb, kvsb])
    mb_in_t, mb_specs_t = _mb_inputs(mask, bias, sq_p, skv_p, bq, bkv, "kvq",
                                     causal, window)
    dkv_inputs.extend(mb_in_t)
    dkv_specs.extend(mb_specs_t)
    out_specs = [dkv_out_spec, dkv_out_spec]
    out_shape = [jax.ShapeDtypeStruct((b, hq, skv_p, d_p), k.dtype),
                 jax.ShapeDtypeStruct((b, hq, skv_p, d_p), v.dtype)]
    if FUSED_BWD:
        # Partials ride in q's dtype: the split path stores dq as q.dtype
        # anyway, and bf16 partials HALVE the [b,h,n_kv,sq,d] HBM traffic
        # that made the fp32-partials fused variant lose (0.875x).
        out_specs.append(pl.BlockSpec(
            (1, 1, 1, bq, d_p), lambda ib, ih, ikv, iq: (ib, ih, ikv, iq, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((b, hq, n_kv, sq_p, d_p), q.dtype))
        if has_bias:
            out_specs.append(pl.BlockSpec(
                (1, 1, bq, bkv), lambda ib, ih, ikv, iq: (ib, ih, iq, ikv)))
            out_shape.append(
                jax.ShapeDtypeStruct((b, hq, sq_p, skv_p), jnp.float32))
    outs = pl.pallas_call(
        dkv_kernel,
        grid=(b, hq, n_kv, n_q),
        in_specs=dkv_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bkv, d_p), jnp.float32),
                        pltpu.VMEM((bkv, d_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=dispatch.interpret_mode(),
    )(*dkv_inputs)
    if FUSED_BWD:
        if has_bias:
            dk_full, dv_full, dq_p, dbias_full = outs
            dbias = _unbroadcast_bias(dbias_full[:, :, :sq, :skv], bias)
        else:
            dk_full, dv_full, dq_p = outs
        dq = jnp.sum(dq_p, axis=2, dtype=jnp.float32).astype(q.dtype)
    else:
        dk_full, dv_full = outs

    if EXP2_SCORES:
        dq = dq[:, :, :sq, :d] * scale  # fold the pre-scaled q back out
    else:
        dq = dq[:, :, :sq, :d]          # scale already folded into ds
    dk = _group_sum(dk_full[:, :, :skv, :d], g)
    if EXP2_SCORES:
        # dk was computed against the log2e-scaled q: fold the constant out.
        dk = dk * _LN2
    dv = _group_sum(dv_full[:, :, :skv, :d], g)
    return dq, dk, dv, dbias
