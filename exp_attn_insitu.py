"""Localize the in-situ attention cost (VERDICT r5 #1, biggest bucket).

bench_breakdown measured attention's in-situ ablation delta at 27.4ms/step
— but the r4 kernel micro says the flash fwd+bwd at the same shape is
~4.1ms, projections ~5ms. Where do ~18ms come from? Ladder, all in ONE
process, slope-timed:

  L0  kernel grad micro: grad wrt (q,k,v) of sum(flash(q,k,v)^2)
  L0j same with jax's public FA kernel (is it the kernel or the graph?)
  M1  model fwdbwd baseline (bench_breakdown's 64.6ms)
  M2  model with flash -> (q+k+v)/3 stub (keeps projections + transposes
      alive; removes ONLY the kernel fwd+bwd)
  M3  model with flash -> jax-FA (same graph, competitor kernel)

  attn_kernel_in_model = M1 - M2   (compare to L0)
"""

from __future__ import annotations

import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from bench import BATCH, SEQ, D_MODEL, HEADS, LAYERS, FFN, VOCAB, DTYPE


def _slope(make, args, n, n2, reps=3):
    r1, r2 = make(n), make(n2)
    jax.block_until_ready(r1(*args))
    jax.block_until_ready(r2(*args))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(r1(*args))
        t1 = time.perf_counter()
        jax.block_until_ready(r2(*args))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n))
    return max(statistics.median(slopes), 1e-9)


def _grad_chain(loss_fn, params, tokens, n=2, n2=6):
    def make(length):
        @jax.jit
        def run(params, tokens):
            def body(c, _):
                p = dict(params)
                p["embedding"] = {"table": params["embedding"]["table"]
                                  + (c * 1e-30)}
                loss, grads = jax.value_and_grad(loss_fn)(p, tokens)
                gsum = sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads))
                return loss + gsum * 1e-30, None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
            return out
        return run
    return _slope(make, (params, tokens), n, n2)


def kernel_micro(q, k, v, fa, n=6, n2=24):
    def run(qc):
        g = jax.grad(lambda t: jnp.sum(
            fa(t[0], t[1], t[2]).astype(jnp.float32) ** 2))((qc, k, v))
        return (qc + 0.0001 * (g[0] + g[1] + g[2])).astype(jnp.bfloat16)
    return bench_probe._timed_scan(run, q, n=n, n2=n2)


class _Res(dict):
    """Print each result as it lands (a crash keeps earlier phases)."""
    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        import sys
        print(f"PARTIAL {k}={v}", file=sys.stderr, flush=True)


def main():
    from np_modeling_tpu import models, ops
    import np_modeling_tpu.ops as ops_mod

    res = _Res()
    res["probe0"] = round(bench_probe.probe(), 1)

    cfg = models.GPTConfig(vocab_size=VOCAB, d_model=D_MODEL,
                           num_heads=HEADS, num_layers=LAYERS,
                           hidden_units=FFN, max_len=SEQ, dtype=DTYPE,
                           fused_loss=True)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, VOCAB, (BATCH, SEQ)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    loss_fn = lambda p, t: gpt.loss(p, t)

    # ---- L0: kernel micros, ours vs jax-FA ---------------------------------
    b, h, s, d = BATCH, HEADS, SEQ, D_MODEL // HEADS
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, d),
                                                 dtype=np.float32)
                             ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    sc = 1.0 / (d ** 0.5)
    from jax.experimental.pallas.ops.tpu import flash_attention as jfa
    jfa_fn = functools.partial(
        jfa.flash_attention, causal=True, sm_scale=sc,
        block_sizes=jfa.BlockSizes.get_default(b, h, s, s, d))
    ours_fn = functools.partial(ops.flash_attention, causal=True)
    res["L0_ours_us"] = round(kernel_micro(q, k, v, ours_fn) * 1e6, 1)
    res["L0_jax_us"] = round(kernel_micro(q, k, v, jfa_fn) * 1e6, 1)
    res["L0_fwdonly_ours_us"] = round(bench_probe._timed_scan(
        lambda qc: ours_fn(qc, k, v), q, n=8, n2=40) * 1e6, 1)
    res["probe1"] = round(bench_probe.probe(), 1)

    # ---- M1: model baseline ------------------------------------------------
    res["M1_base_us"] = round(_grad_chain(loss_fn, params, tokens) * 1e6, 1)

    # ---- M2: qkv-consuming stub (removes ONLY the kernel) ------------------
    real = ops_mod.flash_attention
    ops_mod.flash_attention = lambda q_, k_, v_, **kw: (
        ((q_ + k_ + v_) * (1.0 / 3.0)).astype(q_.dtype)
        if q_.shape == k_.shape else
        (q_ + (k_.sum(2, keepdims=True) + v_.sum(2, keepdims=True))
         * 1e-9).astype(q_.dtype))
    try:
        res["M2_qkvstub_us"] = round(
            _grad_chain(loss_fn, params, tokens) * 1e6, 1)
    finally:
        ops_mod.flash_attention = real

    # ---- M3: jax-FA inside the model ---------------------------------------
    def jfa_adapter(q_, k_, v_, mask=None, bias=None, segment_ids=None,
                    causal=False, window=None, scale=None, **kw):
        assert mask is None and bias is None and window is None
        s_ = q_.shape[2]
        sp = -(-s_ // 512) * 512          # jax-FA needs block-divisible seq
        if sp != s_:
            pad = ((0, 0), (0, 0), (0, sp - s_), (0, 0))
            q_, k_, v_ = (jnp.pad(a, pad) for a in (q_, k_, v_))
        o_ = jfa.flash_attention(
            q_, k_, v_, causal=causal,
            sm_scale=scale if scale is not None
            else 1.0 / (q_.shape[-1] ** 0.5),
            block_sizes=jfa.BlockSizes.get_default(
                q_.shape[0], q_.shape[1], q_.shape[2], k_.shape[2],
                q_.shape[3]))
        return o_[:, :, :s_] if sp != s_ else o_
    ops_mod.flash_attention = jfa_adapter
    try:
        res["M3_jaxfa_us"] = round(
            _grad_chain(loss_fn, params, tokens) * 1e6, 1)
    finally:
        ops_mod.flash_attention = real
    res["probe2"] = round(bench_probe.probe(), 1)

    res["attn_kernel_in_model_us"] = round(
        res["M1_base_us"] - res["M2_qkvstub_us"], 1)
    res["jaxfa_kernel_in_model_us"] = round(
        res["M3_jaxfa_us"] - res["M2_qkvstub_us"], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
