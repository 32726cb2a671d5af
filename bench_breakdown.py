"""Per-phase attribution of the headline train step (VERDICT r5 #1).

Where do the missing MFU points go? bench.py's whole-step number (0.53 of
probe in BENCH_r04) is ~22% attention at ~0.55-of-probe — which still
leaves ~25-30 points unexplained. This script slope-times the step's
phases in ONE process (probes interleaved, all timings RTT-cancelled per
bench_probe) and prints a JSON attribution whose parts sum to ~step time:

  in-situ ablations (each = fwdbwd - fwdbwd_with_phase_removed):
    attention        ops.flash_attention -> identity(v)
    head_loss        fused LM-head CE -> sum(hidden^2)
    embed_lookup     token-embedding gather/scatter -> row-0 broadcast
  direct phases:
    fwd / bwd        loss-only chain; bwd = fwdbwd - fwd
    optimizer        adam update on fixed grads (natural params carry)
  micro (same shapes as the model's GEMMs, chained like the probe):
    qkvo / ffn / head / dw matmul TF/s — is the non-attention matmul
    floor at probe speed, or is the GEMM mix itself below probe?

Carry discipline (CLAUDE.md): every chain body feeds the next iteration
through a `* 1e-30` perturbation of a real input (never `* 0`, which XLA
folds and then hoists the body), and every variant consumes ALL grads it
computes (summing only one leaf lets XLA DCE the dw half of the backward).
"""

from __future__ import annotations

import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from bench import (BATCH, SEQ, D_MODEL, HEADS, LAYERS, FFN, VOCAB, DTYPE,
                   step_flops)

tree_map = jax.tree_util.tree_map


def _slope(make, args, n, n2, reps=3):
    """Median slope of jitted chains make(length)(*args) between n and n2."""
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


def _grad_chain(loss_fn, params, tokens, n, n2):
    """Slope-time value_and_grad of loss_fn. The carry is the loss plus the
    global grad sum; it perturbs the embedding table (cheap leaf), so every
    iteration depends on ALL grads of the previous one (no DCE)."""
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


def _fwd_chain(loss_fn, params, tokens, n, n2):
    def make(length):
        @jax.jit
        def run(params, tokens):
            def body(c, _):
                p = dict(params)
                p["embedding"] = {"table": params["embedding"]["table"]
                                  + (c * 1e-30)}
                return loss_fn(p, tokens), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
            return out
        return run
    return _slope(make, (params, tokens), n, n2)


def _step_chain(step_fn, params, opt_state, tokens, n, n2):
    """Natural (params, opt_state) carry — bench.py's timing, slope form.

    The final reduction consumes the LAST params (one pass, outside the
    loop — constant, cancels in the slope): without it a step_fn whose
    loss output doesn't depend on its own update (e.g. an optimizer-only
    step with fixed grads) gets its whole update chain DCE'd — r5's first
    opt_us measurement read 16us for a ~3.7ms adam update this way."""
    def make(length):
        @jax.jit
        def run(params, opt_state, tokens):
            def body(c, _):
                p, s = c
                p, s, loss = step_fn(p, s, tokens)
                return (p, s), loss
            (p, s), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=length)
            psum = sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(p))
            return losses[-1] + psum * 1e-30
        return run
    return _slope(make, (params, opt_state, tokens), n, n2)


def build():
    from np_modeling_tpu import models, training
    cfg = models.GPTConfig(vocab_size=VOCAB, d_model=D_MODEL,
                           num_heads=HEADS, num_layers=LAYERS,
                           hidden_units=FFN, max_len=SEQ, dtype=DTYPE,
                           fused_loss=True)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, VOCAB, (BATCH, SEQ)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    opt = training.adam(1e-3)
    opt_state = opt.init(params)

    def step(params, opt_state, toks):
        loss, grads = jax.value_and_grad(
            lambda p: gpt.loss(p, toks))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return training.apply_updates(params, updates), opt_state, loss
    return gpt, params, opt, opt_state, tokens, step


def _matmul_micro():
    """Achieved TF/s on the step's own GEMM shapes, probe-style chained
    (x feeds the next iteration through the product; tanh bounds values —
    one VPU pass per chain link, noted per-shape below)."""
    m = BATCH * SEQ
    key = jax.random.PRNGKey(1)

    def w(shape, scale):
        nonlocal key
        key, k = jax.random.split(key)
        return (jax.random.normal(k, shape, jnp.bfloat16) * scale
                ).astype(jnp.bfloat16)

    x0 = w((m, D_MODEL), 1.0)
    out = {}

    def chain(name, flops_per_iter, body, n, n2):
        def make(length):
            @jax.jit
            def run(x):
                def f(c, _):
                    return jnp.tanh(body(c)), None
                x, _ = jax.lax.scan(f, x, None, length=length)
                return jnp.sum(x.astype(jnp.float32))
            return run
        t = _slope(make, (x0,), n, n2)
        out[name] = round(flops_per_iter / t / 1e12, 1)

    wq = w((D_MODEL, D_MODEL), D_MODEL ** -0.5)
    chain("qkvo_1024x1024", 2 * m * D_MODEL * D_MODEL,
          lambda c: c @ wq, 16, 176)                 # ~0.2ms/it
    w1 = w((D_MODEL, FFN), D_MODEL ** -0.5)
    w2 = w((FFN, D_MODEL), FFN ** -0.5)
    chain("ffn_pair", 2 * m * D_MODEL * FFN * 2,
          lambda c: jax.nn.relu(c @ w1) @ w2, 8, 48)  # ~1.6ms/it
    wv = w((D_MODEL, VOCAB), D_MODEL ** -0.5)
    wvt = w((VOCAB, D_MODEL), VOCAB ** -0.5)
    chain("head_pair", 2 * m * D_MODEL * VOCAB * 2,
          lambda c: (c @ wv) @ wvt, 8, 32)            # ~3.2ms/it

    # dw-shape GEMM ([d, m] @ [m, ffn] -> fp32 [d, ffn]): weight-shaped
    # output can't chain; _timed_scan's full-output sum adds ~5% here.
    dy = w((m, FFN), 1.0)
    t = bench_probe._timed_scan(
        lambda xc: jax.lax.dot_general(
            xc, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32),
        x0, n=16, n2=96)
    out["dw_1024x16k_x4096"] = round(2 * m * D_MODEL * FFN / t / 1e12, 1)
    return out


def _micro_ops(gpt, params, tokens):
    """Isolated fwd+bwd of the two suspected non-matmul sinks."""
    out = {}
    from np_modeling_tpu import ops
    n_tok = BATCH * (SEQ - 1)
    hidden = jax.random.normal(jax.random.PRNGKey(2), (n_tok, D_MODEL),
                               jnp.bfloat16)
    table = params["embedding"]["table"]
    labels = tokens[..., 1:].reshape(-1)

    def loss_grad(h, tb):
        def f(args):
            return ops.fused_lm_head_loss(args[0], args[1], labels)
        val, g = jax.value_and_grad(f)((h, tb))
        return (h + g[0] * 1e-30 + val * 1e-30
                + jnp.sum(g[1]) * 1e-30).astype(h.dtype)

    def make(length):
        @jax.jit
        def run(h, tb):
            def body(c, _):
                return loss_grad(c, tb), None
            h2, _ = jax.lax.scan(body, h, None, length=length)
            return jnp.sum(h2.astype(jnp.float32))
        return run
    out["fused_lm_loss_fwdbwd_us"] = round(
        _slope(make, (hidden, table), 4, 20) * 1e6, 1)

    ids = tokens
    def emb_grad(tb):
        def f(t):
            y = ops.embedding_lookup(t, ids)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(f)(tb)

    def make_e(length):
        @jax.jit
        def run(tb):
            def body(c, _):
                g = emb_grad(tb + c * 1e-30)
                return jnp.sum(g), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
            return out
        return run
    out["embed_fwdbwd_us"] = round(
        _slope(make_e, (table,), 8, 48) * 1e6, 1)
    return out


def main():
    import np_modeling_tpu.ops as ops_mod
    import np_modeling_tpu.nn.embedding as emb_mod

    gpt, params, opt, opt_state, tokens, step = build()
    probes = [bench_probe.probe()]
    res = {}

    # ---- step-level chains (n=2/n2=6: 4x ~40-70ms >> RTT drift) ----------
    res["step_us"] = round(_step_chain(step, params, opt_state, tokens,
                                       2, 6) * 1e6, 1)
    loss_fn = lambda p, t: gpt.loss(p, t)
    res["fwdbwd_us"] = round(_grad_chain(loss_fn, params, tokens,
                                         2, 6) * 1e6, 1)
    res["fwd_us"] = round(_fwd_chain(loss_fn, params, tokens, 2, 8) * 1e6, 1)
    probes.append(bench_probe.probe())

    # ---- optimizer alone (natural carry; fixed grads) ---------------------
    fixed_grads = jax.jit(jax.grad(loss_fn))(params, tokens)
    def opt_step(p, s, _toks):
        updates, s = opt.update(fixed_grads, s, p)
        from np_modeling_tpu import training
        return training.apply_updates(p, updates), s, jnp.float32(0)
    res["opt_us"] = round(_step_chain(opt_step, params, opt_state, tokens,
                                      8, 56) * 1e6, 1)

    # ---- ablations ---------------------------------------------------------
    # The stub CONSUMES q, k, AND v: a v-only stub lets XLA zero the q/k
    # projection gradients and shrink their matmuls — r5's first run
    # attributed ~5ms of projection time to "attention" this way.
    real_attn = ops_mod.flash_attention
    ops_mod.flash_attention = lambda q, k, v, **kw: (
        (q + k + v) * (1.0 / 3.0)).astype(q.dtype)
    try:
        res["fwdbwd_noattn_us"] = round(
            _grad_chain(loss_fn, params, tokens, 2, 6) * 1e6, 1)
    finally:
        ops_mod.flash_attention = real_attn

    def hidden_loss(p, toks):
        h = gpt.apply(p, toks[..., :-1], return_hidden=True)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6
    res["fwdbwd_noloss_us"] = round(
        _grad_chain(hidden_loss, params, tokens, 2, 6) * 1e6, 1)

    # NOTE r5: a broadcast-stub "noembed" ablation was dropped — it
    # measured 5.5ms for an op whose isolated fwd+bwd is 0.9ms (the stub
    # changed XLA's fusion globally; exp_embed_fix.py showed the real
    # scatter-vs-matmul in-situ delta is ~0.25ms). Ablations are only
    # trustworthy when the stub preserves the dataflow shape.
    probes.append(bench_probe.probe())

    # ---- micro -------------------------------------------------------------
    res["micro_matmul_tflops"] = _matmul_micro()
    res.update(_micro_ops(gpt, params, tokens))
    probes.append(bench_probe.probe())

    # ---- attribution -------------------------------------------------------
    s = res["step_us"]
    attn = res["fwdbwd_us"] - res["fwdbwd_noattn_us"]
    head = res["fwdbwd_us"] - res["fwdbwd_noloss_us"]
    opt_t = res["opt_us"]
    rest = s - attn - head - opt_t
    res["attribution_us"] = {
        "attention_insitu": round(attn, 1),
        "head_loss_insitu": round(head, 1),
        "optimizer": round(opt_t, 1),
        "rest_matmul_ln_resid_embed": round(rest, 1),
        "sum_check_vs_step": round((attn + head + opt_t + rest) / s, 3),
        "opt_crosscheck_us": round(res["step_us"] - res["fwdbwd_us"], 1),
    }
    res["probes_tflops"] = [round(p, 1) for p in probes]
    res["probe_median"] = round(statistics.median(probes), 1)
    res["step_mfu_vs_probe"] = round(
        step_flops() / (s * 1e-6) / 1e12 / res["probe_median"], 4)
    res["device_kind"] = jax.devices()[0].device_kind
    print(json.dumps(res))


if __name__ == "__main__":
    main()
