"""Headline benchmark: full GPT training step, ours vs equivalent Flax/optax.

Config: 4-layer GPT, d_model=1024, 8 heads (head_dim=128), seq=4096, batch=4
— the causal-decoder workload of BASELINE.json config #5 at a production
(long-context) sequence length, 16k tokens/step. r5 measurements (probe
175.4 TF/s, slope-timed): step 64.9ms = 114.4 TF/s = 0.65 of probe,
1.61x vs Flax (s=2048/b8 measured 1.110 in r3 — the flash kernels'
advantage grows with context while the Flax baseline's score
materialization collapses).

Also reports step MFU: analytic matmul FLOPs (QKVO projections, causal
attention at 0.5 occupancy, FFN, logits head; backward = 2x forward)
against the v5e nominal 197 bf16 TFLOP/s.

Timing: K train steps chained inside ONE jit via lax.scan with a single
scalar readback (the device tunnel does not block on block_until_ready, so
per-call wall timing lies; in-jit chaining measures pure device time).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline = flax_step_time / our_step_time (>1.0 = we are faster).

SELF-CERTIFYING (VERDICT r2 #1): the line also records the same-run chip
probe (bench_probe: plain 8k bf16 matmul chain — the honest ceiling on
this ~4x-drifting tunneled chip), step MFU vs that probe, and per-kernel
MFU vs probe (Pallas matmul, flash attention fwd and fwd+bwd at the
headline shape), so "X% of measured ceiling" is auditable from the
artifact alone.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH, SEQ, D_MODEL, HEADS, LAYERS, FFN, VOCAB = 4, 4096, 1024, 8, 4, 4096, 8192
K = 8  # steps per timed jit call
V5E_BF16_PEAK = 197e12  # nominal single-chip bf16 TFLOP/s

# Nominal bf16 peaks by jax device_kind — the MFU-vs-peak field uses the
# entry matching the CURRENT chip (VERDICT r5 #4: a "roofline" above 100%
# means the probe or the assumed peak is wrong; r4's 203.7 "probe" on a
# 197-peak chip was short-chain slope noise, fixed in bench_probe).
NOMINAL_BF16_PEAK = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def step_flops() -> float:
    """Analytic matmul FLOPs of one train step (fwd + 2x for backward)."""
    s, d = SEQ, D_MODEL
    per_layer = (8 * s * d * d          # q/k/v/o projections
                 + 4 * s * d * FFN      # 2 FFN matmuls
                 + 4 * s * s * d * 0.5) # qk^T + pv, causal half
    fwd = BATCH * (LAYERS * per_layer + 2 * s * d * VOCAB)
    return 3.0 * fwd
DTYPE = jnp.bfloat16  # compute dtype both sides; params/grads/loss fp32


def _time_scan_steps(step_fn, params, opt_state, tokens):
    """step_fn(params, opt_state, tokens) -> (params, opt_state, loss).

    SLOPE-timed between K- and 3K-step chains: each readback on this
    tunneled device pays a ~20-45ms round trip, which at K=8 inflated
    per-step time ~4% (see bench_probe's round-4 notes); the difference
    of two chain lengths cancels it. The params/opt-state carry is a real
    data dependence, so the body cannot be hoisted."""
    import statistics

    def make(length):
        @jax.jit
        def run(params, opt_state, tokens):
            def body(c, _):
                p, s = c
                p, s, loss = step_fn(p, s, tokens)
                return (p, s), loss

            (p, s), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=length)
            return losses[-1]
        return run

    r1, r2 = make(K), make(3 * K)
    float(r1(params, opt_state, tokens))   # compile + warm
    float(r2(params, opt_state, tokens))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(r1(params, opt_state, tokens))
        t1 = time.perf_counter()
        float(r2(params, opt_state, tokens))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (2 * K))
    return statistics.median(slopes)


def build_ours(tokens):
    from np_modeling_tpu import models, training

    # fused_loss: chunked LM-head CE (no [b,s,V] logits in HBM). A/B'd
    # same-process at this config: 1.012x (the v=8k head is a small share
    # at s=4096; the win grows with vocab — 1.22x at v=32k, see GPTConfig).
    cfg = models.GPTConfig(vocab_size=VOCAB, d_model=D_MODEL, num_heads=HEADS,
                           num_layers=LAYERS, hidden_units=FFN, max_len=SEQ,
                           dtype=DTYPE, fused_loss=True)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    opt = training.adam(1e-3)
    opt_state = opt.init(params)

    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(lambda p: gpt.loss(p, tokens))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return training.apply_updates(params, updates), opt_state, loss

    return gpt, params, opt_state, step


def bench_ours(tokens):
    gpt, params, opt_state, step = build_ours(tokens)
    return _time_scan_steps(step, params, opt_state, tokens)


def _grad_slope(loss_fn, params, tokens, n=2, n2=6):
    """Slope-timed value_and_grad chain; the carry perturbs the embedding
    table and consumes ALL grads (no hoisting, no DCE)."""
    import statistics

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

    r1, r2 = make(n), make(n2)
    float(r1(params, tokens))
    float(r2(params, tokens))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(r1(params, tokens))
        t1 = time.perf_counter()
        float(r2(params, tokens))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n))
    import statistics as st
    return max(st.median(slopes), 1e-9)


def step_breakdown(step_us: float, tokens, probe_tf: float) -> dict:
    """Per-phase attribution of the train step (VERDICT r5 #1): parts sum
    to ~step time. Ablation stubs preserve the dataflow shape (a stub that
    drops q/k lets XLA shrink the projection matmuls — the r5 ladder
    measured ~5ms mis-attributed that way; see bench_breakdown.py /
    exp_attn_insitu.py for the full study)."""
    import np_modeling_tpu.ops as ops_mod
    gpt, params, _, _ = build_ours(tokens)
    loss_fn = lambda p, t: gpt.loss(p, t)

    fwdbwd = _grad_slope(loss_fn, params, tokens) * 1e6
    real = ops_mod.flash_attention
    ops_mod.flash_attention = lambda q, k, v, **kw: (
        (q + k + v) * (1.0 / 3.0)).astype(q.dtype)
    try:
        noattn = _grad_slope(loss_fn, params, tokens) * 1e6
    finally:
        ops_mod.flash_attention = real

    def hidden_loss(p, toks):
        h = gpt.apply(p, toks, return_hidden=True)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6
    noloss = _grad_slope(hidden_loss, params, tokens) * 1e6

    attn = fwdbwd - noattn
    head = fwdbwd - noloss
    opt_t = step_us - fwdbwd
    rest = step_us - attn - head - opt_t
    # Analytic cost of each bucket at probe speed (same FLOP conventions
    # as step_flops) — "excess" is the measured minus ideal.
    s, d = SEQ, D_MODEL
    at_probe = lambda f: f / probe_tf / 1e6   # flops -> us at probe
    attn_ideal = at_probe(3 * BATCH * LAYERS * 4 * s * s * d * 0.5)
    head_ideal = at_probe(3 * BATCH * 2 * s * d * VOCAB)
    rest_ideal = at_probe(3 * BATCH * LAYERS * (8 * s * d * d
                                                + 4 * s * d * FFN))
    return {
        "fwdbwd_us": round(fwdbwd, 1),
        "attention_us": round(attn, 1),
        "head_loss_us": round(head, 1),
        "optimizer_us": round(opt_t, 1),
        "rest_matmul_ln_embed_us": round(rest, 1),
        "sum_check_vs_step": round((attn + head + opt_t + rest)
                                   / max(step_us, 1e-9), 3),
        "ideal_at_probe_us": {"attention": round(attn_ideal, 1),
                              "head_loss": round(head_ideal, 1),
                              "rest_matmul": round(rest_ideal, 1)},
    }


def attn_roofline(probe_tf: float) -> dict:
    """Shape-aware flash-forward ceiling (VERDICT r5 #6): a causal flash
    kernel at (bq, bkv) tiles must run 2 MXU matmuls per tile plus
    mandatory VPU softmax passes over every score element — a pure-matmul
    probe is not a ceiling it can reach. Measures this chip's VPU rates
    same-process and returns ceiling TF/s (analytic-FLOP convention) under
    perfect MXU/VPU overlap.

    The ceiling models VPU work as ONE exp pass per score element,
    overlapped with the MXU. Evidence this is the right model (r5 smoke,
    probe 175.4): the kernel's exposed non-MXU time at the headline shape
    (1330us total - 980us MXU = 350us over 268M elements = 766 Gelem/s)
    matches the measured pure-exp VPU rate (792 Gelem/s) — Mosaic's
    running-max/sum reductions overlap into the matmul pipeline and cost
    ~nothing exposed. An XLA-chained softmax pipeline (115.8 Gelem/s)
    overcounts in-kernel cost ~7x and yields a "ceiling" BELOW achieved
    perf (as unfalsifiable as one above 100%); it is kept only as the
    vpu_softmax_gelem_s diagnostic rate.

    Methodology note (r5): rates must be slope-timed on an IN-REGISTER
    chain (16 applications over a 1MB tile per scan step) — a one-pass
    microbench over an HBM-size array measures HBM bandwidth
    (~87-159 Gelem/s), not the VPU."""
    import bench_probe
    n = 512
    reps = 16
    x = jax.random.normal(jax.random.PRNGKey(7), (n, n), jnp.float32)

    def exp_chain(c):
        for _ in range(reps):
            c = jnp.exp(-jnp.abs(c) * (1.0 / reps))
        return c
    t_exp = bench_probe._timed_scan(exp_chain, x, n=32, n2=160) / reps

    def softmax_stats(c):
        for _ in range(reps):
            m = jnp.max(c, axis=1, keepdims=True)
            p = jnp.exp(c - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            c = p * (1.0 / l)
        return c
    t_sm = bench_probe._timed_scan(softmax_stats, x, n=16, n2=80) / reps
    exp_rate = n * n / t_exp          # elements/s, one transcendental pass
    sm_rate = n * n / t_sm            # elements/s, full statistics pipeline

    b, h, s, dk = BATCH, HEADS, SEQ, D_MODEL // HEADS
    bq = bkv = min(1024, s)
    nq = max(s // bq, 1)
    tiles = b * h * nq * (nq + 1) // 2          # causal lower triangle
    tile_elems = bq * bkv
    t_mxu = tiles * 4 * tile_elems * dk / (probe_tf * 1e12)
    t_vpu_strict = tiles * tile_elems / exp_rate
    flops = 4 * b * h * s * s * dk * 0.5        # analytic convention
    return {
        "vpu_exp_gelem_s": round(exp_rate / 1e9, 1),
        "vpu_softmax_gelem_s": round(sm_rate / 1e9, 1),
        "mxu_us": round(t_mxu * 1e6, 1),
        "vpu_exp_pass_us": round(t_vpu_strict * 1e6, 1),
        "ceiling_tflops": round(
            flops / max(t_mxu, t_vpu_strict) / 1e12, 1),
    }


def bench_flax(tokens):
    import flax.linen as fnn
    import optax

    class Block(fnn.Module):
        @fnn.compact
        def __call__(self, x, mask):
            skip = x
            y = fnn.LayerNorm(epsilon=1e-3, dtype=DTYPE)(x)
            y = fnn.MultiHeadDotProductAttention(
                HEADS, qkv_features=D_MODEL, out_features=D_MODEL,
                dtype=DTYPE)(y, y, mask=mask)
            y = y + skip
            skip = y
            z = fnn.LayerNorm(epsilon=1e-3, dtype=DTYPE)(y)
            z = fnn.relu(fnn.Dense(FFN, dtype=DTYPE)(z))
            z = fnn.Dense(D_MODEL, dtype=DTYPE)(z)
            return z + skip

    class FlaxGPT(fnn.Module):
        @fnn.compact
        def __call__(self, toks):
            x = fnn.Embed(VOCAB, D_MODEL, dtype=DTYPE)(toks)
            x = x + fnn.Embed(SEQ, D_MODEL, dtype=DTYPE)(
                jnp.arange(toks.shape[-1]))
            mask = fnn.make_causal_mask(toks)
            for _ in range(LAYERS):
                x = Block()(x, mask)
            x = fnn.LayerNorm(epsilon=1e-3, dtype=DTYPE)(x)
            return fnn.Dense(VOCAB, use_bias=False)(x).astype(jnp.float32)

    model = FlaxGPT()
    params = model.init(jax.random.PRNGKey(0), tokens)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, toks):
        logits = model.apply(p, toks[:, :-1])
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, toks[:, 1:]))

    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    return _time_scan_steps(step, params, opt_state, tokens)


def kernel_mfu(probe_tf: float, probes: list) -> dict:
    """Per-kernel utilization vs the run-median probe, plus the decisive
    same-run comparison for attention: ours vs JAX's official
    ``pallas.ops.tpu.flash_attention`` with BOTH sides swept over block
    configs (VERDICT r5 #3: competitor-tuning symmetry on the forward too;
    jax-FA's get_default bwd blocks measured 8x slower than ours — sweeps
    are the only honest comparison). Also reports utilization against the
    measured attention ROOFLINE (VERDICT r5 #6): a flash kernel cannot
    reach a pure-matmul ceiling (mandatory VPU softmax passes), so %-of-
    probe is reported next to %-of-attainable."""
    import bench_probe
    from np_modeling_tpu import ops
    from np_modeling_tpu.ops import dispatch
    from np_modeling_tpu.ops.matmul import matmul

    out = {}
    n = 8192
    x = jnp.ones((n, n), jnp.bfloat16)
    with dispatch.force_pallas(True):
        t = bench_probe._timed_scan(
            lambda c: matmul(c, x, out_dtype=jnp.bfloat16, block_m=512,
                             block_n=1024, block_k=1024), x, n=4)
    # Explicitly a FORCED-kernel diagnostic (VERDICT r3 #8): the library's
    # default matmul path is XLA dot_general (dispatch.py), which IS the
    # probe — this field tracks the hand kernel's documented structural
    # VMEM-accumulator ceiling (ops/matmul.py:92-101), not a served path.
    out["matmul_forced_kernel_diagnostic"] = round(
        2 * n**3 / t / 1e12 / probe_tf, 3)

    b, h, s, d = BATCH, HEADS, SEQ, D_MODEL // HEADS
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, d),
                                                 dtype=np.float32)
                             ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    sc = 1.0 / (d ** 0.5)

    from jax.experimental.pallas.ops.tpu import flash_attention as jfa

    def jfa_fwd_blocks(bq, bk):
        return jfa.BlockSizes(block_q=bq, block_k_major=bk, block_k=bk,
                              block_b=1)

    # Configs: each side's r5-sweep winner plus its two runners-up
    # (exp_fwd_sweep.py: ours 512x512 > 1024x1024 > 1024x512; jax
    # 512x512 > 1024x1024 > 512x1024).
    fwd_variants = {
        "ours": lambda qc: ops.flash_attention(qc, k, v, causal=True),
        "ours_1024x1024": lambda qc: ops.flash_attention(
            qc, k, v, causal=True, block_q=1024, block_kv=1024),
        "ours_1024x512": lambda qc: ops.flash_attention(
            qc, k, v, causal=True, block_q=1024, block_kv=512),
        "jax": lambda qc: jfa.flash_attention(qc, k, v, causal=True,
                                              sm_scale=sc,
                                              block_sizes=jfa_fwd_blocks(
                                                  1024, 1024)),
        "jax_512x512": lambda qc: jfa.flash_attention(
            qc, k, v, causal=True, sm_scale=sc,
            block_sizes=jfa_fwd_blocks(512, 512)),
        "jax_512x1024": lambda qc: jfa.flash_attention(
            qc, k, v, causal=True, sm_scale=sc,
            block_sizes=jfa_fwd_blocks(512, 1024)),
    }

    def grad_of(fn):
        # Differentiate wrt q, k, AND v and consume all three grads —
        # grad-wrt-q-only lets XLA DCE the whole dkv kernel (round-2's
        # bench_mfu overstated backward MFU this way).
        def run(qc):
            g = jax.grad(lambda t: jnp.sum(
                fn(t[0], t[1], t[2]).astype(jnp.float32) ** 2))((qc, k, v))
            return (qc + 0.0001 * (g[0] + g[1] + g[2])).astype(jnp.bfloat16)
        return run

    # Competitor tuning symmetry (VERDICT r3 #3): the jax-FA backward is
    # swept over block configs (the fwd already gets hand-picked jfa_bs)
    # and the BEST jax time is the comparison point — the headline
    # "vs jax FA" ratios are against a tuned competitor on both passes.
    def jfa_bwd_blocks(bq, bk):
        return jfa.BlockSizes(
            block_q=1024, block_k_major=1024, block_k=1024, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk,
            block_q_dq=bq)

    # jax-FA's BlockSizes.get_default bwd measured 8x slower than ours
    # (r5 in-situ ladder) — it is dropped from the sweep as a waste of
    # tunnel time; the tuned 1024/512 configs are the real competitors.
    bwd_variants = {
        "ours": grad_of(lambda qc, kc, vc: ops.flash_attention(
            qc, kc, vc, causal=True)),
        "jax_1024": grad_of(lambda qc, kc, vc: jfa.flash_attention(
            qc, kc, vc, causal=True, sm_scale=sc,
            block_sizes=jfa_bwd_blocks(1024, 1024))),
        "jax_512": grad_of(lambda qc, kc, vc: jfa.flash_attention(
            qc, kc, vc, causal=True, sm_scale=sc,
            block_sizes=jfa_bwd_blocks(512, 512))),
    }

    # Chain lengths: a ~1.2ms fwd kernel at n=4/n2=12 puts the 8-iteration
    # device-time difference (~10ms) inside the tunnel's RTT drift — a
    # slope can come out <=0 (observed). n=8/n2=40 (fwd) and n=6/n2=24
    # (bwd, ~4.5-7ms/iter) keep the difference at ~40ms+.
    lens = {"fwd": dict(n=8, n2=40), "bwd": dict(n=6, n2=24)}
    times = {}
    for _ in range(2):                    # interleave ours/jax, ours/jax
        for tag, variants in (("fwd", fwd_variants), ("bwd", bwd_variants)):
            for name, fn in variants.items():
                t = bench_probe._timed_scan(fn, q, **lens[tag])
                times.setdefault((tag, name), []).append(t)
        probes.append(bench_probe.probe())
    attn_flops = 4 * b * h * s * s * d * 0.5
    best = lambda tag, pre: min(
        min(v) for (tg, name), v in times.items()
        if tg == tag and name.startswith(pre))
    t_fwd = best("fwd", "ours")
    t_bwd = best("bwd", "ours")
    out["attn_fwd"] = round(attn_flops / t_fwd / 1e12 / probe_tf, 3)
    # fwd 4bhs2d + split bwd 10bhs2d (7 matmuls, 2 recomputes), causal half.
    out["attn_fwdbwd"] = round(3.5 * attn_flops / t_bwd / 1e12 / probe_tf, 3)
    out["attn_fwd_vs_jax_fa"] = round(best("fwd", "jax") / t_fwd, 3)
    out["attn_fwdbwd_vs_jax_fa"] = round(best("bwd", "jax") / t_bwd, 3)
    out["attn_fwd_us"] = round(t_fwd * 1e6, 1)
    out["attn_fwd_jax_swept_us"] = round(best("fwd", "jax") * 1e6, 1)

    # Roofline (VERDICT r5 #6): utilization vs a ceiling a flash kernel
    # can actually reach (MXU matmuls + mandatory VPU softmax passes,
    # rates measured same-process). Failure-isolated: a roofline crash
    # must not take the kernel ratios down with it.
    fwd_tf = attn_flops / t_fwd / 1e12
    try:
        rf = attn_roofline(probe_tf)
        out["attn_roofline"] = rf
        out["attn_fwd_vs_roofline"] = round(
            fwd_tf / rf["ceiling_tflops"], 3)
    except Exception as e:      # noqa: BLE001 — report, don't die
        out["attn_roofline_error"] = repr(e)[:200]
    return out


def serving_tok_per_s() -> dict:
    """Aggregate engine decode throughput (driver-visible serving number,
    VERDICT r2 #7): 8 live sequences at 512-token context on a 4L/d1024
    GPT, bf16 KV pages, one jitted step_many dispatch for 64 tokens x all
    slots. bench_serving.py has the full per-config study.

    ANCHORED (VERDICT r3 #4): also measures a same-run DENSE-cache decode
    of the same workload (contiguous [8, 576] KV caches, one jitted
    64-step scan — the no-paging baseline) and reports the ratio, so the
    artifact distinguishes an engine regression from chip drift."""
    from np_modeling_tpu import models
    from np_modeling_tpu.serving import GenerationEngine
    rng = np.random.default_rng(0)
    cfg = models.GPTConfig(vocab_size=8192, d_model=1024, num_heads=8,
                           num_layers=4, hidden_units=4096, max_len=2048,
                           dtype=jnp.bfloat16)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 128), jnp.int32))
    prompts = {s: jnp.asarray(rng.integers(0, 8192, (512,)))
               for s in range(8)}
    n = 64

    # Dense baseline: contiguous per-slot caches, jitted decode scans.
    # Both sides are SLOPE-timed between two chain lengths so the ~20-45ms
    # per-readback tunnel round trip cancels (it was ~20% of a naive
    # per-step number at these step times).
    batch = jnp.stack([prompts[s] for s in range(8)])

    def make_dense(steps):
        @jax.jit
        def dense_decode(params, batch):
            caches = gpt.init_cache(8, 512 + steps + 1, dtype=jnp.bfloat16)
            logits, caches = gpt.apply(params, batch, caches=caches,
                                       decode=True, logits_last_only=True)
            tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

            def body(carry, _):
                tok, caches = carry
                lg, caches = gpt.apply(params, tok[:, None], caches=caches,
                                       decode=True)
                return (jnp.argmax(lg[:, -1], -1).astype(jnp.int32),
                        caches), tok

            (_, _), toks = jax.lax.scan(body, (tok0, caches), None,
                                        length=steps - 1)
            return toks
        return dense_decode

    d1, d2 = make_dense(n), make_dense(3 * n)
    jax.block_until_ready(d1(params, batch))   # compile + warm
    jax.block_until_ready(d2(params, batch))
    t0 = time.perf_counter()
    jax.block_until_ready(d1(params, batch))
    t1 = time.perf_counter()
    jax.block_until_ready(d2(params, batch))
    t2 = time.perf_counter()
    dense_per = ((t2 - t1) - (t1 - t0)) / (2 * n)
    dense_tps = 8 / dense_per

    eng = GenerationEngine(gpt, params, total_pages=160, page_size=64,
                           max_seqs=8, kv_dtype=jnp.bfloat16)
    eng.add_requests(prompts)
    eng.step_many(n)                       # warm both scan compiles
    eng.step_many(3 * n)
    t0 = time.perf_counter()
    eng.step_many(n)
    t1 = time.perf_counter()
    eng.step_many(3 * n)
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / (2 * n)
    tps = 8 / per
    res = {"serving_tok_per_s": round(tps, 0),
           "serving_vs_dense": round(tps / dense_tps, 3),
           "dense_tok_per_s": round(dense_tps, 0),
           "engine_table_pages": int(eng._state["table"].shape[1])}

    # --- attribution (VERDICT r5 #2): where the engine's time goes -------
    # (a) sampling: both sides above decode GREEDY (engine default
    #     temperature=0 -> argmax), so sampling contributes nothing here.
    # (b) paged kernel vs a dense-attention micro at the engine's shapes
    #     (the r5 fold: the old (b, hkv, blocks) grid was overhead-bound;
    #     fold_heads collapses it — 2.6-2.9x, exp_paged_fold.py).
    import bench_probe
    from np_modeling_tpu import ops
    hkv, d = HEADS, D_MODEL // HEADS
    for ctx, tag in ((1024, "ctx1k"), (4096, "ctx4k")):
        tw = ctx // 64
        total = max(tw * 8 + 2, 176)
        kq, kk, kv2 = jax.random.split(jax.random.PRNGKey(3), 3)
        qd = jax.random.normal(kq, (8, hkv, d), jnp.bfloat16)
        kp = jax.random.normal(kk, (hkv, total, 64, d), jnp.bfloat16)
        vp = jax.random.normal(kv2, (hkv, total, 64, d), jnp.bfloat16)
        lengths = jnp.full((8,), ctx, jnp.int32)
        table = jnp.arange(8 * tw, dtype=jnp.int32).reshape(8, tw)
        # Long chains: at ctx1k the folded kernel is ~25-70us/iter, so an
        # 80-iteration difference (~2-5ms) sits inside tunnel RTT drift —
        # the r5 run read a 0.0 slope that way. 512 extra iterations put
        # ~15-40ms in the difference.
        t_fold = bench_probe._timed_scan(
            lambda qc: ops.paged_attention(qc, kp, vp, lengths, table),
            qd, n=64, n2=576)
        kd = jnp.moveaxis(kp[:, :tw * 8].reshape(hkv, 8, tw * 64, d), 1, 0)
        vd = jnp.moveaxis(vp[:, :tw * 8].reshape(hkv, 8, tw * 64, d), 1, 0)

        def dense_attn(qc):
            sm = jnp.einsum("bhd,bhkd->bhk", qc.astype(jnp.float32),
                            kd.astype(jnp.float32)) * (d ** -0.5)
            p = jax.nn.softmax(sm, axis=-1)
            return jnp.einsum("bhk,bhkd->bhd", p,
                              vd.astype(jnp.float32)).astype(qc.dtype)
        t_dense = bench_probe._timed_scan(dense_attn, qd, n=64, n2=576)
        res[f"paged_kernel_{tag}_us"] = round(t_fold * 1e6, 1)
        res[f"dense_attn_{tag}_us"] = round(t_dense * 1e6, 1)

    # (c) int8-weight FFN decode (VERDICT r5 #7): same-process engine row
    #     with fused int8 matmul weights vs the matched bf16-weight row.
    from np_modeling_tpu.ops import quantize_params_int8
    from np_modeling_tpu.parallel.sharding import _path_str
    import re as _re
    pat = _re.compile(r".*(dense1/linear/w|dense2/w)$")
    bf16_params = jax.tree_util.tree_map_with_path(
        lambda kp_, v_: v_.astype(jnp.bfloat16)
        if pat.match(_path_str(kp_)) and v_.ndim >= 2 else v_, params)
    qparams = quantize_params_int8(
        params, match=r".*(dense1/linear/w|dense2/w)$")
    rowt = {}
    for tag, p in (("bf16w", bf16_params), ("int8w", qparams)):
        e2 = GenerationEngine(gpt, p, total_pages=176, page_size=64,
                              max_seqs=8, kv_dtype=jnp.bfloat16)
        e2.add_requests({s: prompts[s] for s in range(8)})
        e2.step_many(n)
        e2.step_many(3 * n)
        t0 = time.perf_counter()
        e2.step_many(n)
        t1 = time.perf_counter()
        e2.step_many(3 * n)
        t2 = time.perf_counter()
        rowt[tag] = ((t2 - t1) - (t1 - t0)) / (2 * n)
    res["int8w_speedup_vs_bf16_weights"] = round(
        rowt["bf16w"] / rowt["int8w"], 3)
    return res


def _chip_reachable(timeout: int = 300) -> bool:
    """Probe the TPU in a SUBPROCESS with a timeout. The tunneled chip
    occasionally goes fully unreachable — sometimes jax.devices() hangs,
    but the r5 outage mode is nastier: devices() returns fine and the
    first TRANSFER or DISPATCH blocks forever. Probe an actual tiny
    matmul readback, so a half-dead tunnel fails here in minutes instead
    of hanging the measurement child to its full BENCH_TIMEOUT."""
    import subprocess
    import sys
    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((128, 128)); "
            "assert float((x @ x).sum()) == 128.0 * 128 * 128")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _error_line(msg: str, partial: dict | None = None) -> None:
    line = {
        "metric": f"gpt_4L_d1024_h8_s{SEQ}_b{BATCH}_train_step",
        "value": 0.0,
        "unit": "us/step",
        "vs_baseline": 0.0,
        "error": msg,
    }
    if partial:
        line["partial"] = partial
    print(json.dumps(line))


def _measure():
    """The actual measurement (runs in the watchdog child, see main()).

    After each phase a ``BENCH_PARTIAL <json>`` line goes to stderr so the
    parent can report last-known-good numbers if the chip hangs mid-run
    (observed: the tunnel passes the reachability probe, then a later
    dispatch blocks forever).

    ONE probe, ONE denominator (VERDICT r5 #4): probes are taken at phase
    boundaries through the run and every MFU field divides by their
    MEDIAN; the raw points, the first probe's per-rep slope samples, and
    the device kind are all in the artifact."""
    import statistics
    import sys

    import bench_probe

    acc = {}

    def partial(**kv):
        acc.update(kv)
        print("BENCH_PARTIAL " + json.dumps(acc), file=sys.stderr, flush=True)

    device_kind = jax.devices()[0].device_kind
    nominal = NOMINAL_BF16_PEAK.get(device_kind)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, VOCAB, (BATCH, SEQ)))
    p0, p0_raw = bench_probe.probe(raw=True)
    probes = [p0]
    partial(device_kind=device_kind, probe_points=[round(p0, 1)],
            probe_rep_slopes_tflops=p0_raw)
    ours = bench_ours(tokens)
    partial(step_us=round(ours * 1e6, 1))
    flax_t = bench_flax(tokens)
    partial(vs_baseline=round(flax_t / ours, 4))
    probes.append(bench_probe.probe())

    # Per-phase attribution of the step (VERDICT r5 #1).
    probe_mid = statistics.median(probes)
    breakdown = step_breakdown(ours * 1e6, tokens, probe_mid)
    partial(step_breakdown=breakdown)
    probes.append(bench_probe.probe())

    kmfu = kernel_mfu(statistics.median(probes), probes)
    partial(kernel_mfu_vs_probe=kmfu)
    serving = serving_tok_per_s()
    partial(**serving)
    probes.append(bench_probe.probe())

    # Per-layer fwd+bwd vs Flax (BASELINE.json's stated metric,
    # VERDICT r5 #7) — slope-timed in bench_layers.
    import bench_layers
    per_layer = {}
    for fn in (bench_layers.bench_dense, bench_layers.bench_layernorm,
               bench_layers.bench_mha, bench_layers.bench_conv):
        name, ours_t, flax_tt = fn()
        per_layer[name] = {"ours_us": round(ours_t * 1e6, 1),
                           "flax_us": round(flax_tt * 1e6, 1),
                           "speedup": round(flax_tt / ours_t, 3)}
    partial(per_layer_vs_flax=per_layer)
    probes.append(bench_probe.probe())

    probe_tf = statistics.median(probes)
    tflops = step_flops() / ours / 1e12
    line = {
        "metric": f"gpt_4L_d1024_h8_s{SEQ}_b{BATCH}_train_step",
        "value": round(ours * 1e6, 1),
        "unit": "us/step",
        "vs_baseline": round(flax_t / ours, 4),
        "tflops": round(tflops, 1),
        "device_kind": device_kind,
        "probe_tflops": round(probe_tf, 1),
        "probe_points": [round(p, 1) for p in probes],
        "probe_rep_slopes_tflops": p0_raw,
        "step_mfu_vs_probe": round(tflops / probe_tf, 4),
        "step_breakdown": breakdown,
        "kernel_mfu_vs_probe": kmfu,
        **serving,
        "per_layer_vs_flax": per_layer,
    }
    if nominal is not None:
        line["mfu_vs_nominal_peak"] = round(tflops * 1e12 / nominal, 4)
        line["probe_vs_nominal_peak"] = round(probe_tf * 1e12 / nominal, 4)
    print(json.dumps(line))


def main():
    """Watchdog wrapper: the measurement runs in a CHILD process under a
    hard timeout (env BENCH_TIMEOUT, default 3600s). The tunneled chip can
    hang on any dispatch — not just the first (seen: reachability probe
    passes, a later compile/readback blocks >20min) — and a hung bench
    stalls the whole round. On timeout/crash, emit an error JSON line
    carrying the child's last BENCH_PARTIAL phase results."""
    import os
    import subprocess
    import sys

    if os.environ.get("BENCH_CHILD") == "1":
        _measure()
        return
    for attempt in range(3):
        if _chip_reachable():
            break
        if attempt == 2:
            _error_line("TPU unreachable (tiny-matmul readback hung past "
                        "the probe timeout, 3 attempts over ~15min); no "
                        "measurement possible this run")
            return
        time.sleep(120)
    # 3600: the r5 run hit the old 3300 during the last (per-layer) phase;
    # the child prints BENCH_PARTIAL checkpoints, so a long leash only
    # risks driver patience, not losing the measurement.
    timeout = int(os.environ.get("BENCH_TIMEOUT", "3600"))
    env = dict(os.environ, BENCH_CHILD="1")
    try:
        r = subprocess.run([sys.executable, __file__], env=env,
                           timeout=timeout, capture_output=True, text=True)
    except subprocess.TimeoutExpired as e:
        stderr = (e.stderr or b"")
        if isinstance(stderr, bytes):
            stderr = stderr.decode(errors="replace")
        part = _last_partial(stderr)
        if part and "step_us" in part and "vs_baseline" in part:
            # Core phases completed before the stall: promote the partial
            # to a valid (flagged) line instead of discarding it.
            tflops = step_flops() / (part["step_us"] * 1e-6) / 1e12
            line = {
                "metric": f"gpt_4L_d1024_h8_s{SEQ}_b{BATCH}_train_step",
                "value": part["step_us"],
                "unit": "us/step",
                "vs_baseline": part["vs_baseline"],
                "tflops": round(tflops, 1),
                "partial_after_stall": True,
                **{k: v for k, v in part.items()
                   if k not in ("step_us", "vs_baseline")},
            }
            if part.get("probe_points"):
                import statistics
                pm = statistics.median(part["probe_points"])
                line["probe_tflops"] = round(pm, 1)
                line["step_mfu_vs_probe"] = round(tflops / pm, 4)
            print(json.dumps(line))
            return
        _error_line(f"bench child hung past {timeout}s (TPU tunnel stall "
                    "mid-run); partial = last completed phases", part)
        return
    out = [ln for ln in r.stdout.splitlines() if ln.strip().startswith("{")]
    if out:
        # A complete final line beats the partial fallback even if the
        # child crashed during teardown AFTER measuring (ADVICE r4).
        print(out[-1])
        if r.returncode != 0:
            import sys
            print(f"bench child exited rc={r.returncode} after printing "
                  "the final line (teardown crash); result kept",
                  file=sys.stderr)
        return
    tail = "\n".join(r.stderr.splitlines()[-8:])
    _error_line(f"bench child exited rc={r.returncode}: {tail[-500:]}",
                _last_partial(r.stderr))


def _last_partial(stderr: str) -> dict | None:
    last = None
    for ln in (stderr or "").splitlines():
        if ln.startswith("BENCH_PARTIAL "):
            try:
                last = json.loads(ln[len("BENCH_PARTIAL "):])
            except json.JSONDecodeError:
                pass
    return last


if __name__ == "__main__":
    main()
