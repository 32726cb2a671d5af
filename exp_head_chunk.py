"""Fused LM-head loss chunk sweep (r5, step_breakdown's head bucket).

BENCH r5 partial: head_loss in-situ 8.9ms vs 4.7ms ideal-at-probe (3x
analytic convention). The bwd's real matmul count is 4 units (recompute +
dx + dtable), floor ~6.3ms — but chunk=512 also drags the [V, d] fp32
dtable accumulator (33.5MB) through a 32-iteration scan: ~67MB read+write
per iter = ~2.1GB of pure accumulator HBM traffic (~2.6ms at 819GB/s),
plus 32 re-streams of the 16.8MB bf16 head table per pass. Fewer, larger
chunks cut both linearly. Sweep, isolated grad slope + in-model A/B.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from bench import BATCH, SEQ, D_MODEL, HEADS, LAYERS, FFN, VOCAB, DTYPE
from np_modeling_tpu import models, ops


def grad_slope(loss_fn, args, n=6, n2=24):
    """args = (x, table, labels); grads wrt (x, table), both consumed."""
    x, table, labels = args

    def run(x0):
        gx, gt = jax.grad(lambda xx, tb: loss_fn(xx, tb, labels),
                          argnums=(0, 1))(x0, table)
        return (x0 + 0.0001 * (gx.astype(jnp.float32)
                               + jnp.sum(gt) * 1e-30)).astype(x0.dtype)
    return bench_probe._timed_scan(run, x, n=n, n2=n2)


def main():
    res = {"probe0": round(bench_probe.probe(), 1)}
    n_total = BATCH * SEQ
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_total, D_MODEL),
                                        dtype=np.float32)).astype(DTYPE)
    table = jnp.asarray(rng.standard_normal((VOCAB, D_MODEL),
                                            dtype=np.float32)) * 0.02
    labels = jnp.asarray(rng.integers(0, VOCAB, (n_total,)))

    iso = {}
    for chunk in (512, 1024, 2048, 4096, 8192, 16384):
        t = grad_slope(
            lambda xx, tb, lb, c=chunk: ops.fused_lm_head_loss(
                xx, tb, lb, chunk=c),
            (x, table, labels))
        iso[chunk] = round(t * 1e6, 1)
        print(f"PARTIAL chunk={chunk} us={iso[chunk]}", flush=True)
    res["isolated_us"] = iso
    res["probe1"] = round(bench_probe.probe(), 1)

    # Unfused comparison at this (small-V) shape: materialized logits.
    t = grad_slope(
        lambda xx, tb, lb: ops.softmax_cross_entropy_with_integer_labels(
            jax.lax.dot_general(xx, tb.astype(xx.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32),
            lb).mean(),
        (x, table, labels))
    res["unfused_us"] = round(t * 1e6, 1)

    # In-model: best chunk vs 512.
    cfg = models.GPTConfig(vocab_size=VOCAB, d_model=D_MODEL,
                           num_heads=HEADS, num_layers=LAYERS,
                           hidden_units=FFN, max_len=SEQ, dtype=DTYPE,
                           fused_loss=True)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(rng.integers(0, VOCAB, (BATCH, SEQ)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)

    import np_modeling_tpu.ops.losses as L
    best = min(iso, key=iso.get)
    for tag, c in (("512", 512), (f"best{best}", best)):
        orig = ops.fused_lm_head_loss

        def patched(xx, tb, lb, *, chunk=512, **kw):
            return orig(xx, tb, lb, chunk=c, **kw)

        ops.fused_lm_head_loss = patched
        try:
            from exp_attn_insitu import _grad_chain
            t = _grad_chain(lambda p, tk: gpt.loss(p, tk), params, tokens)
        finally:
            ops.fused_lm_head_loss = orig
        res[f"model_chunk{tag}_us"] = round(t * 1e6, 1)
        print(f"PARTIAL model chunk={c} us={res[f'model_chunk{tag}_us']}",
              flush=True)
    res["probe2"] = round(bench_probe.probe(), 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
