"""A/B the embedding dtable gradient: scatter-add vs one-hot matmul
(VERDICT r5 #1 — the embed bucket was 5.5ms in-situ, ~6x its traffic
floor). Measures the full-model fwdbwd chain under both EMB_GRAD_MATMUL
settings plus isolated micros, one process, slope-timed.
"""

from __future__ import annotations

import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from bench import BATCH, SEQ, D_MODEL, HEADS, LAYERS, FFN, VOCAB, DTYPE
from exp_attn_insitu import _grad_chain, _slope


def emb_micro(table, ids, n=8, n2=48):
    from np_modeling_tpu import ops

    def make(length):
        @jax.jit
        def run(tb):
            def body(c, _):
                g = jax.grad(lambda t: jnp.sum(
                    ops.embedding_lookup(t, ids).astype(jnp.float32) ** 2)
                )(tb + c * 1e-30)
                return jnp.sum(g), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
            return out
        return run
    return _slope(make, (table,), n, n2)


def main():
    from np_modeling_tpu import models
    import np_modeling_tpu.ops.embedding as emb

    res = {"probe0": round(bench_probe.probe(), 1)}
    cfg = models.GPTConfig(vocab_size=VOCAB, d_model=D_MODEL,
                           num_heads=HEADS, num_layers=LAYERS,
                           hidden_units=FFN, max_len=SEQ, dtype=DTYPE,
                           fused_loss=True)
    gpt = models.GPT(cfg)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, VOCAB, (BATCH, SEQ)))
    params = gpt.init(jax.random.PRNGKey(0), tokens)
    loss_fn = lambda p, t: gpt.loss(p, t)
    table = params["embedding"]["table"]

    for flag, tag in [(False, "scatter"), (True, "matmul")]:
        emb.EMB_GRAD_MATMUL = flag
        res[f"model_fwdbwd_{tag}_us"] = round(
            _grad_chain(loss_fn, params, tokens) * 1e6, 1)
        res[f"micro_emb_{tag}_us"] = round(
            emb_micro(table, tokens) * 1e6, 1)
    emb.EMB_GRAD_MATMUL = None
    res["probe1"] = round(bench_probe.probe(), 1)

    # Correctness on-device: both backwards agree (fp32-accum matmul vs
    # scatter; bf16 dy rounding bounds the diff).
    def g_of(flag):
        emb.EMB_GRAD_MATMUL = flag
        return jax.jit(jax.grad(lambda t: jnp.sum(
            emb.embedding_lookup(t, tokens).astype(jnp.float32) ** 2)))(
                table)
    ga, gb = g_of(False), g_of(True)
    emb.EMB_GRAD_MATMUL = None
    denom = float(jnp.max(jnp.abs(ga))) or 1.0
    res["max_rel_scatter_vs_matmul"] = float(
        jnp.max(jnp.abs(ga - gb))) / denom
    print(json.dumps(res))


if __name__ == "__main__":
    main()
