"""A/B the fused LM-head loss dtype path (r5): x in bf16 (new: matmuls in
x.dtype, bf16 table streaming) vs x in fp32 (reproduces the old
unconditional-fp32 behavior — jax's DEFAULT matmul precision already ran
those matmuls as bf16 one-pass, so the candidate win is the halved
table/operand HBM traffic inside the chunk scan, not MXU time).
Also sweeps the chunk size. Slope-timed, one process.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from bench import BATCH, SEQ, D_MODEL, VOCAB
from exp_attn_insitu import _slope


def loss_chain(hidden, table, labels, chunk, n=4, n2=20):
    from np_modeling_tpu import ops

    def make(length):
        @jax.jit
        def run(h, tb):
            def body(c, _):
                def f(args):
                    return ops.fused_lm_head_loss(args[0], args[1], labels,
                                                  chunk=chunk)
                val, g = jax.value_and_grad(f)((c, tb))
                return (c + g[0] * 1e-30 + val * 1e-30
                        + jnp.sum(g[1]) * 1e-30).astype(c.dtype), None
            h2, _ = jax.lax.scan(body, h, None, length=length)
            return jnp.sum(h2.astype(jnp.float32))
        return run
    return _slope(make, (hidden, table), n, n2)


def main():
    res = {"probe0": round(bench_probe.probe(), 1)}
    n_tok = BATCH * SEQ
    hidden = jax.random.normal(jax.random.PRNGKey(2), (n_tok, D_MODEL),
                               jnp.bfloat16)
    table = jax.random.normal(jax.random.PRNGKey(3), (VOCAB, D_MODEL),
                              jnp.float32) * 0.02
    labels = jnp.asarray(
        np.random.default_rng(0).integers(0, VOCAB, (n_tok,)))

    for chunk in (512, 1024, 2048, 4096):
        res[f"bf16_c{chunk}_us"] = round(loss_chain(
            hidden, table, labels, chunk) * 1e6, 1)
    res["probe1"] = round(bench_probe.probe(), 1)
    res["f32_c512_us"] = round(loss_chain(
        hidden.astype(jnp.float32), table, labels, 512) * 1e6, 1)
    res["f32_c2048_us"] = round(loss_chain(
        hidden.astype(jnp.float32), table, labels, 2048) * 1e6, 1)
    res["probe2"] = round(bench_probe.probe(), 1)
    # Matmul-only floor at the same shapes (head pair fwd+bwd ~ 3 gemms).
    flops = 3 * 2 * n_tok * D_MODEL * VOCAB
    best = min(v for k, v in res.items() if k.startswith("bf16"))
    res["best_bf16_tflops"] = round(flops / (best * 1e-6) / 1e12, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
