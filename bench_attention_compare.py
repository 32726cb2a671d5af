"""Same-run comparison: our flash kernel vs JAX's official TPU kernels.

The north-star check for "speed-of-light attention on this hardware": run
OUR Pallas flash kernel head-to-head against the two reference TPU
implementations that ship with JAX — `jax.experimental.pallas.ops.tpu.
flash_attention` (the classic FA kernel) and `splash_attention` (the
newer sparse-flash family) — at the headline training shape, interleaved
in ONE process with chip probes (this tunneled chip drifts ~4x across
sessions; only same-run ratios mean anything).

MEASURED (2026-08-17, probe 154-162 TF/s, b4 h8 s4096 d128 causal bf16,
forward): ours 4.69 ms, jax flash_attention 4.57 ms (best block config,
1024^2), splash 4.87 ms (best 512x1024) — all three within ~4% of each
other, i.e. our kernel IS at the practical attention ceiling of this
chip. Ablations (.ablate_fwd-style: strip causal mask / online-softmax
max bookkeeping / VPU row-sum) move the forward < 6%, so the bound is
the score-matmul pipeline itself (d=128 contraction), not our tile math.

Prints one JSON line per implementation with same-run probe TF/s.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

import bench_probe

B, H, S, D = 4, 8, 4096, 128


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.standard_normal((B, H, S, D), dtype=np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    fl = 4 * B * H * S * S * D * 0.5
    sc = 1.0 / np.sqrt(D)

    def ours(qc):
        from np_modeling_tpu import ops
        return ops.flash_attention(qc, k, v, causal=True)

    def jax_fa(qc):
        from jax.experimental.pallas.ops.tpu import flash_attention as jfa
        bs = jfa.BlockSizes(block_q=1024, block_k_major=1024, block_k=1024,
                            block_b=1)
        return jfa.flash_attention(qc, k, v, causal=True, sm_scale=sc,
                                   block_sizes=bs)

    def splash(qc):
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk, splash_attention_mask as sm)
        mask = sm.MultiHeadMask([sm.CausalMask((S, S)) for _ in range(H)])
        bs = sk.BlockSizes(block_q=512, block_kv=1024, block_kv_compute=1024)
        kern = jax.vmap(sk.make_splash_mha(mask=mask, head_shards=1,
                                           q_seq_shards=1, block_sizes=bs))
        return kern(qc * sc, k, v)

    def grad_of(fn):
        # Sum all three input grads so neither backward kernel is DCE'd.
        g = jax.grad(
            lambda qc, kc, vc: jnp.sum(fn(qc, kc, vc).astype(jnp.float32)),
            argnums=(0, 1, 2))
        return lambda qc: sum(g(qc, k, v))

    def run_set(tag, variants, flops):
        probe0 = bench_probe.probe()
        times = {}
        for _ in range(2):                  # interleave A/B/C, A/B/C
            for name, fn in variants.items():
                t = bench_probe._timed_scan(fn, q, n=8)
                times.setdefault(name, []).append(t)
        probe1 = bench_probe.probe()
        base = min(times["ours"])
        for name, ts in times.items():
            t = min(ts)
            print(json.dumps({
                "metric": f"attn_{tag}_{name}_b{B}h{H}s{S}d{D}_causal",
                "value": round(t * 1e6, 1),
                "unit": "us",
                "tflops": round(flops / t / 1e12, 1),
                "ours_over_this": round(t / base, 3),
                "probe_tflops": round(min(probe0, probe1), 1),
            }))

    run_set("fwd", {"ours": ours, "jax_flash_attention": jax_fa,
                    "splash_attention": splash}, fl)

    # fwd+bwd: ideal-recompute FLOP count is 3.5x the forward (2 fwd
    # matmul-units + 5 bwd incl. one score recompute). splash's bwd wants
    # its own block-size tuning; compare against jax flash_attention.
    def ours3(qc, kc, vc):
        from np_modeling_tpu import ops
        return ops.flash_attention(qc, kc, vc, causal=True)

    def jax_fa3(qc, kc, vc):
        from jax.experimental.pallas.ops.tpu import flash_attention as jfa
        bs = jfa.BlockSizes.get_default(B, H, S, S, D)
        return jfa.flash_attention(qc, kc, vc, causal=True, sm_scale=sc,
                                   block_sizes=bs)

    run_set("fwdbwd", {"ours": grad_of(ours3),
                       "jax_flash_attention": grad_of(jax_fa3)}, 3.5 * fl)


if __name__ == "__main__":
    main()
