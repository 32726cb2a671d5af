"""Kernel MFU harness: measured FLOP/s vs roofline (BASELINE.json:5 bar).

Reports matmul and flash-attention utilization against (a) the v5e nominal
peak (394 TFLOP/s bf16) and (b) this host's *measured* achievable peak (a
large plain-XLA matmul — the tunneled single chip tops out well below
nominal, so (b) is the honest roofline for relative kernel quality).

Timing: K iterations chained in one jit + scalar readback (tunnel-safe).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NOMINAL_BF16 = 394e12
K = 10


def _time(run, *args):
    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def _chain(fn, x):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(c.astype(jnp.float32))
    return run


def measured_peak():
    n = 8192
    x = jnp.ones((n, n), jnp.bfloat16)
    w = jnp.ones((n, n), jnp.bfloat16)
    run = _chain(lambda c: jnp.dot(c, w, preferred_element_type=jnp.bfloat16), x)
    t = _time(run, x)
    return 2 * n**3 / t


def matmul_mfu(peak):
    from np_modeling_tpu.ops.matmul import matmul
    from np_modeling_tpu.ops import dispatch
    n = 8192  # compute-bound regime (4k is HBM/dispatch-bound on this host)
    x = jnp.ones((n, n), jnp.bfloat16)
    w = jnp.ones((n, n), jnp.bfloat16)
    with dispatch.force_pallas(True):
        run = _chain(lambda c: matmul(c, w, out_dtype=jnp.bfloat16,
                                      block_m=512, block_n=1024,
                                      block_k=1024), x)
        t = _time(run, x)
    flops = 2 * n**3
    return flops / t, flops / t / peak


def attention_mfu(peak, causal=True):
    from np_modeling_tpu import ops
    b, h, s, d = 2, 8, 4096, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32)
                    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32)
                    ).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32)
                    ).astype(jnp.bfloat16)

    def fwdbwd(qc):
        # grad wrt q, k, AND v (consume all three) — grad-wrt-q-only lets
        # XLA DCE the dkv kernel and overstates backward MFU.
        g = jax.grad(lambda t: jnp.sum(
            ops.flash_attention(t[0], t[1], t[2], causal=causal
                                ).astype(jnp.float32) ** 2))((qc, k, v))
        return (qc + 0.0001 * (g[0] + g[1] + g[2])).astype(jnp.bfloat16)

    run = _chain(fwdbwd, q)
    t = _time(run, q)
    # fwd 4bhs²d + bwd 10bhs²d (dq+dkv recompute); causal halves the work.
    flops = 14 * b * h * s * s * d * (0.5 if causal else 1.0)
    return flops / t, flops / t / peak


def main():
    peak_meas = measured_peak()
    mm_fs, _ = matmul_mfu(peak_meas)
    at_fs, _ = attention_mfu(peak_meas)
    out = {
        "measured_host_peak_tflops": round(peak_meas / 1e12, 1),
        "nominal_v5e_bf16_tflops": NOMINAL_BF16 / 1e12,
        "pallas_matmul_tflops": round(mm_fs / 1e12, 1),
        "pallas_matmul_mfu_vs_measured": round(mm_fs / peak_meas, 3),
        "flash_attention_fwdbwd_tflops": round(at_fs / 1e12, 1),
        "flash_attention_mfu_vs_measured": round(at_fs / peak_meas, 3),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
