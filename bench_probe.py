"""Chip-health probe + probe-normalized kernel A/B harness.

The tunneled TPU's attainable throughput varies ~4x across sessions
(shared/virtualized device). Absolute kernel timings are therefore only
meaningful next to a same-run probe: ``probe()`` times a plain bf16 4k
matmul chain (healthy band ~115-125 TFLOP/s measured); ``ab()`` runs
variant thunks interleaved A/B/A/B with probes and reports medians.

Usage:
    python bench_probe.py            # just print current chip health
"""

from __future__ import annotations

import statistics
import time

import jax
import jax.numpy as jnp


def _timed_scan(f, *args, n=8):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = f(*((a[0] + (c * 0).astype(a[0].dtype),) + a[1:]))
            return jnp.sum(out[..., 0, 0].astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return out
    float(run(*args))          # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / n


_PROBE_A = None
_PROBE_N = 8192     # 4k matmuls are HBM-bound on this chip (~33 TF/s is
                    # NORMAL for them); 8k^3 is compute-bound (~122 healthy)


def probe() -> float:
    """Current chip throughput (TFLOP/s) on a plain 8k bf16 matmul chain."""
    global _PROBE_A
    if _PROBE_A is None:
        _PROBE_A = jax.random.normal(jax.random.PRNGKey(0),
                                     (_PROBE_N, _PROBE_N), jnp.bfloat16)
    a = _PROBE_A

    t = _timed_scan(lambda x: x @ a, a, n=4)
    return 2 * _PROBE_N ** 3 / t / 1e12


def ab(variants: dict, rounds: int = 3) -> dict:
    """Interleave variant thunks (each returns seconds) with probes.

    Returns {name: median_seconds, '_probe': median_tflops}. Compare the
    variant medians ONLY within this call's output."""
    times = {k: [] for k in variants}
    probes = []
    for _ in range(rounds):
        probes.append(probe())
        for name, thunk in variants.items():
            times[name].append(thunk())
    probes.append(probe())
    out = {k: statistics.median(v) for k, v in times.items()}
    out["_probe"] = statistics.median(probes)
    return out


if __name__ == "__main__":
    for _ in range(3):
        print(f"chip probe: {probe():.0f} TFLOP/s "
              "(healthy band ~115-125)")
