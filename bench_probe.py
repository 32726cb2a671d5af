"""Chip-health probe + RTT-corrected kernel timing harness.

Round-4 finding (exp_hoist_check.py, committed evidence): the previous
harness was doubly wrong on this tunneled device —

1. ``q + (c*0).astype(dtype)`` does NOT create a loop-carried dependence:
   XLA algebraically folds ``c*0 -> 0`` and then LICM-hoists pure-XLA scan
   bodies (the plain-matmul probe measured ONE matmul + round trip and
   reported it n times). Pallas custom-call bodies are never hoisted, so
   kernel timings scaled correctly — but every per-iter number still
   carried the second error:
2. each ``float(run(...))`` readback pays a ~20-45ms tunnel ROUND TRIP, so
   per-iter values were inflated by RTT/n (~3ms at n=8 — a 1.4ms flash
   forward measured as 4.4ms, and most of the session-to-session "~4x chip
   drift" was RTT drift, not device throughput: slope-measured 8k matmul
   is a stable ~175 TF/s).

Fixes here:
- the carry perturbation is ``c * 1e-30`` (not foldable; still exactly
  zero after the bf16/f32 round at runtime) — bodies are never hoisted;
- ``_timed_scan`` times the SLOPE between two scan lengths (T(n2) -
  T(n1)) / (n2 - n1), cancelling the round trip exactly;
- ``probe()`` slope-times the plain 8k bf16 matmul chain (healthy ~170-180
  TF/s on this chip; the old "115-125 band" was RTT-depressed).

``ab()`` is unchanged in spirit: interleave variants within ONE process
and compare only within a call.
"""

from __future__ import annotations

import statistics
import time

import jax
import jax.numpy as jnp


def _scan_runner(f, n, example_args):
    """Jitted n-iteration chain of f with an unfoldable carry dependence.

    The carry consumes the FULL output (jnp.sum over everything): reducing
    only a slice (the old ``out[..., 0, 0]``) lets XLA dead-code pure-XLA
    bodies down to the sliver that feeds the carry — the old plain-matmul
    probe was computing ONE DOT PRODUCT per iteration. The full sum costs
    one bandwidth pass over the output per iteration (report-noting for
    bandwidth-bound kernels; negligible for compute-bound ones)."""
    @jax.jit
    def run(*a):
        def body(c, _):
            # c * 1e-30 is numerically 0 after the cast but not
            # algebraically foldable, so the body can't be hoisted.
            out = f(*((a[0] + (c * 1e-30).astype(a[0].dtype),) + a[1:]))
            return jnp.sum(out.astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return out
    return run


def _timed_scan(f, *args, n=8, n2=None, reps=3):
    """Per-iteration device time of ``f``, RTT-corrected.

    Times jitted chains of length ``n`` and ``n2`` (default 3n) and
    returns the median slope — the tunnel round trip (constant per
    readback) cancels in the difference. ``reps`` slope samples absorb
    RTT drift between the paired calls."""
    n2 = n2 or 3 * n
    run1 = _scan_runner(f, n, args)
    run2 = _scan_runner(f, n2, args)
    float(run1(*args))                  # compile + warm
    float(run2(*args))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run1(*args))
        t1 = time.perf_counter()
        float(run2(*args))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n))
    return max(statistics.median(slopes), 1e-9)


def rtt() -> float:
    """Median host<->device round trip of a trivial readback (seconds)."""
    x = jnp.float32(1.0)
    f = jax.jit(lambda v: v + 1)
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


_PROBE_A = None
_PROBE_N = 8192     # 8k^3 bf16 is compute-bound; slope-measured healthy
                    # band ~170-180 TF/s on this chip


def probe(n: int = 4, n2: int = 16, reps: int = 5,
          raw: bool = False):
    """Current chip throughput (TFLOP/s) on a plain 8k bf16 matmul chain.

    Slope-measured AND output-chained (each iteration's product feeds the
    next input): no slicing/DCE, no hoisting, no reduce-pass overhead —
    this is the exact matmul time. Chained 8k products stay finite in
    bf16 only because the operand is orthonormal-ish noise/sqrt(N); a
    tanh squash keeps values bounded regardless (one VPU pass, ~1% of the
    6.3ms matmul).

    Chain lengths (r5, VERDICT #4): the old n=2/n2=6 pair put only ~25ms
    of device time in the slope difference — inside this tunnel's RTT
    drift, which is how a probe once read 203.7 TF/s (>100% of a v5e's
    nominal 197 peak). n=4/n2=16 is a ~76ms difference; with reps=5 the
    median slope is stable to a few percent. ``raw=True`` additionally
    returns the per-rep slope TF/s list for the artifact."""
    global _PROBE_A
    if _PROBE_A is None:
        _PROBE_A = (jax.random.normal(jax.random.PRNGKey(0),
                                      (_PROBE_N, _PROBE_N), jnp.bfloat16)
                    * (1.0 / _PROBE_N ** 0.5)).astype(jnp.bfloat16)
    a = _PROBE_A

    def make(n):
        @jax.jit
        def run(x):
            def body(c, _):
                return jnp.tanh(c @ a), None
            x, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(x.astype(jnp.float32))
        return run

    r1, r2 = make(n), make(n2)
    float(r1(a))
    float(r2(a))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(a))
        t1 = time.perf_counter()
        float(r2(a))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n))
    t = max(statistics.median(slopes), 1e-9)
    tf = 2 * _PROBE_N ** 3 / t / 1e12
    if raw:
        return tf, [round(2 * _PROBE_N ** 3 / max(s, 1e-9) / 1e12, 1)
                    for s in slopes]
    return tf


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
    print(f"tunnel rtt: {rtt()*1e3:.1f} ms")
    for _ in range(3):
        print(f"chip probe: {probe():.0f} TFLOP/s "
              "(healthy band ~170-180, slope-measured)")
