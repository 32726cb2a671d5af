"""Profiling/observability helpers (the reference has none — SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time

import jax


def time_fn(fn, *args, warmup: int = 2, iters: int = 10, **kwargs) -> float:
    """Median wall-clock seconds per call (blocks on device completion)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def cost_analysis(fn, *args, **kwargs):
    """XLA's per-executable cost analysis (flops, bytes accessed)."""
    return jax.jit(fn).lower(*args, **kwargs).compile().cost_analysis()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope — view with Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def mfu(flops_per_step: float, step_seconds: float,
        peak_flops: float = 394e12) -> float:
    """Model FLOPs utilization vs peak (default: TPU v5e bf16 394 TFLOP/s)."""
    return flops_per_step / step_seconds / peak_flops


def chip_probe() -> float:
    """Current chip matmul throughput (TFLOP/s) on an 8k^3 bf16 chain.

    The attainable throughput of a shared/virtualized TPU drifts between
    sessions — record this next to any absolute kernel timing, and A/B
    kernel variants only within one process (see bench_probe.ab).
    """
    import jax.numpy as jnp
    n = 8192
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(c, _):
            return c @ a, None
        out, _ = jax.lax.scan(body, x, None, length=4)
        return jnp.sum(out.astype(jnp.float32))

    float(run(a))
    t0 = time.perf_counter()
    float(run(a))
    t = (time.perf_counter() - t0) / 4
    return 2 * n ** 3 / t / 1e12
