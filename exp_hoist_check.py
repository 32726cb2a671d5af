"""Is the timing scan's body hoisted? Totals must scale LINEARLY in n.

Checks three bodies: plain XLA matmul (the probe), batched einsum, and
the Pallas flash fwd. Prints TOTAL wall per call across n — a flat total
means the body was hoisted (loop-invariant) and every derived TF/s was
n-times fake.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
A8 = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.bfloat16)
b, h, s, d = 4, 8, 4096, 128
mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32)
                         ).astype(jnp.bfloat16)
q, k, v = mk(), mk(), mk()


def total_time(f, *args, n=8):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = f(*((a[0] + (c * 0).astype(a[0].dtype),) + a[1:]))
            return jnp.sum(out[..., 0, 0].astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return out
    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def chained_time(f, *args, n=8):
    """Alternative harness: feed f's OUTPUT back as its input (true data
    dependence, unhoistable)."""
    @jax.jit
    def run(*a):
        def body(x, _):
            out = f(*((x,) + a[1:]))
            return out.astype(a[0].dtype).reshape(a[0].shape), None
        x, _ = jax.lax.scan(body, a[0], None, length=n)
        return jnp.sum(x[..., 0, 0].astype(jnp.float32))
    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


from np_modeling_tpu import ops

print("== carry-perturbation harness (bench_probe._timed_scan style) ==")
for name, f, args in (
        ("matmul8k", lambda x: x @ A8, (A8,)),
        ("flash_fwd", lambda qc: ops.flash_attention(qc, k, v, causal=True),
         (q,))):
    for n in (2, 8, 32):
        t = total_time(f, *args, n=n)
        print(f"{name:10s} n={n:3d}: total {t*1e3:8.2f} ms "
              f"per-iter {t/n*1e6:8.0f} us")

print("== output-chained harness ==")
for name, f, args in (
        ("matmul8k", lambda x: x @ A8, (A8,)),
        ("flash_fwd", lambda qc: ops.flash_attention(qc, k, v, causal=True),
         (q,))):
    for n in (2, 8, 32):
        t = chained_time(f, *args, n=n)
        print(f"{name:10s} n={n:3d}: total {t*1e3:8.2f} ms "
              f"per-iter {t/n*1e6:8.0f} us")
