"""Is there a fixed per-dispatch overhead polluting small-kernel timings?"""
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
B = 32
A = jnp.asarray(rng.standard_normal((B, 1024, 128), np.float32)).astype(jnp.bfloat16)
Bm = jnp.asarray(rng.standard_normal((B, 1024, 128), np.float32)).astype(jnp.bfloat16)


def qk(a, b):
    return jnp.einsum("bmk,bnk->bmn", a, b,
                      preferred_element_type=jnp.float32)


def timed(n):
    @jax.jit
    def run(a, b):
        def body(c, _):
            out = qk(a + (c * 0).astype(a.dtype), b)
            return jnp.sum(out[..., 0, 0].astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return out
    float(run(A, Bm))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(A, Bm))
        best = min(best, time.perf_counter() - t0)
    return best


for n in (1, 8, 64):
    t = timed(n)
    print(f"n={n:3d}: total {t*1e3:8.2f} ms, per-iter {t/n*1e6:8.0f} us, "
          f"{2*B*1024*1024*128*n/t/1e12:6.1f} TF/s")
