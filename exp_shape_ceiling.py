"""What do the attention-shaped matmuls themselves achieve on this chip?

If XLA's own batched dots at [*,1024,128]x[*,128,1024] and
[*,1024,1024]x[*,1024,128] run at ~31 TF/s, the flash kernel is AT the
shape-physics ceiling and the win must come from changing shapes, not
trimming VPU work.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 32          # b*h of the headline shape


def timed(f, *args, n=8):
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
        best = min(best, (time.perf_counter() - t0) / n)
    return best


A8 = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.bfloat16)


def probe():
    t = timed(lambda x: x @ A8, A8, n=4)
    return 2 * 8192 ** 3 / t / 1e12


rng = np.random.default_rng(0)


def mk(*shape):
    return jnp.asarray(rng.standard_normal(shape, dtype=np.float32)
                       ).astype(jnp.bfloat16)


cases = {
    # s = q @ k^T per (b,h): M=1024 N=1024 K=128, batched 32x
    "qk_1024x1024x128_b32": (mk(B, 1024, 128), mk(B, 1024, 128),
                             lambda a, b: jnp.einsum(
                                 "bmk,bnk->bmn", a, b,
                                 preferred_element_type=jnp.float32)),
    # p @ v: M=1024 K=1024 N=128, batched 32x (bf16 p)
    "pv_1024x128x1024_b32": (mk(B, 1024, 1024), mk(B, 1024, 128),
                             lambda a, b: jnp.einsum(
                                 "bmk,bkn->bmn", a, b,
                                 preferred_element_type=jnp.float32)),
    # full-seq s = q @ k^T: M=4096 N=4096 K=128 (the whole-head dot)
    "qk_4096x4096x128_b32": (mk(B, 4096, 128), mk(B, 4096, 128),
                             lambda a, b: jnp.einsum(
                                 "bmk,bnk->bmn", a, b,
                                 preferred_element_type=jnp.float32)),
    # bigger M tile: M=2048
    "qk_2048x1024x128_b32": (mk(B, 2048, 128), mk(B, 1024, 128),
                             lambda a, b: jnp.einsum(
                                 "bmk,bnk->bmn", a, b,
                                 preferred_element_type=jnp.float32)),
    # K=256 (two heads' worth — shows K sensitivity)
    "qk_1024x1024x256_b32": (mk(B, 1024, 256), mk(B, 1024, 256),
                             lambda a, b: jnp.einsum(
                                 "bmk,bnk->bmn", a, b,
                                 preferred_element_type=jnp.float32)),
    # bf16 output for qk (does the fp32 [*,1024,1024] store dominate?)
    "qk_1024_bf16out": (mk(B, 1024, 128), mk(B, 1024, 128),
                        lambda a, b: jnp.einsum(
                            "bmk,bnk->bmn", a, b,
                            preferred_element_type=jnp.bfloat16)),
}

print(f"probe: {probe():.1f} TF/s")
for name, (a, b, f) in cases.items():
    t = timed(f, a, b)
    m, k = a.shape[1], a.shape[2]
    n = b.shape[1] if "pv" not in name else b.shape[2]
    fl = 2 * B * m * n * k if "pv" not in name else 2 * B * a.shape[1] * a.shape[2] * b.shape[2]
    print(f"{name:24s} {t*1e6:7.0f} us  {fl/t/1e12:6.1f} TF/s")
print(f"probe after: {probe():.1f} TF/s")
