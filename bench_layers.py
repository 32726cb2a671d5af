"""Per-layer fwd+bwd µs/step vs Flax (the BASELINE.json metric).

For each layer type, times a jitted grad of an MSE objective through our
layer vs the equivalent Flax layer on identical weights/shapes. SLOPE-timed
between two chain lengths (r5: the old per-call form carried +RTT/K ~3ms
per iteration through this tunnel — larger than the LayerNorm iteration
itself). Prints one JSON line per layer:
{"layer", "ours_us", "flax_us", "speedup"}.
"""

from __future__ import annotations

import json
import statistics
import time

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import nn, ops

rng = np.random.default_rng(0)


def _r(*s):
    return jnp.asarray(rng.standard_normal(s, dtype=np.float32))


def _time_grad(loss_fn, x, n=8, n2=40):
    """Slope-timed fwd+bwd seconds/iteration. Chain lengths sized so the
    (n2-n)-iteration device-time difference clears the tunnel's RTT drift
    (use longer chains for sub-ms layers)."""
    g = jax.grad(loss_fn)

    def make(length):
        @jax.jit
        def run(x):
            def body(c, _):
                return (c + 1e-6 * g(c)).astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=length)
            return jnp.sum(c.astype(jnp.float32))
        return run

    r1, r2 = make(n), make(n2)
    float(r1(x))
    float(r2(x))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(r1(x))
        t1 = time.perf_counter()
        float(r2(x))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n))
    return max(statistics.median(slopes), 1e-9)


def bench_dense():
    x = _r(4096, 1024)
    t = _r(4096, 4096)
    w, b = _r(1024, 4096), _r(4096)
    ours = _time_grad(lambda x: ops.mse(ops.relu(ops.linear(x, w, b)), t), x)
    mod = fnn.Dense(4096)
    fl = _time_grad(lambda x: ops.mse(fnn.relu(mod.apply(
        {"params": {"kernel": w, "bias": b}}, x)), t), x)
    return "dense_4096x1024x4096", ours, fl


def bench_layernorm():
    # Sub-ms iterations: long chains so the slope difference clears RTT
    # drift (~0.2ms/iter x 112 extra iters ~= 22ms).
    x = _r(8192, 1024)
    t = _r(8192, 1024)
    g, b = _r(1024), _r(1024)
    ours = _time_grad(lambda x: ops.mse(ops.layer_norm(x, g, b, 1e-3), t), x,
                      n=16, n2=128)
    ln = fnn.LayerNorm(epsilon=1e-3, use_fast_variance=False)
    fl = _time_grad(lambda x: ops.mse(ln.apply(
        {"params": {"scale": g, "bias": b}}, x), t), x, n=16, n2=128)
    return "layernorm_8192x1024", ours, fl


def bench_mha():
    b, s, d, h = 2, 2048, 1024, 8
    x = _r(b, s, d)
    t = _r(b, s, d)
    mha_f = fnn.MultiHeadDotProductAttention(h, qkv_features=d, out_features=d)
    fp = mha_f.init(jax.random.PRNGKey(0), x, x)["params"]
    mine = nn.MultiHeadAttention(num_heads=h, causal=True)
    params = {
        "wq": fp["query"]["kernel"], "bq": fp["query"]["bias"],
        "wk": fp["key"]["kernel"], "bk": fp["key"]["bias"],
        "wv": fp["value"]["kernel"], "bv": fp["value"]["bias"],
        "wo": fp["out"]["kernel"], "bo": fp["out"]["bias"],
    }
    ours = _time_grad(lambda x: ops.mse(mine.apply(params, x), t), x)
    mask = fnn.make_causal_mask(jnp.zeros((b, s)))
    fl = _time_grad(lambda x: ops.mse(mha_f.apply(
        {"params": fp}, x, x, mask=mask), t), x)
    return "causal_mha_b2_s2048_d1024_h8", ours, fl


def bench_conv():
    x = _r(16, 32, 32, 64)
    t = _r(16, 32, 32, 128)
    w, bb = _r(3, 3, 64, 128), _r(128)
    ours = _time_grad(lambda x: ops.mse(ops.conv2d(x, w, bb), t), x,
                      n=16, n2=128)
    conv = fnn.Conv(128, (3, 3), padding="SAME")
    fl = _time_grad(lambda x: ops.mse(conv.apply(
        {"params": {"kernel": w, "bias": bb}}, x), t), x, n=16, n2=128)
    return "conv3x3_16x32x32_64to128", ours, fl


def main():
    for fn in [bench_dense, bench_layernorm, bench_mha, bench_conv]:
        name, ours, fl = fn()
        print(json.dumps({
            "layer": name,
            "ours_us": round(ours * 1e6, 1),
            "flax_us": round(fl * 1e6, 1),
            "speedup": round(fl / ours, 3),
        }))


if __name__ == "__main__":
    main()
