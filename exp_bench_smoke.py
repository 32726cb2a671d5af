"""CPU smoke for bench.py's r5 phases at toy shapes (catch trace bugs
before paying tunneled-TPU compile time). Skips the jax-FA comparison
(TPU-only kernels). Not a measurement."""
import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import bench_probe
bench_probe._PROBE_N = 256

import bench
bench.BATCH, bench.SEQ, bench.D_MODEL, bench.HEADS = 2, 256, 64, 2
bench.LAYERS, bench.FFN, bench.VOCAB = 2, 128, 512
bench.K = 2

tokens = jnp.asarray(
    np.random.default_rng(0).integers(0, bench.VOCAB,
                                      (bench.BATCH, bench.SEQ)))
ours = bench.bench_ours(tokens)
print("step_us", round(ours * 1e6, 1))
bd = bench.step_breakdown(ours * 1e6, tokens, 0.1)
print("breakdown", bd)
rf = bench.attn_roofline(0.1)
print("roofline", rf)

# serving phase at tiny shapes
import time
bench.time = time
sv = bench.serving_tok_per_s.__wrapped__ if hasattr(
    bench.serving_tok_per_s, "__wrapped__") else None
# serving uses fixed internal shapes (4L d1024) — too big for a CPU smoke;
# the engine path is covered by tests/test_engine.py. Smoke per-layer:
import bench_layers
bench_layers.rng = np.random.default_rng(0)


def tiny_dense():
    x = bench_layers._r(64, 32)
    t = bench_layers._r(64, 32)
    w, b = bench_layers._r(32, 32), bench_layers._r(32)
    from np_modeling_tpu import ops
    ours = bench_layers._time_grad(
        lambda x: ops.mse(ops.relu(ops.linear(x, w, b)), t), x, n=2, n2=4)
    return "tiny", ours, ours


name, a, b = tiny_dense()
print("per-layer smoke OK", name, round(a * 1e6, 1))
print("SMOKE OK")
