"""Robust fwd-only comparison, ours vs jax FA, with a block-size sweep.

Round-4 follow-up: at n=4/n2=12 the slope estimate of a ~1.2ms kernel is
inside the tunnel's RTT drift (a run measured ours_fwd at slope<=0 while
jax_fwd in the same process read 1237us). Chains here are long enough that
the n2-n1 device-time difference (~40ms) dominates the drift.
"""
import statistics

import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from np_modeling_tpu import ops

b, h, s, d = 4, 8, 4096, 128
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(
    rng.standard_normal((b, h, s, d), dtype=np.float32)).astype(jnp.bfloat16)
q, k, v = mk(), mk(), mk()
sc = 1.0 / (d ** 0.5)
attn_flops = 4 * b * h * s * s * d * 0.5

from jax.experimental.pallas.ops.tpu import flash_attention as jfa


def jx(bq, bk):
    bs = jfa.BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1)
    return lambda qc: jfa.flash_attention(qc, k, v, causal=True, sm_scale=sc,
                                          block_sizes=bs)


def ours(bq, bkv):
    return lambda qc: ops.flash_attention(qc, k, v, causal=True,
                                          block_q=bq, block_kv=bkv)


cases = {
    "ours_1024x1024": ours(1024, 1024),
    "ours_2048x1024": ours(2048, 1024),
    "ours_1024x512": ours(1024, 512),
    "ours_512x1024": ours(512, 1024),
    "ours_2048x512": ours(2048, 512),
    "jax_1024x1024": jx(1024, 1024),
    "jax_2048x1024": jx(2048, 1024),
    "jax_1024x512": jx(1024, 512),
}

print(f"probe: {bench_probe.probe():.1f} TF/s", flush=True)
res = {k2: [] for k2 in cases}
for rep in range(3):
    for name, f in cases.items():
        res[name].append(bench_probe._timed_scan(f, q, n=8, n2=40, reps=3))
    print(f"--- pass {rep} done", flush=True)
pr = bench_probe.probe()
print(f"probe after: {pr:.1f} TF/s")
for name in cases:
    t = statistics.median(res[name])
    print(f"{name:16s} {t*1e6:7.0f} us  {attn_flops/t/1e12:6.1f} TF/s "
          f"({attn_flops/t/1e12/pr:.3f} of probe-after)")
best_ours = min(statistics.median(res[n]) for n in cases if n.startswith("ours"))
best_jax = min(statistics.median(res[n]) for n in cases if n.startswith("jax"))
print(f"best ours {best_ours*1e6:.0f} us, best jax {best_jax*1e6:.0f} us, "
      f"ratio jax/ours = {best_jax/best_ours:.3f}")
