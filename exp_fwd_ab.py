"""One-off experiment: ours-vs-jax flash fwd at the headline shape.

Run on the real chip. All variants interleaved in ONE process with probe
health checks (see CLAUDE.md: chip throughput drifts ~4x across sessions).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from np_modeling_tpu import ops

b, h, s, d = 4, 8, 4096, 128
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32)
                         ).astype(jnp.bfloat16)
q, k, v = mk(), mk(), mk()
sc = 1.0 / (d ** 0.5)

from jax.experimental.pallas.ops.tpu import flash_attention as jfa
jfa_bs = jfa.BlockSizes(block_q=1024, block_k_major=1024, block_k=1024,
                        block_b=1)

attn_flops = 4 * b * h * s * s * d * 0.5

variants = {
    "ours": lambda: bench_probe._timed_scan(
        lambda qc: ops.flash_attention(qc, k, v, causal=True), q, n=8),
    "jax": lambda: bench_probe._timed_scan(
        lambda qc: jfa.flash_attention(qc, k, v, causal=True, sm_scale=sc,
                                       block_sizes=jfa_bs), q, n=8),
}

out = bench_probe.ab(variants, rounds=3)
probe = out.pop("_probe")
print(f"probe: {probe:.1f} TF/s")
for name, t in out.items():
    print(f"{name}: {t*1e6:.0f} us  ({attn_flops/t/1e12:.1f} TF/s eff, "
          f"{attn_flops/t/1e12/probe:.3f} of probe)")
print(f"ratio jax/ours: {out['jax']/out['ours']:.3f} (>1 = ours faster)")
