"""Interleaved A/B: lib (tile _lanes) vs jax vs standalone lane0 vs
standalone tile. exp_fwd_opt.py timed variants SEQUENTIALLY and its
lane0-vs-tile verdict flipped between sessions (1485/1183 one day,
1263/1449 the next) — chip drift between one-shot timings. This run
interleaves all four per round; compare per-round columns."""
import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from np_modeling_tpu import ops
from exp_fwd_opt import make_fwd, q, k, v, attn_flops, jfa, jfa_bs, scale

variants = {
    "lib": lambda qc: ops.flash_attention(qc, k, v, causal=True),
    "jax": lambda qc: jfa.flash_attention(qc, k, v, causal=True,
                                          sm_scale=scale,
                                          block_sizes=jfa_bs),
    "sa_lane0": make_fwd(1024, 1024, m_style="lane0"),
    "sa_tile": make_fwd(1024, 1024, m_style="tile"),
}

rounds = 4
times = {name: [] for name in variants}
probes = []
for r in range(rounds):
    probes.append(bench_probe.probe())
    for name, f in variants.items():
        times[name].append(bench_probe._timed_scan(f, q, n=4, n2=12))
    row = "  ".join(f"{name}:{times[name][-1]*1e6:5.0f}us"
                    for name in variants)
    print(f"round {r} (probe {probes[-1]:.0f}): {row}", flush=True)
probes.append(bench_probe.probe())
print(f"probes: {[round(p,1) for p in probes]}")
for name in variants:
    best = min(times[name])
    med = sorted(times[name])[len(times[name]) // 2]
    print(f"{name:10s} min {best*1e6:5.0f}us med {med*1e6:5.0f}us  "
          f"min-eff {attn_flops/best/1e12:.1f} TF/s")
jb = min(times["jax"])
for name in ("lib", "sa_lane0", "sa_tile"):
    print(f"jax/{name} (min/min): {jb/min(times[name]):.3f}")
