"""Flash-backward block sweep (VERDICT r5 #8): chase the fused _dkvq_tile
past 0.579-of-probe at the headline shape. Slope-timed, probes interleaved.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from np_modeling_tpu import ops

B, H, S, D = 4, 8, 4096, 128


def grad_of(fn, k, v):
    def run(qc):
        g = jax.grad(lambda t: jnp.sum(
            fn(t[0], t[1], t[2]).astype(jnp.float32) ** 2))((qc, k, v))
        return (qc + 0.0001 * (g[0] + g[1] + g[2])).astype(jnp.bfloat16)
    return run


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((B, H, S, D),
                                                 dtype=np.float32)
                             ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    res = {"probe0": round(bench_probe.probe(), 1)}
    lens = dict(n=6, n2=24)

    out = {}
    for bq, bkv in [(1024, 1024), (512, 1024), (1024, 512), (512, 512),
                    (2048, 1024), (1024, 2048), (512, 2048)]:
        t = bench_probe._timed_scan(
            grad_of(lambda a, b_, c, bq=bq, bkv=bkv: ops.flash_attention(
                a, b_, c, causal=True, block_q=bq, block_kv=bkv), k, v),
            q, **lens)
        out[f"{bq}x{bkv}"] = round(t * 1e6, 1)
        print(f"PARTIAL {bq}x{bkv} us={out[f'{bq}x{bkv}']}", flush=True)
    res["fwdbwd_us"] = out
    res["probe1"] = round(bench_probe.probe(), 1)
    res["best"] = min(out, key=out.get)
    attn_flops = 4 * B * H * S * S * D * 0.5
    res["best_fwdbwd_vs_probe"] = round(
        3.5 * attn_flops / (min(out.values()) * 1e-6) / 1e12 / res["probe1"],
        3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
