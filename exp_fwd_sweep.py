"""Flash-forward last-5% hunt (VERDICT r5 #3): block-size sweep for OUR
fwd at the headline shape, against jax-FA swept over >=3 block configs
(symmetry). Also re-measures FWD_BF16_EXP and EXP2_SCORES at the winning
block size under the fixed harness (their "wash" verdicts predate it).

All slope-timed (bench_probe._timed_scan), probes interleaved, ONE process.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from np_modeling_tpu import ops
import np_modeling_tpu.ops.attention as A

B, H, S, D = 4, 8, 4096, 128


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((B, H, S, D),
                                                 dtype=np.float32)
                             ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    sc = 1.0 / (D ** 0.5)
    from jax.experimental.pallas.ops.tpu import flash_attention as jfa

    res = {"probe0": round(bench_probe.probe(), 1)}
    lens = dict(n=8, n2=40)

    ours = {}
    for bq, bkv in [(1024, 1024), (512, 1024), (1024, 512), (2048, 1024),
                    (1024, 2048), (512, 2048), (2048, 512), (512, 512)]:
        t = bench_probe._timed_scan(
            lambda qc, bq=bq, bkv=bkv: ops.flash_attention(
                qc, k, v, causal=True, block_q=bq, block_kv=bkv),
            q, **lens)
        ours[f"{bq}x{bkv}"] = round(t * 1e6, 1)
        print(f"PARTIAL ours {bq}x{bkv} us={ours[f'{bq}x{bkv}']}",
              flush=True)
    res["ours_fwd_us"] = ours
    res["probe1"] = round(bench_probe.probe(), 1)

    jaxs = {}
    for bq, bkv in [(1024, 1024), (512, 1024), (512, 512), (2048, 1024)]:
        bs = jfa.BlockSizes(block_q=bq, block_k_major=bkv, block_k=bkv,
                            block_b=1)
        t = bench_probe._timed_scan(
            lambda qc, bs=bs: jfa.flash_attention(
                qc, k, v, causal=True, sm_scale=sc, block_sizes=bs),
            q, **lens)
        jaxs[f"{bq}x{bkv}"] = round(t * 1e6, 1)
        print(f"PARTIAL jax {bq}x{bkv} us={jaxs[f'{bq}x{bkv}']}",
              flush=True)
    res["jax_fwd_us"] = jaxs
    res["probe2"] = round(bench_probe.probe(), 1)

    # Flag re-measures at the best our-config (VERDICT r5 #5).
    best = min(ours, key=ours.get)
    bq, bkv = map(int, best.split("x"))
    for flag in ("FWD_BF16_EXP", "EXP2_SCORES", "STRUCT_MASK_COND"):
        setattr(A, flag, True)
        try:
            t = bench_probe._timed_scan(
                lambda qc: ops.flash_attention(qc, k, v, causal=True,
                                               block_q=bq, block_kv=bkv),
                q, **lens)
            res[f"{flag.lower()}_at_{best}_us"] = round(t * 1e6, 1)
        finally:
            setattr(A, flag, False)
    # Re-time the baseline AFTER the flag variants (drift check).
    res[f"ours_recheck_{best}_us"] = round(bench_probe._timed_scan(
        lambda qc: ops.flash_attention(qc, k, v, causal=True,
                                       block_q=bq, block_kv=bkv),
        q, **lens) * 1e6, 1)
    res["probe3"] = round(bench_probe.probe(), 1)
    res["best_ours"] = best
    res["best_jax"] = min(jaxs, key=jaxs.get)
    res["fwd_vs_jax_swept"] = round(min(jaxs.values()) / min(ours.values()),
                                    4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
