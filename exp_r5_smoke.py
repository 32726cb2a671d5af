"""Smoke the two bench.py sections changed after the r5 self-run: the
in-register chained VPU roofline and the long-chain paged micro. Small
chains — this validates correctness of the harness code on hardware, not
final numbers."""
import json

import jax
import jax.numpy as jnp

import bench_probe
from bench import attn_roofline, HEADS, D_MODEL


def main():
    res = {"probe": round(bench_probe.probe(), 1)}
    rf = attn_roofline(res["probe"])
    res["roofline"] = rf

    from np_modeling_tpu import ops
    hkv, d = HEADS, D_MODEL // HEADS
    ctx = 1024
    tw = ctx // 64
    total = max(tw * 8 + 2, 176)
    kq, kk, kv2 = jax.random.split(jax.random.PRNGKey(3), 3)
    qd = jax.random.normal(kq, (8, hkv, d), jnp.bfloat16)
    kp = jax.random.normal(kk, (hkv, total, 64, d), jnp.bfloat16)
    vp = jax.random.normal(kv2, (hkv, total, 64, d), jnp.bfloat16)
    lengths = jnp.full((8,), ctx, jnp.int32)
    table = jnp.arange(8 * tw, dtype=jnp.int32).reshape(8, tw)
    t_fold = bench_probe._timed_scan(
        lambda qc: ops.paged_attention(qc, kp, vp, lengths, table),
        qd, n=64, n2=576)
    res["paged_ctx1k_us"] = round(t_fold * 1e6, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
