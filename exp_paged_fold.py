"""A/B: head-folded paged-attention grid vs the (b, hkv, n_blocks) grid
(VERDICT r5 #2). Hypothesis: at decode shapes the unfolded kernel is
grid-overhead bound (b*hkv*n_blocks tiny steps); folding all kv heads into
one step per page block divides the step count by hkv with the same total
HBM traffic. Slope-timed, probes interleaved, one process.

Also sweeps pages_per_block (the VERDICT (c) suspect) on both variants.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

import bench_probe
from np_modeling_tpu import ops

SEQS = 8


def micro(ctx, psize=64, hkv=8, d=128, tw=None):
    pages_used = -(-ctx // psize)
    tw = tw or pages_used
    total = max(tw * SEQS + 2, 176)
    kq, kk, kv2 = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (SEQS, hkv, d), jnp.bfloat16)
    k_pages = jax.random.normal(kk, (hkv, total, psize, d), jnp.bfloat16)
    v_pages = jax.random.normal(kv2, (hkv, total, psize, d), jnp.bfloat16)
    lengths = jnp.full((SEQS,), ctx, jnp.int32)
    table = jnp.arange(SEQS * tw, dtype=jnp.int32).reshape(SEQS, tw)

    import sys
    out = {}
    for fold in (False, True):
        for npb in (8, 16):
            t = bench_probe._timed_scan(
                lambda qc, npb=npb, fold=fold: ops.paged_attention(
                    qc, k_pages, v_pages, lengths, table,
                    pages_per_block=npb, fold_heads=fold),
                q, n=16, n2=96)
            key = f"{'fold' if fold else 'plain'}_npb{npb}_us"
            out[key] = round(t * 1e6, 1)
            print(f"PARTIAL ctx{ctx} {key}={out[key]}", file=sys.stderr,
                  flush=True)
    return out


def main():
    res = {"probe0": round(bench_probe.probe(), 1)}
    res["ctx1024"] = micro(1024)
    res["probe1"] = round(bench_probe.probe(), 1)
    res["ctx4096"] = micro(4096)
    res["probe2"] = round(bench_probe.probe(), 1)
    # Correctness spot-check on-device: folded == unfolded == oracle.
    kq, kk, kv2 = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(kq, (4, 8, 128), jnp.bfloat16)
    k_pages = jax.random.normal(kk, (8, 40, 64, 128), jnp.bfloat16)
    v_pages = jax.random.normal(kv2, (8, 40, 64, 128), jnp.bfloat16)
    lengths = jnp.asarray([100, 640, 333, 512], jnp.int32)
    table = jnp.arange(40, dtype=jnp.int32)[:40].reshape(4, 10)
    a = ops.paged_attention(q, k_pages, v_pages, lengths, table,
                            fold_heads=False)
    b = ops.paged_attention(q, k_pages, v_pages, lengths, table,
                            fold_heads=True)
    ref = ops.paged_attention_reference(q, k_pages, v_pages, lengths, table)
    res["max_abs_fold_vs_plain"] = float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32))))
    res["max_abs_fold_vs_oracle"] = float(jnp.max(jnp.abs(
        b.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
