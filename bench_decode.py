"""Decode throughput: paged attention vs dense-cache attention at batch.

Measures tokens/sec for batched single-token decode attention over a long
context — the serving hot loop — comparing the paged kernel (fp32 and int8
pages) against dense-cache attention. One JSON line per config.

Measured (tunneled v5e, b8 ctx8k hkv2 d128, 64-token pages): paged 2.24ms
(~3.6k tok/s), 1.04x dense; int8 pages 0.94x (the kernel is grid-overhead
bound at one-page tiles — each step is an (8x64x128) mini-matmul — so the
bandwidth halving doesn't pay here; multi-page blocks / megacore split are
the known next steps, guide §9-12).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import ops

B, HQ, HKV, D, CTX, PSIZE = 8, 8, 2, 128, 8192, 64
K = 20


def _time(run, *args):
    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def main():
    rng = np.random.default_rng(0)
    pages_per_seq = CTX // PSIZE
    total_pages = B * pages_per_seq
    q = jnp.asarray(rng.standard_normal((B, HQ, D), dtype=np.float32))
    kp = jnp.asarray(rng.standard_normal((HKV, total_pages, PSIZE, D),
                                         dtype=np.float32))
    vp = jnp.asarray(rng.standard_normal((HKV, total_pages, PSIZE, D),
                                         dtype=np.float32))
    pi = jnp.asarray(rng.permutation(total_pages)
                     .reshape(B, pages_per_seq).astype(np.int32))
    lengths = jnp.full((B,), CTX, jnp.int32)

    def chain(fn):
        @jax.jit
        def run(q):
            def body(c, _):
                o = fn(c)
                return c + 0.0001 * o, None
            c, _ = jax.lax.scan(body, q, None, length=K)
            return jnp.sum(c)
        return run

    # Dense-cache baseline: gather pages once (outside the timer would be
    # cheating — a dense cache IS contiguous), so build contiguous [B,...]
    k_dense = jnp.moveaxis(kp[:, pi], 1, 0).reshape(B, HKV, CTX, D)
    v_dense = jnp.moveaxis(vp[:, pi], 1, 0).reshape(B, HKV, CTX, D)
    t_dense = _time(chain(
        lambda q: ops.attention_reference(q[:, :, None, :], k_dense,
                                          v_dense)[:, :, 0]), q)

    t_paged = _time(chain(
        lambda q: ops.paged_attention(q, kp, vp, lengths, pi)), q)

    kq, vq = ops.quantize_int8(kp), ops.quantize_int8(vp)
    t_int8 = _time(chain(
        lambda q: ops.paged_attention(q, kq.values, vq.values, lengths, pi,
                                      k_scales=kq.scales,
                                      v_scales=vq.scales)), q)

    toks = B / t_paged
    print(json.dumps({
        "metric": f"paged_decode_b{B}_ctx{CTX}_hkv{HKV}_d{D}",
        "paged_us_per_step": round(t_paged * 1e6, 1),
        "paged_int8_us_per_step": round(t_int8 * 1e6, 1),
        "dense_us_per_step": round(t_dense * 1e6, 1),
        "tokens_per_sec": round(toks, 0),
        "int8_speedup_vs_fp32_pages": round(t_paged / t_int8, 3),
        "vs_dense": round(t_dense / t_paged, 3),
    }))


if __name__ == "__main__":
    main()
