"""Three-way attribution of serving_vs_dense = 0.186 (VERDICT r5 #2).

BENCH_r04: the paged engine decodes 8 seqs at 5.7k tok/s where a same-run
dense-cache decode does ~30.8k — a 5.4x device-time gap. Suspects:
  (a) sampling/constraint machinery (dense baseline uses bare argmax)
  (b) paged-kernel grid overhead at ctx~1k with page_size=64
      (grid = b*hkv*n_blocks = 128 tiny steps/layer; its own docstring
      measured one-page steps grid-overhead bound)
  (c) max_seqs padding / page-append scatter cost

Estimate before measuring: dense 0.26 ms/step is already ~speed-of-light
for streaming the 138MB of bf16 weights at b8; the engine's extra ~1.1ms
at ~2us/grid-step x 512 steps (4 layers) points at (b).

Everything slope-timed in ONE process, probes interleaved (bench_probe).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from np_modeling_tpu import models, ops
from np_modeling_tpu.serving import GenerationEngine

SEQS, PROMPT, N = 8, 512, 64


def slope_calls(fn, n=1, n2=3, reps=3):
    """Slope-time fn(steps) between n*N and n2*N steps (engine-style:
    the call itself advances state, so we time successive calls)."""
    import statistics
    fn(n * N)           # warm
    fn(n2 * N)
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(n * N)
        t1 = time.perf_counter()
        fn(n2 * N)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / ((n2 - n) * N))
    return statistics.median(slopes)


def build():
    rng = np.random.default_rng(0)
    cfg = models.GPTConfig(vocab_size=8192, d_model=1024, num_heads=8,
                           num_layers=4, hidden_units=4096, max_len=2048,
                           dtype=jnp.bfloat16)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 128), jnp.int32))
    prompts = {s: jnp.asarray(rng.integers(0, 8192, (PROMPT,)))
               for s in range(SEQS)}
    return gpt, params, prompts


def dense_decode_time(gpt, params, prompts):
    batch = jnp.stack([prompts[s] for s in range(SEQS)])

    def make(steps):
        @jax.jit
        def dense_decode(params, batch):
            caches = gpt.init_cache(SEQS, PROMPT + steps + 1,
                                    dtype=jnp.bfloat16)
            logits, caches = gpt.apply(params, batch, caches=caches,
                                       decode=True, logits_last_only=True)
            tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

            def body(carry, _):
                tok, caches = carry
                lg, caches = gpt.apply(params, tok[:, None], caches=caches,
                                       decode=True)
                return (jnp.argmax(lg[:, -1], -1).astype(jnp.int32),
                        caches), tok

            (_, _), toks = jax.lax.scan(body, (tok0, caches), None,
                                        length=steps - 1)
            return toks
        return dense_decode

    import statistics
    d1, d2 = make(N), make(3 * N)
    jax.block_until_ready(d1(params, batch))
    jax.block_until_ready(d2(params, batch))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(d1(params, batch))
        t1 = time.perf_counter()
        jax.block_until_ready(d2(params, batch))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (2 * N))
    return statistics.median(slopes)


def paged_kernel_micro(ctx, psize=64, npb_list=(4, 8, 16), table_pages=None):
    """Per-call device time of the paged kernel alone at engine shapes,
    vs a dense attention gather of the same KV. ctx = tokens in cache."""
    hkv, d = 8, 128
    pages_used = -(-ctx // psize)
    tw = table_pages or pages_used
    total = max(tw * SEQS + 2, 176)
    rng = jax.random.PRNGKey(3)
    kq, kk, kv2 = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (SEQS, hkv, d), jnp.bfloat16)
    k_pages = jax.random.normal(kk, (hkv, total, psize, d), jnp.bfloat16)
    v_pages = jax.random.normal(kv2, (hkv, total, psize, d), jnp.bfloat16)
    lengths = jnp.full((SEQS,), ctx, jnp.int32)
    table = jnp.arange(SEQS * tw, dtype=jnp.int32).reshape(SEQS, tw)

    out = {}
    for npb in npb_list:
        t = bench_probe._timed_scan(
            lambda qc, npb=npb: ops.paged_attention(
                qc, k_pages, v_pages, lengths, table,
                pages_per_block=npb),
            q, n=16, n2=96)
        out[f"paged_npb{npb}_us"] = round(t * 1e6, 1)

    # Dense attention on the same KV laid out contiguously.
    k_dense = k_pages[:, :tw * SEQS].reshape(hkv, SEQS, tw * psize, d)
    k_dense = jnp.moveaxis(k_dense, 1, 0)
    v_dense = v_pages[:, :tw * SEQS].reshape(hkv, SEQS, tw * psize, d)
    v_dense = jnp.moveaxis(v_dense, 1, 0)
    mask = (jnp.arange(tw * psize)[None, :] < ctx)

    def dense(qc):
        s = jnp.einsum("bhd,bhkd->bhk", qc.astype(jnp.float32),
                       k_dense.astype(jnp.float32)) * (d ** -0.5)
        s = jnp.where(mask[:, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhk,bhkd->bhd", p,
                          v_dense.astype(jnp.float32)).astype(qc.dtype)

    t = bench_probe._timed_scan(dense, q, n=16, n2=96)
    out["dense_attn_us"] = round(t * 1e6, 1)
    return out


def main():
    gpt, params, prompts = build()
    res = {"probe0": round(bench_probe.probe(), 1)}

    # (0) dense whole-model decode baseline
    dense_per = dense_decode_time(gpt, params, prompts)
    res["dense_us_per_step"] = round(dense_per * 1e6, 1)

    # (1) engine as benched (argmax default)
    eng = GenerationEngine(gpt, params, total_pages=160, page_size=64,
                           max_seqs=SEQS, kv_dtype=jnp.bfloat16)
    eng.add_requests(prompts)
    res["engine_us_per_step"] = round(slope_calls(eng.step_many) * 1e6, 1)
    res["engine_table_pages"] = int(eng._state["table"].shape[1])
    res["probe1"] = round(bench_probe.probe(), 1)

    # (2) paged kernel alone at the engine's effective context (ctx grew
    # to ~1k during the timed calls) + pages_per_block sweep + ctx 4k
    res["micro_ctx1024"] = paged_kernel_micro(1024)
    res["micro_ctx4096"] = paged_kernel_micro(4096)
    res["probe2"] = round(bench_probe.probe(), 1)

    # (3) model floor: decode step with attention stubbed to identity —
    # the matmul/LN/sample cost without any paged walk. Uses the engine's
    # own _device_step with paged_attention monkeypatched.
    import np_modeling_tpu.ops as ops_mod
    import np_modeling_tpu.serving.engine as eng_mod
    real = ops_mod.paged_attention
    stub = lambda q, k, v, lengths, table, **kw: (
        q if q.ndim == 4 else q)
    ops_mod.paged_attention = stub
    eng_mod.ops.paged_attention = stub
    try:
        eng2 = GenerationEngine(gpt, params, total_pages=160, page_size=64,
                                max_seqs=SEQS, kv_dtype=jnp.bfloat16)
        eng2.add_requests(prompts)
        res["engine_noattn_us_per_step"] = round(
            slope_calls(eng2.step_many) * 1e6, 1)
    finally:
        ops_mod.paged_attention = real
        eng_mod.ops.paged_attention = real
    res["probe3"] = round(bench_probe.probe(), 1)

    res["attrib_us"] = {
        "paged_attention_4layers": round(
            res["engine_us_per_step"] - res["engine_noattn_us_per_step"], 1),
        "model_rest": res["engine_noattn_us_per_step"],
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
