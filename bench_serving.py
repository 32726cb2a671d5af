"""Serving throughput: end-to-end GenerationEngine decode on a real model.

Measures the jitted continuous-batching decode step (step_many: one device
dispatch for n tokens x all live sequences) on a 4L/d1024 GPT with 8 live
sequences at ~512-token context. One JSON line per config.

Measured (tunneled v5e, warm compiles): fp32 KV 2.96 ms/token (2.7k tok/s
aggregate), int8 KV 3.14 ms/token. A single per-token step() costs ~29ms
extra dispatch+readback round-trip through this machine's TPU tunnel —
production serving should batch decode steps via step_many.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import models
from np_modeling_tpu.serving import GenerationEngine

SEQS, PROMPT, N = 8, 512, 64


def main():
    rng = np.random.default_rng(0)
    cfg = models.GPTConfig(vocab_size=8192, d_model=1024, num_heads=8,
                           num_layers=4, hidden_units=4096, max_len=2048,
                           dtype=jnp.bfloat16)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 128), jnp.int32))
    for quant in (False, True):
        eng = GenerationEngine(gpt, params, total_pages=128, page_size=64,
                               max_seqs=SEQS, quantize_kv=quant)
        for s in range(SEQS):
            eng.add_request(s, jnp.asarray(rng.integers(0, 8192, (PROMPT,))))
        eng.step_many(N)          # warm the n-step scan compile
        t0 = time.perf_counter()
        eng.step_many(N)
        per = (time.perf_counter() - t0) / N
        print(json.dumps({
            "metric": f"engine_decode_8seq_gpt4L_d1024{'_int8kv' if quant else ''}",
            "value": round(per * 1e6, 1),
            "unit": "us/token_step",
            "tok_per_s": round(SEQS / per, 0),
        }))


if __name__ == "__main__":
    main()
