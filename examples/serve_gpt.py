"""Serve a GPT model with continuous batching over a paged KV cache.

Usage: python examples/serve_gpt.py [--quantize-kv]
Demonstrates requests joining/leaving mid-stream (continuous batching).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import models, serving


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize-kv", action="store_true")
    args = ap.parse_args()

    cfg = models.GPTConfig(vocab_size=512, d_model=128, num_heads=8,
                           num_kv_heads=2, num_layers=4, hidden_units=512,
                           max_len=256)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))

    engine = serving.GenerationEngine(gpt, params, total_pages=256,
                                      page_size=16, max_seqs=8,
                                      quantize_kv=args.quantize_kv)
    rng = np.random.default_rng(0)
    outputs = {}

    # Request A arrives.
    outputs[0] = [engine.add_request(0, jnp.asarray(rng.integers(0, 512, 12)))]
    for _ in range(4):
        for sid, tok in engine.step().items():
            outputs[sid].append(tok)

    # Request B joins mid-stream (continuous batching).
    outputs[1] = [engine.add_request(1, jnp.asarray(rng.integers(0, 512, 20)))]
    for _ in range(4):
        for sid, tok in engine.step().items():
            outputs[sid].append(tok)

    # A completes; its pages are reclaimed while B continues.
    engine.finish(0)
    for _ in range(4):
        for sid, tok in engine.step().items():
            outputs[sid].append(tok)
    engine.finish(1)

    for sid, toks in outputs.items():
        print(f"request {sid}: generated {toks}")
    print("free pages after completion:", engine.free_pages)


if __name__ == "__main__":
    main()
