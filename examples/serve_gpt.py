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

    # ---- fork (prefix caching): N continuations of one prompt ----------
    prompt = jnp.asarray(rng.integers(0, 512, 40))
    first = engine.add_request(2, prompt)      # ONE prefill
    engine.fork(2, 3)                          # O(1) pages per fork
    engine.fork(2, 4)
    forked = {sid: [first] for sid in (2, 3, 4)}
    for sid, toks in engine.step_many(6).items():
        forked[sid].extend(toks)
    print("forked continuations (greedy twins):",
          {sid: t[:4] for sid, t in forked.items()})
    for sid in (2, 3, 4):
        engine.finish(sid)

    # ---- speculative decoding with a draft model ------------------------
    dcfg = models.GPTConfig(vocab_size=512, d_model=32, num_heads=2,
                            num_layers=1, hidden_units=128, max_len=256)
    draft = models.GPT(dcfg)
    dparams = draft.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    spec = serving.GenerationEngine(gpt, params, total_pages=256,
                                    page_size=16, max_seqs=8,
                                    draft_gpt=draft, draft_params=dparams)
    spec.add_request(0, prompt)
    toks = spec.step_speculative_many(rounds=3, gamma=4)[0]
    print(f"speculative decode: {len(toks)} tokens in 3 rounds "
          "(train the draft with training.distill_gpt_loss to raise "
          "acceptance)")


if __name__ == "__main__":
    main()
