"""Train a GPT-style causal LM on synthetic data (single chip or sharded).

Usage:
  python examples/train_gpt.py                 # single device
  python examples/train_gpt.py --shard         # dp/sp/tp over all devices
  python examples/train_gpt.py --bf16 --moe 8  # mixed precision, 8 experts
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import models, parallel, training
from np_modeling_tpu.training import data, schedules


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=1024)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--moe", type=int, default=0)
    ap.add_argument("--shard", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--ckpt", type=str, default="")
    args = ap.parse_args()

    cfg = models.GPTConfig(
        vocab_size=args.vocab, d_model=args.d_model, num_heads=args.heads,
        num_layers=args.layers, hidden_units=4 * args.d_model,
        max_len=args.seq, drop_rate=0.1, remat=args.remat,
        moe_experts=args.moe,
        dtype=jnp.bfloat16 if args.bf16 else None)
    gpt = models.GPT(cfg)

    rng = np.random.default_rng(0)
    corpus = rng.integers(0, args.vocab, (64 * args.batch, args.seq))
    tokens0 = jnp.asarray(corpus[:args.batch])
    params = gpt.init(jax.random.PRNGKey(0), tokens0)

    if args.shard:
        mesh = parallel.auto_mesh()
        print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))
        params = parallel.shard_params(params, mesh)

    sched = schedules.warmup_cosine(3e-4, warmup_steps=10,
                                    total_steps=args.steps)
    opt = training.chain(training.clip_by_global_norm(1.0),
                         training.adamw(sched))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, tokens, key):
        loss, grads = jax.value_and_grad(
            lambda p: gpt.loss(p, tokens, training=True,
                               rngs={"dropout": key}))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return training.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    it = data.prefetch_to_device(
        data.epochs([corpus], args.batch, num_epochs=100))
    t0 = time.time()
    for i in range(args.steps):
        (batch,) = next(it)
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batch, sub)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}  "
                  f"({(time.time() - t0) / (i + 1) * 1e3:.1f} ms/step avg)")

    if args.ckpt:
        training.save_checkpoint(args.ckpt, params)
        print("saved", args.ckpt)

    sample = gpt.generate(params, tokens0[:1, :8], steps=16)
    print("sample continuation:", np.asarray(sample)[0])


if __name__ == "__main__":
    main()
