"""Import a HuggingFace GPT-2, LoRA-fine-tune it, and serve it fast.

The full production loop in one script:
  1. import a GPT-2 checkpoint (here: a locally built random-init model —
     swap in ``GPT2LMHeadModel.from_pretrained("gpt2")`` when online),
  2. fine-tune LoRA adapters on synthetic data (base frozen),
  3. bake the adapters in,
  4. quantize weights to int8 for memory,
  5. decode with beam search and speculative decoding.

Usage:
  python examples/finetune_gpt2_lora.py [--steps 30] [--rank 8]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from np_modeling_tpu import models, ops, training
from np_modeling_tpu.utils import hf_compat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-3)
    args = ap.parse_args()

    # 1. Import. (Random-init HF model: this example runs offline.)
    import transformers
    hf = transformers.GPT2LMHeadModel(transformers.GPT2Config(
        vocab_size=1024, n_positions=256, n_embd=256, n_layer=4, n_head=8,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0))
    cfg, base = hf_compat.import_gpt2(hf)
    gpt = models.GPT(cfg)
    print(f"imported GPT-2: {cfg.num_layers}L d{cfg.d_model} "
          f"vocab {cfg.vocab_size}")

    # 2. LoRA fine-tune (synthetic next-token data).
    key = jax.random.PRNGKey(0)
    toks = jax.random.randint(key, (8, 64), 0, cfg.vocab_size)
    lora = training.lora_init(key, base, rank=args.rank,
                              match=training.ALL_LINEAR_TARGETS)
    opt = training.adam(args.lr)
    state = opt.init(lora)

    @jax.jit
    def step(lora, state):
        loss, g = jax.value_and_grad(
            lambda lo: gpt.loss(training.lora_merge(base, lo), toks))(lora)
        u, state = opt.update(g, state, lora)
        return training.apply_updates(lora, u), state, loss

    for i in range(args.steps):
        lora, state, loss = step(lora, state)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.4f}")

    n_ad = sum(x.size for x in jax.tree_util.tree_leaves(lora))
    n_base = sum(x.size for x in jax.tree_util.tree_leaves(base))
    print(f"adapters: {n_ad:,} params ({100 * n_ad / n_base:.1f}% of base)")

    # 3.-4. Bake + quantize.
    tuned = training.lora_finalize(base, lora)
    qparams = ops.quantize_params_int8(tuned)
    nb = lambda t: sum(x.nbytes for x in jax.tree_util.tree_leaves(t))
    print(f"int8 weights: {nb(qparams) / nb(tuned):.2f}x the fp32 bytes")
    serving_params = ops.dequantize_params(qparams, jnp.float32)

    # 5. Decode: beam search + speculative (draft = the un-tuned base).
    prompt = toks[:1, :8]
    seqs, scores = models.beam_search(gpt, serving_params, prompt, steps=16,
                                      beam_size=4)
    print(f"beam top hypothesis (score {float(scores[0, 0]):.2f}):",
          np.asarray(seqs)[0, 0][:8], "...")
    spec, (acc, rounds) = models.speculative_generate(
        gpt, serving_params, gpt, base, prompt, steps=16, gamma=4,
        return_stats=True)
    rate = float(acc) / (float(rounds) * 4)
    print(f"speculative decode: {np.asarray(spec)[0][:8]} ... "
          f"(draft acceptance {rate:.0%})")


if __name__ == "__main__":
    main()
