"""Training driver: one jitted train step over explicit (params, opt_state).

Reference parity: /root/reference/train.py:13-46 — a sequential Trainer with
``train(inputs, targets, steps, optimizer_)`` and ``eval(inputs, targets)``.
The TPU-native version compiles forward+loss+backward+update into ONE
``jax.jit`` with donated state (the reference interleaves per-layer weight
updates into its backward sweep; XLA gets the same fusion freedom here).

Improvements over the reference (documented gaps we close):
- dropout/training mode is explicit (the reference always ran dropout in
  eval, train.py:41-46 + normalizations.py:14),
- loss history is returned, and tests assert loss decrease (the reference
  only printed it, train_test.py:39-46),
- optional sharding: pass a Mesh + param sharding rules and the same step
  runs dp/tp-sharded under GSPMD.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.nn.module import Module, Sequential
from np_modeling_tpu.training.optimizers import Optimizer, apply_updates

LOSSES = {
    "mse": ops.mse,
    "cross_entropy": ops.cross_entropy_probs,
    "softmax_cross_entropy": lambda y, t: jnp.mean(ops.softmax_cross_entropy(y, t)),
}


def resolve_loss(loss):
    if callable(loss):
        return loss
    return LOSSES[loss]


def make_train_step(apply_fn: Callable, loss_fn, optimizer: Optimizer,
                    donate: bool = True, grad_accum: int = 1):
    """Build ``step(params, opt_state, x, targets, rng) -> (params, opt_state, loss)``.

    ``apply_fn(params, x, training=True, rngs={'dropout': rng})`` must be the
    model's pure forward. The returned step is jitted with donated state.
    ``grad_accum > 1`` splits the batch into that many microbatches and
    accumulates gradients in a lax.scan before the single optimizer update
    (trades step time for activation memory).
    """
    loss_fn = resolve_loss(loss_fn)

    def grads_of(params, x, targets, rng):
        def objective(p):
            y = apply_fn(p, x, training=True, rngs={"dropout": rng})
            return loss_fn(y, targets)
        return jax.value_and_grad(objective)(params)

    def step(params, opt_state, x, targets, rng):
        if grad_accum == 1:
            loss, grads = grads_of(params, x, targets, rng)
        else:
            b = x.shape[0]
            assert b % grad_accum == 0, (b, grad_accum)
            mb = b // grad_accum
            xs = x.reshape(grad_accum, mb, *x.shape[1:])
            ts = targets.reshape(grad_accum, mb, *targets.shape[1:])

            def micro(carry, inp):
                loss_sum, grads_acc = carry
                xi, ti, i = inp
                li, gi = grads_of(params, xi, ti, jax.random.fold_in(rng, i))
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, gi)
                return (loss_sum + li, grads_acc), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params)
            (loss_sum, grads), _ = jax.lax.scan(
                micro, (jnp.zeros((), jnp.float32), zeros),
                (xs, ts, jnp.arange(grad_accum)))
            loss = loss_sum / grad_accum
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)

        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return apply_updates(params, updates), opt_state2, loss

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(apply_fn: Callable, loss_fn):
    loss_fn = resolve_loss(loss_fn)

    @jax.jit
    def step(params, x, targets):
        y = apply_fn(params, x, training=False)
        return loss_fn(y, targets)

    return step


class Trainer:
    """Convenience driver mirroring the reference Trainer surface."""

    def __init__(self, model: Module | Sequence[Module], loss="mse",
                 optimizer: Optimizer | None = None, seed: int = 0):
        if not isinstance(model, Module):
            model = Sequential(model)
        self.model = model
        self.loss = resolve_loss(loss)
        self.optimizer = optimizer
        self._rng = jax.random.PRNGKey(seed)
        self._train_step = None
        self._eval_step = None

    def init(self, x) -> Any:
        self._rng, sub = jax.random.split(self._rng)
        return self.model.init(sub, x)

    def fit(self, params, inputs, targets, steps: int,
            optimizer: Optimizer | None = None, log_every: int = 0,
            opt_state=None):
        """Run ``steps`` full-batch steps; returns (params, opt_state, losses).

        Full-batch semantics match the reference (train.py:20-39); for real
        workloads call the jitted step yourself with minibatches.

        Pass the returned ``opt_state`` back in to CONTINUE training (Adam
        moments etc. are preserved); omitting it starts from fresh optimizer
        state.
        """
        opt = optimizer or self.optimizer
        assert opt is not None, "provide an optimizer"
        if self._train_step is None:
            self._train_step = make_train_step(self.model.apply, self.loss, opt)
        if opt_state is None:
            opt_state = opt.init(params)
        losses = []
        for i in range(steps):
            self._rng, sub = jax.random.split(self._rng)
            params, opt_state, loss = self._train_step(params, opt_state,
                                                       inputs, targets, sub)
            losses.append(loss)
            if log_every and i % log_every == 0:
                print(f"Step: {i}  Loss: {float(loss):.6f}")
        return params, opt_state, jnp.stack(losses)

    def evaluate(self, params, inputs, targets):
        if self._eval_step is None:
            self._eval_step = make_eval_step(self.model.apply, self.loss)
        return self._eval_step(params, inputs, targets)
