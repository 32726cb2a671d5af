"""Mixture-of-Experts FFN with GShard-style top-2 routing (expert parallel).

Dispatch/combine are dense einsums against a [tokens, experts, capacity]
routing tensor — the TPU formulation: everything is MXU matmuls with static
shapes, no scatter/gather, and sharding the expert axis over an ``ep`` mesh
axis turns the dispatch einsums into XLA all-to-alls automatically.

(The reference has no MoE at all — this rounds out dp/tp/sp/pp/ep.)
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.nn import initializers
from np_modeling_tpu.nn.module import Module


@dataclasses.dataclass
class MoE(Module):
    """Top-2 routed FFN: router linear -> dispatch -> per-expert 2-layer FFN
    -> weighted combine. Params: router [d, E]; w1 [E, d, ff]; b1 [E, ff];
    w2 [E, ff, d]; b2 [E, d]."""

    num_experts: int
    hidden_units: int
    capacity_factor: float = 1.25
    router_top_k: int = 2         # 2 = GShard; 1 = Switch routing
    activation: str = "relu"
    kernel_init: Callable = initializers.lecun_normal

    def __post_init__(self):
        assert self.router_top_k in (1, 2), "router_top_k must be 1 or 2"

    def init(self, key, x):
        d = x.shape[-1]
        e, ff = self.num_experts, self.hidden_units
        ks = jax.random.split(key, 3)
        return {
            "router": self.kernel_init(ks[0], (d, e)),
            "w1": self.kernel_init(ks[1], (e, d, ff)),
            "b1": jnp.zeros((e, ff)),
            "w2": self.kernel_init(ks[2], (e, ff, d)),
            "b2": jnp.zeros((e, d)),
        }

    def _capacity(self, tokens):
        # ceil(k * T / E * factor), at least 4, rounded to a multiple of 4.
        c = int(self.router_top_k * tokens / self.num_experts
                * self.capacity_factor)
        c = max(c, 4)
        return -(-c // 4) * 4

    def apply(self, params, x, training=False, rngs=None):
        out, _ = self.apply_with_aux(params, x)
        return out

    def apply_with_aux(self, params, x, training=False, rngs=None):
        """Returns (out, load_balancing_aux) — aux feeds the training loss."""
        del training, rngs
        orig = x.shape
        d = orig[-1]
        xt = x.reshape(-1, d)                       # [T, d]
        t = xt.shape[0]
        e = self.num_experts
        cap = self._capacity(t)

        logits = xt @ params["router"]              # [T, E]
        gates = jax.nn.softmax(logits, axis=-1)

        # Top-k expert choice per token (k=2: GShard, gates renormalized
        # over the pair; k=1: Switch, raw softmax gate).
        g1, i1 = jax.lax.top_k(gates, self.router_top_k)
        idx1 = i1[:, 0]
        if self.router_top_k == 2:
            idx2 = i1[:, 1]
            w1g, w2g = g1[:, 0], g1[:, 1]
            denom = jnp.maximum(w1g + w2g, 1e-9)
            w1g, w2g = w1g / denom, w2g / denom
        else:
            w1g = g1[:, 0]

        # Position of each token within its expert's capacity buffer.
        # Second choices are slotted AFTER all first choices of that expert
        # (GShard), so first/second slots can never collide.
        mask1 = jax.nn.one_hot(idx1, e)             # [T, E]
        pos1 = (jnp.cumsum(mask1, axis=0) - 1.0) * mask1
        keep1 = mask1 * (pos1 < cap)

        def routing_tensor(keep, pos, w):
            slot = jax.nn.one_hot(jnp.sum(pos, axis=1).astype(jnp.int32), cap)
            return keep[:, :, None] * slot[:, None, :] * w[:, None, None]

        combine = routing_tensor(keep1, pos1, w1g)       # [T, E, C]
        if self.router_top_k == 2:
            mask2 = jax.nn.one_hot(idx2, e)
            count1 = jnp.sum(mask1, axis=0, keepdims=True)   # [1, E]
            pos2 = (jnp.cumsum(mask2, axis=0) - 1.0 + count1) * mask2
            keep2 = mask2 * (pos2 < cap)
            combine = combine + routing_tensor(keep2, pos2, w2g)
        dispatch = (combine > 0.0).astype(xt.dtype)

        # Dispatch -> per-expert FFN -> combine: all dense einsums.
        expert_in = jnp.einsum("tec,td->ecd", dispatch, xt,
                               preferred_element_type=jnp.float32
                               ).astype(xt.dtype)
        act = ops.get_activation(self.activation)
        h = act(jnp.einsum("ecd,edf->ecf", expert_in, params["w1"])
                + params["b1"][:, None, :])
        expert_out = (jnp.einsum("ecf,efd->ecd", h, params["w2"])
                      + params["b2"][:, None, :])
        out = jnp.einsum("tec,ecd->td", combine.astype(xt.dtype), expert_out,
                         preferred_element_type=jnp.float32).astype(xt.dtype)
        # GShard aux loss: E * Σ_e mean(gate_e)·mean(top1_e) (min 1 balanced).
        top1 = jax.nn.one_hot(idx1, e)
        aux = e * jnp.sum(jnp.mean(gates, axis=0) * jnp.mean(top1, axis=0))
        return out.reshape(orig), aux

    def load_balancing_loss(self, params, x):
        """GShard aux loss: E * Σ_e mean(gate_e) * mean(route1_e)."""
        xt = x.reshape(-1, x.shape[-1])
        gates = jax.nn.softmax(xt @ params["router"], axis=-1)
        top1 = jax.nn.one_hot(jnp.argmax(gates, axis=-1), self.num_experts)
        return self.num_experts * jnp.sum(
            jnp.mean(gates, axis=0) * jnp.mean(top1, axis=0))


# Sharding rules for expert parallelism: expert axis over 'ep'
# (compose with parallel.shard_params).
MOE_RULES = (
    (r".*/w[12]$", jax.sharding.PartitionSpec("ep", None, None)),
    (r".*/b[12]$", jax.sharding.PartitionSpec("ep", None)),
)
