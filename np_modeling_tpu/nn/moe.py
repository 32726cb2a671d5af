"""Mixture-of-Experts FFN with GShard-style top-2 routing (expert parallel).

Three dispatch formulations, one routing semantics:

- ``dense``: dispatch/combine as einsums against a [tokens, experts,
  capacity] routing tensor — everything is MXU matmuls with static shapes.
  The right formulation for SMALL expert counts; O(T*E*C) memory makes it
  quadratic waste at scale.
- ``sorted``: assignments sorted by (expert, choice-rank, token), tokens
  scattered into per-expert capacity buffers [E, C, d], batched expert
  FFN, gather-combine. O(k*T*d + E*C*d) memory — no [T, E, C] tensor —
  and BITWISE the same routing as ``dense`` (same GShard slotting: second
  choices after all first choices; equality asserted in tests).
- no-drop (``capacity_factor=None``): every token reaches its top-k
  experts — no capacity, no dropping. Sorted tokens hit
  ``jax.lax.ragged_dot`` grouped matmuls (the TPU MoE kernel shape);
  O(k*T*(d+ff)) memory, population-INDEPENDENT routing: a token's output
  no longer depends on what else is in the batch, which is what makes
  chunked serving prefill exact (serving/engine.py).

Expert parallelism at scale: :func:`make_expert_parallel_moe` builds a
shard_map all-to-all dispatch — each device routes ITS token group, sends
per-expert capacity blocks over the ``ep`` axis with ``lax.all_to_all``,
runs its local experts, and sends results back. Per-device memory is
O(k*T_local*f*d); no dense [T, E, C] anywhere. Routing is GShard GROUPED
routing (capacity per local group), equal to applying the sorted
single-device MoE per group (asserted in tests).

Router stats (dropped-token fraction, per-expert load) surface via
``apply_with_aux(..., collect_stats=True)``.

(The reference has no MoE at all — this rounds out dp/tp/sp/pp/ep.)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from np_modeling_tpu import ops
from np_modeling_tpu.nn import initializers
from np_modeling_tpu.nn.module import Module


@dataclasses.dataclass
class MoE(Module):
    """Top-k routed FFN: router linear -> dispatch -> per-expert FFN ->
    weighted combine.

    Expert form (``ffn``): "mlp" — 2-layer FFN, params router [d, E];
    w1 [E, d, ff]; b1 [E, ff]; w2 [E, ff, d]; b2 [E, d]. "swiglu" /
    "geglu" — gated biasless experts (Mixtral-style), params router;
    w_gate [E, d, ff]; w_up [E, d, ff]; w_down [E, ff, d] with
    silu (resp. gelu) gating."""

    num_experts: int
    hidden_units: int
    capacity_factor: Optional[float] = 1.25   # None = NO-DROP routing
    router_top_k: int = 2         # 2 = GShard; 1 = Switch routing
    router_weights: str = "default"  # combine weights: "default" (GShard:
                                  # renormalize iff k == 2, raw for k == 1)
                                  # | "softmax" (raw top-k softmax gates,
                                  # any k — DeepSeek greedy) |
                                  # "softmax_norm" (renormalized, any k —
                                  # Mixtral generalized) | "topk_softmax"
                                  # (gpt-oss: top-k over the raw LOGITS,
                                  # then softmax over the kept k values)
    router_bias: bool = False     # router linear carries a bias (gpt-oss)
    router_score: str = "softmax" # expert scores from the router logits:
                                  # "softmax" | "sigmoid" (DeepSeek-V3)
    router_select_bias: bool = False  # DeepSeek-V3 noaux-tc: a per-expert
                                  # bias ("e_score_correction_bias") added
                                  # to the scores for SELECTION only —
                                  # combine weights still come from the
                                  # unbiased scores. (In DeepSeek's aux-
                                  # free balancing this bias is adjusted
                                  # online, not by gradient.)
    routed_scaling: float = 1.0   # multiply combine weights (DeepSeek
                                  # routed_scaling_factor)
    router_groups: object = None  # (n_group, topk_group): DeepSeek
                                  # group-limited routing — experts are
                                  # split into n_group equal groups, only
                                  # the topk_group groups with the highest
                                  # per-group score stay eligible
    router_group_metric: str = "max"  # per-group score: "max" (DeepSeek-V2
                                  # group_limited_greedy) | "top2sum"
                                  # (DeepSeek-V3: sum of the top-2 biased
                                  # scores in the group)
    shared_experts_units: int = 0 # >0: an ALWAYS-ON gated FFN of this many
                                  # hidden units added to the routed output
                                  # (DeepSeek shared experts; gated ffn only)
    activation: str = "relu"      # mlp experts only (gated forms fix silu/gelu)
    ffn: str = "mlp"              # "mlp" | "swiglu" | "geglu"
    kernel_init: Callable = initializers.lecun_normal
    dispatch_impl: str = "auto"   # dense | sorted | auto (sorted iff E > 8)
    apply_override: Optional[Callable] = None  # e.g. the shard_map
                                  # all-to-all EP path from
                                  # make_expert_parallel_moe; called as
                                  # f(params, x) -> (out, aux)

    def __post_init__(self):
        assert self.router_top_k >= 1
        assert self.router_weights in ("default", "softmax",
                                       "softmax_norm", "topk_softmax")
        assert self.router_score in ("softmax", "sigmoid")
        assert self.router_group_metric in ("max", "top2sum")
        if self.router_score == "sigmoid":
            assert self.router_weights in ("softmax", "softmax_norm"), (
                "sigmoid scoring takes raw ('softmax') or renormalized "
                "('softmax_norm') kept weights")
        if self.router_weights == "default":
            assert self.router_top_k in (1, 2), (
                "k > 2 needs an explicit weight rule: router_weights="
                "'softmax' (DeepSeek) or 'softmax_norm'")
        assert self.dispatch_impl in ("auto", "dense", "sorted")
        assert self.ffn in ("mlp", "swiglu", "geglu", "glu_clamp"), self.ffn
        if self.shared_experts_units:
            assert self.ffn not in ("mlp", "glu_clamp"), (
                "shared experts are plain-gated-FFN only")

    def init(self, key, x):
        d = x.shape[-1]
        e, ff = self.num_experts, self.hidden_units
        ks = jax.random.split(key, 4 if self.ffn != "mlp" else 3)
        if self.ffn != "mlp":
            params = {
                "router": self.kernel_init(ks[0], (d, e)),
                "w_gate": self.kernel_init(ks[1], (e, d, ff)),
                "w_up": self.kernel_init(ks[2], (e, d, ff)),
                "w_down": self.kernel_init(ks[3], (e, ff, d)),
            }
            if self.router_bias:
                params["router_b"] = jnp.zeros((e,))
            if self.router_select_bias:
                params["router_sb"] = jnp.zeros((e,))
            if self.ffn == "glu_clamp":      # gpt-oss: biased experts
                params["b_gate"] = jnp.zeros((e, ff))
                params["b_up"] = jnp.zeros((e, ff))
                params["b_down"] = jnp.zeros((e, d))
            if self.shared_experts_units:
                sf = self.shared_experts_units
                sk = jax.random.split(jax.random.fold_in(key, 404), 3)
                params["shared"] = {
                    "w_gate": self.kernel_init(sk[0], (d, sf)),
                    "w_up": self.kernel_init(sk[1], (d, sf)),
                    "w_down": self.kernel_init(sk[2], (sf, d)),
                }
            return params
        params = {
            "router": self.kernel_init(ks[0], (d, e)),
            "w1": self.kernel_init(ks[1], (e, d, ff)),
            "b1": jnp.zeros((e, ff)),
            "w2": self.kernel_init(ks[2], (e, ff, d)),
            "b2": jnp.zeros((e, d)),
        }
        if self.router_select_bias:
            params["router_sb"] = jnp.zeros((e,))
        return params

    def _expert_param_names(self):
        return (("w_gate", "w_up", "w_down") if self.ffn != "mlp"
                else ("w1", "b1", "w2", "b2"))

    def _gate_act(self):
        return ops.get_activation("silu" if self.ffn == "swiglu" else "gelu")

    @staticmethod
    def _glu_clamp(gate, up, limit=7.0, alpha=1.702):
        """gpt-oss expert nonlinearity: clamped gate through a scaled
        sigmoid GLU, (up + 1) residual-style multiplier."""
        gate = jnp.minimum(gate, limit)
        up = jnp.clip(up, -limit, limit)
        return (up + 1.0) * (gate * jax.nn.sigmoid(alpha * gate))

    def _capacity(self, tokens):
        # ceil(k * T / E * factor), at least 4, rounded to a multiple of 4.
        c = int(self.router_top_k * tokens / self.num_experts
                * self.capacity_factor)
        c = max(c, 4)
        return -(-c // 4) * 4

    def _impl(self):
        if self.capacity_factor is None:
            return "nodrop"
        if self.dispatch_impl == "auto":
            return "sorted" if self.num_experts > 8 else "dense"
        return self.dispatch_impl

    def apply(self, params, x, training=False, rngs=None):
        out, _ = self.apply_with_aux(params, x)
        return out

    # ---- routing (shared by all impls) ---------------------------------

    def _route(self, xt, params):
        """Per-token top-k choice: (gates [T,E], idx [T,k], w [T,k])."""
        logits = xt @ params["router"]              # [T, E]
        if "router_b" in params:
            logits = logits + params["router_b"]
        gates = (jax.nn.sigmoid(logits) if self.router_score == "sigmoid"
                 else jax.nn.softmax(logits, axis=-1))
        if self.router_weights == "topk_softmax":
            # gpt-oss: top-k over the raw logits, softmax over the kept k.
            g, i = jax.lax.top_k(logits, self.router_top_k)
            w = jax.nn.softmax(g, axis=-1)
            if self.routed_scaling != 1.0:
                w = w * self.routed_scaling
            return gates, i, w
        # Selection pool: scores plus the DeepSeek-V3 correction bias
        # (bias steers WHICH experts win; combine weights stay unbiased).
        pool = (gates + params["router_sb"] if "router_sb" in params
                else gates)
        if self.router_groups is not None:
            n_group, topk_group = self.router_groups
            e = self.num_experts
            assert e % n_group == 0
            gg = pool.reshape(-1, n_group, e // n_group)
            if self.router_group_metric == "top2sum":   # DeepSeek-V3
                group_best = jnp.sum(jax.lax.top_k(gg, 2)[0], axis=-1)
            else:
                group_best = jnp.max(gg, axis=-1)              # [T, G]
            _, gi = jax.lax.top_k(group_best, topk_group)
            keep_g = jnp.sum(jax.nn.one_hot(gi, n_group), axis=1)  # [T, G]
            # Ineligible groups' scores -> 0 (HF masked_fill semantics);
            # the top-k below then never selects them.
            pool = (gg * keep_g[:, :, None]).reshape(-1, e)
        g, i = jax.lax.top_k(pool, self.router_top_k)
        if "router_sb" in params:
            # The kept weights are the UNBIASED scores of the winners.
            g = jnp.take_along_axis(gates, i, axis=1)
        if self.router_weights == "softmax":
            w = g                                   # raw gates (DeepSeek)
        elif self.router_weights == "softmax_norm":
            w = g / jnp.maximum(jnp.sum(g, axis=1, keepdims=True), 1e-9)
        elif self.router_top_k == 2:                # legacy GShard
            denom = jnp.maximum(g[:, 0] + g[:, 1], 1e-9)
            w = jnp.stack([g[:, 0] / denom, g[:, 1] / denom], axis=1)
        else:
            w = g
        if self.routed_scaling != 1.0:
            w = w * self.routed_scaling
        return gates, i, w

    @staticmethod
    def _aux(gates, idx):
        e = gates.shape[-1]
        top1 = jax.nn.one_hot(idx[:, 0], e)
        return e * jnp.sum(jnp.mean(gates, axis=0) * jnp.mean(top1, axis=0))

    def apply_with_aux(self, params, x, training=False, rngs=None,
                       collect_stats=False):
        """Returns (out, load_balancing_aux) — aux feeds the training loss.
        ``collect_stats=True`` additionally returns a dict with
        ``dropped_fraction`` (of the k*T routed assignments) and
        ``expert_load`` (fraction of tokens whose FIRST choice is each
        expert)."""
        del training, rngs
        if self.apply_override is not None:
            assert not collect_stats, (
                "collect_stats is unsupported with apply_override (the "
                "shard_map EP path returns only (out, aux))")
            return self.apply_override(params, x)
        orig = x.shape
        xt = x.reshape(-1, orig[-1])
        impl = self._impl()
        if impl == "dense":
            out, aux, stats = self._apply_dense(params, xt)
        elif impl == "sorted":
            out, aux, stats = self._apply_sorted(params, xt)
        else:
            out, aux, stats = self._apply_nodrop(params, xt)
        if self.shared_experts_units:
            sp = params["shared"]
            g = self._gate_act()(xt @ sp["w_gate"])
            out = out + ((g * (xt @ sp["w_up"])) @ sp["w_down"]).astype(
                out.dtype)
        out = out.reshape(orig)
        if collect_stats:
            return out, aux, stats
        return out, aux

    # ---- dense [T, E, C] dispatch (small E) ----------------------------

    def _apply_dense(self, params, xt):
        t = xt.shape[0]
        e = self.num_experts
        cap = self._capacity(t)
        gates, i_k, w_k = self._route(xt, params)

        # Position of each token within its expert's capacity buffer.
        # Rank-r choices are slotted AFTER all rank-(r-1) choices of that
        # expert (GShard), so slots of different ranks never collide.
        def routing_tensor(keep, pos, w):
            slot = jax.nn.one_hot(jnp.sum(pos, axis=1).astype(jnp.int32), cap)
            return keep[:, :, None] * slot[:, None, :] * w[:, None, None]

        combine = jnp.zeros((t, e, cap), jnp.float32)
        kept = jnp.zeros(())
        count_prev = jnp.zeros((1, e))
        for r in range(self.router_top_k):
            mask_r = jax.nn.one_hot(i_k[:, r], e)        # [T, E]
            pos_r = (jnp.cumsum(mask_r, axis=0) - 1.0 + count_prev) * mask_r
            keep_r = mask_r * (pos_r < cap)
            combine = combine + routing_tensor(keep_r, pos_r, w_k[:, r])
            kept = kept + jnp.sum(keep_r)
            count_prev = count_prev + jnp.sum(mask_r, axis=0, keepdims=True)
        dispatch = (combine > 0.0).astype(xt.dtype)

        # Dispatch -> per-expert FFN -> combine: all dense einsums.
        expert_in = jnp.einsum("tec,td->ecd", dispatch, xt,
                               preferred_element_type=jnp.float32
                               ).astype(xt.dtype)
        expert_out = self._expert_ffn(params, expert_in)
        out = jnp.einsum("tec,ecd->td", combine.astype(xt.dtype), expert_out,
                         preferred_element_type=jnp.float32).astype(xt.dtype)
        stats = {
            "dropped_fraction": 1.0 - kept / (self.router_top_k * t),
            "expert_load": jnp.mean(jax.nn.one_hot(i_k[:, 0], e), axis=0),
        }
        return out, self._aux(gates, i_k), stats

    def _expert_ffn(self, params, expert_in):
        """[E, C, d] -> [E, C, d] batched expert FFN (mlp or gated)."""
        if self.ffn == "glu_clamp":
            g = (jnp.einsum("ecd,edf->ecf", expert_in, params["w_gate"])
                 + params["b_gate"][:, None])
            u = (jnp.einsum("ecd,edf->ecf", expert_in, params["w_up"])
                 + params["b_up"][:, None])
            h = self._glu_clamp(g, u)
            return (jnp.einsum("ecf,efd->ecd", h, params["w_down"])
                    + params["b_down"][:, None])
        if self.ffn != "mlp":
            g = self._gate_act()(
                jnp.einsum("ecd,edf->ecf", expert_in, params["w_gate"]))
            h = g * jnp.einsum("ecd,edf->ecf", expert_in, params["w_up"])
            return jnp.einsum("ecf,efd->ecd", h, params["w_down"])
        act = ops.get_activation(self.activation)
        h = act(jnp.einsum("ecd,edf->ecf", expert_in, params["w1"])
                + params["b1"][:, None, :])
        return (jnp.einsum("ecf,efd->ecd", h, params["w2"])
                + params["b2"][:, None, :])

    # ---- sorted dispatch (scatter into [E, C, d]; no [T, E, C]) --------

    def _assignments(self, xt, params):
        """Flattened routing assignments in GShard slot order.

        Returns (gates, i_k, sorted (tok, expert, weight, pos-in-expert)).
        Sort key (expert, choice-rank, token) reproduces the dense path's
        slotting exactly: all first choices of an expert precede its second
        choices, token order within each class preserved."""
        t = xt.shape[0]
        k = self.router_top_k
        gates, i_k, w_k = self._route(xt, params)
        tok = jnp.tile(jnp.arange(t), k)                    # [kT]
        exp = i_k.T.reshape(-1)                             # rank-major
        wgt = w_k.T.reshape(-1)
        rank = jnp.repeat(jnp.arange(k), t)
        key = exp * (k * t) + rank * t + tok                # unique
        order = jnp.argsort(key)
        tok_s, exp_s, wgt_s = tok[order], exp[order], wgt[order]
        # Position within expert = running index - expert segment start.
        counts = jnp.bincount(exp_s, length=self.num_experts)
        starts = jnp.cumsum(counts) - counts
        pos_s = jnp.arange(k * t) - starts[exp_s]
        return gates, i_k, (tok_s, exp_s, wgt_s, pos_s, counts)

    def _apply_sorted(self, params, xt):
        t, d = xt.shape
        e = self.num_experts
        cap = self._capacity(t)
        gates, i_k, (tok_s, exp_s, wgt_s, pos_s, _) = \
            self._assignments(xt, params)
        keep = pos_s < cap
        slot = jnp.where(keep, exp_s * cap + pos_s, e * cap)  # dump slot

        buf = jnp.zeros((e * cap + 1, d), xt.dtype).at[slot].set(xt[tok_s])
        expert_out = self._expert_ffn(params, buf[:-1].reshape(e, cap, d)
                                      .astype(xt.dtype))
        out_pad = jnp.concatenate(
            [expert_out.reshape(e * cap, d),
             jnp.zeros((1, d), expert_out.dtype)])
        contrib = (wgt_s * keep)[:, None] * out_pad[slot]
        out = jnp.zeros((t, d), jnp.float32).at[tok_s].add(contrib)
        stats = {
            "dropped_fraction": 1.0 - jnp.sum(keep) / keep.shape[0],
            "expert_load": jnp.mean(jax.nn.one_hot(i_k[:, 0], e), axis=0),
        }
        return out.astype(xt.dtype), self._aux(gates, i_k), stats

    # ---- no-drop routing (ragged grouped matmuls; serving-exact) -------

    def _apply_nodrop(self, params, xt):
        t, d = xt.shape
        e = self.num_experts
        gates, i_k, (tok_s, exp_s, wgt_s, _, counts) = \
            self._assignments(xt, params)
        x_s = xt[tok_s]
        gs = counts.astype(jnp.int32)
        if self.ffn == "glu_clamp":
            # jnp.asarray: imported params may be host numpy arrays, which
            # cannot be fancy-indexed by a traced exp_s inside scan.
            g = (jax.lax.ragged_dot(x_s, params["w_gate"].astype(x_s.dtype),
                                    gs) + jnp.asarray(params["b_gate"])[exp_s])
            u = (jax.lax.ragged_dot(x_s, params["w_up"].astype(x_s.dtype),
                                    gs) + jnp.asarray(params["b_up"])[exp_s])
            h = self._glu_clamp(g, u)
            y = (jax.lax.ragged_dot(h.astype(x_s.dtype),
                                    params["w_down"].astype(x_s.dtype), gs)
                 + jnp.asarray(params["b_down"])[exp_s])
        elif self.ffn != "mlp":
            g = self._gate_act()(jax.lax.ragged_dot(
                x_s, params["w_gate"].astype(x_s.dtype), gs))
            h = g * jax.lax.ragged_dot(
                x_s, params["w_up"].astype(x_s.dtype), gs)
            y = jax.lax.ragged_dot(h.astype(x_s.dtype),
                                   params["w_down"].astype(x_s.dtype), gs)
        else:
            act = ops.get_activation(self.activation)
            h = act(jax.lax.ragged_dot(x_s, params["w1"].astype(x_s.dtype),
                                       gs)
                    + jnp.asarray(params["b1"])[exp_s])
            y = (jax.lax.ragged_dot(h.astype(x_s.dtype),
                                    params["w2"].astype(x_s.dtype), gs)
                 + jnp.asarray(params["b2"])[exp_s])
        out = jnp.zeros((t, d), jnp.float32).at[tok_s].add(
            wgt_s[:, None] * y)
        stats = {
            "dropped_fraction": jnp.zeros(()),
            "expert_load": jnp.mean(jax.nn.one_hot(i_k[:, 0], e), axis=0),
        }
        return out.astype(xt.dtype), self._aux(gates, i_k), stats

    def load_balancing_loss(self, params, x):
        """GShard aux loss: E * Σ_e mean(gate_e) * mean(route1_e)."""
        xt = x.reshape(-1, x.shape[-1])
        logits = xt @ params["router"]
        if "router_b" in params:
            logits = logits + params["router_b"]
        gates = jax.nn.softmax(logits, axis=-1)
        top1 = jax.nn.one_hot(jnp.argmax(gates, axis=-1), self.num_experts)
        return self.num_experts * jnp.sum(
            jnp.mean(gates, axis=0) * jnp.mean(top1, axis=0))


# Sharding rules for expert parallelism: expert axis over 'ep'
# (compose with parallel.shard_params).
MOE_RULES = (
    (r".*/w[12]$", jax.sharding.PartitionSpec("ep", None, None)),
    (r".*/b[12]$", jax.sharding.PartitionSpec("ep", None)),
    # Gated (Mixtral-style) experts: 3-D [E, d, ff] / [E, ff, d] weights.
    (r".*moe/w_(gate|up|down)$",
     jax.sharding.PartitionSpec("ep", None, None)),
)


def make_expert_parallel_moe(mesh, moe: MoE, ep_axis: str = "ep",
                             batch_axes=None):
    """shard_map all-to-all expert parallelism — NO dense [T, E, C] tensor.

    Each device routes its LOCAL token group (GShard grouped routing:
    capacity per group), scatters them into per-expert capacity blocks
    [E, C_local, d], exchanges blocks over ``ep_axis`` with
    ``lax.all_to_all`` so every device receives all groups' tokens for ITS
    experts, runs the local expert FFNs on [E_local, ep*C_local, d], and
    reverses the exchange for the local combine. Per-device memory is
    O(k * T_local * factor * d).

    ``batch_axes``: mesh axes sharding the token batch dim (default: dp+ep
    when the mesh has a 'dp' axis, else just ep). Expert params are
    sharded over ``ep_axis`` on their leading axis (MOE_RULES layout);
    the router is replicated.

    Returns f(params, x) -> (out, aux) — drop it into
    ``moe.apply_override`` to serve every MoE call site (transformer
    blocks, GPT stacks) without touching model code. Equal to applying the
    sorted single-device MoE per token group (asserted in tests).
    """
    e = moe.num_experts
    n_ep = mesh.shape[ep_axis]
    assert e % n_ep == 0, (e, n_ep)
    assert moe.capacity_factor is not None, (
        "the all_to_all EP path needs static per-expert block sizes; "
        "no-drop routing (capacity_factor=None) has data-dependent group "
        "sizes — serve those single-device (ragged_dot) or set a factor")
    if batch_axes is None:
        batch_axes = (("dp", ep_axis) if "dp" in mesh.axis_names
                      else (ep_axis,))
    data_spec = P(batch_axes)
    expert_names = moe._expert_param_names()
    pspecs = {"router": P(), **{k: P(ep_axis) for k in expert_names}}

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(pspecs, data_spec),
                       out_specs=(data_spec, P()),
                       check_vma=False)
    def fn(params, x):
        orig = x.shape
        d = orig[-1]
        xt = x.reshape(-1, d)
        t = xt.shape[0]
        cap = moe._capacity(t)

        gates, i_k, (tok_s, exp_s, wgt_s, pos_s, _) = \
            moe._assignments(xt, params)
        keep = pos_s < cap
        slot = jnp.where(keep, exp_s * cap + pos_s, e * cap)
        buf = jnp.zeros((e * cap + 1, d), xt.dtype).at[slot].set(xt[tok_s])

        # [E, C, d] -> exchange -> this device holds ALL groups' blocks for
        # its E/ep experts: [E_local, ep*C, d].
        blocks = buf[:-1].reshape(n_ep, e // n_ep, cap, d)
        recv = jax.lax.all_to_all(blocks, ep_axis, split_axis=0,
                                  concat_axis=0, tiled=False)
        recv = jnp.swapaxes(recv, 0, 1).reshape(e // n_ep, n_ep * cap, d)

        local_params = {k: params[k] for k in expert_names}
        expert_out = moe._expert_ffn(local_params, recv.astype(xt.dtype))

        # Reverse exchange: back to [E, C, d] of THIS group's tokens.
        back = jnp.swapaxes(
            expert_out.reshape(e // n_ep, n_ep, cap, d), 0, 1)
        back = jax.lax.all_to_all(back, ep_axis, split_axis=0,
                                  concat_axis=0, tiled=False)
        out_pad = jnp.concatenate(
            [back.reshape(e * cap, d),
             jnp.zeros((1, d), back.dtype)])
        contrib = (wgt_s * keep)[:, None] * out_pad[slot]
        out = jnp.zeros((t, d), jnp.float32).at[tok_s].add(contrib)

        aux = moe._aux(gates, i_k)
        aux = jax.lax.pmean(aux, batch_axes)
        return out.astype(xt.dtype).reshape(orig), aux

    return fn
