"""Mamba: selective state-space LM — the first non-transformer family.

The reference is transformer-only; this adds the Mamba-1 architecture
(Gu & Dao): per block, an input projection to (x, gate), a short causal
depthwise conv (k=4), SiLU, input-dependent SSM parameters
(Δ via softplus of a low-rank projection, B, C read from x), the
selective recurrence ``h_t = exp(Δ_t A)·h_{t-1} + Δ_t B_t x_t``,
``y_t = C_t·h_t + D·x_t``, gated by SiLU(z) and projected back.

TPU-first: the recurrence runs as ``ops.selective_scan`` — a
``jax.lax.associative_scan`` parallel prefix (log-depth, no sequential
loop) with a hand-written reverse-scan VJP — instead of a port of the
CUDA ``selective_scan_fn``. Training/prefill is fully parallel over the
sequence; decode is O(1)/token carrying (conv window, ssm state) per
layer — Mamba's "RNN mode" (no KV cache at all). SSM statistics (Δ,
exp(ΔA), the scan itself) stay fp32; the projections run in the module
``dtype`` (bf16 on the MXU).

HF parity surface: ``transformers.MambaForCausalLM`` (slow path); see
``utils.hf_compat.import_mamba``.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from np_modeling_tpu import ops
from np_modeling_tpu.nn.module import Module
from np_modeling_tpu.models.transformer_lm import GPT


@dataclasses.dataclass
class MambaConfig:
    vocab_size: int = 50280
    d_model: int = 768
    num_layers: int = 24
    d_state: int = 16               # SSM state size N
    d_conv: int = 4                 # causal depthwise conv width
    expand: int = 2                 # d_inner = expand * d_model
    dt_rank: int | None = None      # Δ low-rank; None = ceil(d_model/16)
    ln_eps: float = 1e-5
    tie_embeddings: bool = True
    dtype: object = None            # matmul compute dtype (scan stays fp32)

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def rank(self) -> int:
        return self.dt_rank or math.ceil(self.d_model / 16)


@dataclasses.dataclass
class Mamba(Module):
    config: MambaConfig

    def init(self, key, tokens):
        c = self.config
        di, n, r = c.d_inner, c.d_state, c.rank
        ks = jax.random.split(key, c.num_layers + 2)
        params = {
            "embedding": {"table": 0.02 * jax.random.normal(
                ks[0], (c.vocab_size, c.d_model), jnp.float32)},
            "final_norm": {"gamma": jnp.ones((c.d_model,), jnp.float32)},
        }
        if not c.tie_embeddings:
            params["lm_head"] = {"w": 0.02 * jax.random.normal(
                ks[1], (c.d_model, c.vocab_size), jnp.float32)}
        # Mamba's structured init: A = -[1..N] per channel; dt bias set so
        # softplus lands in [1e-3, 0.1] (the paper's dt_init floor).
        a_row = jnp.arange(1, n + 1, dtype=jnp.float32)
        for i in range(c.num_layers):
            k1, k2, k3, k4, k5, k6 = jax.random.split(ks[2 + i], 6)
            dt = jnp.exp(jax.random.uniform(k6, (di,),
                                            minval=math.log(1e-3),
                                            maxval=math.log(0.1)))
            dt_bias = dt + jnp.log(-jnp.expm1(-dt))    # inverse softplus
            params[f"layer_{i}"] = {
                "norm": {"gamma": jnp.ones((c.d_model,), jnp.float32)},
                "mixer": {
                    "A_log": jnp.log(jnp.broadcast_to(a_row, (di, n))),
                    "D": jnp.ones((di,), jnp.float32),
                    "conv_w": 0.5 * jax.random.normal(
                        k1, (c.d_conv, di), jnp.float32) / c.d_conv,
                    "conv_b": jnp.zeros((di,), jnp.float32),
                    "in_proj": {"w": 0.02 * jax.random.normal(
                        k2, (c.d_model, 2 * di), jnp.float32)},
                    "x_proj": {"w": 0.02 * jax.random.normal(
                        k3, (di, r + 2 * n), jnp.float32)},
                    "dt_proj": {"w": (r ** -0.5) * jax.random.uniform(
                        k4, (r, di), jnp.float32, minval=-1.0, maxval=1.0),
                        "b": dt_bias},
                    "out_proj": {"w": 0.02 * jax.random.normal(
                        k5, (di, c.d_model), jnp.float32)},
                },
            }
        return params

    # ---- one mixer, parallel over the sequence --------------------------

    def _ssm_params(self, p, conv_out):
        """conv_out [.., L?, d_inner] -> (da, db_coeff, C) in fp32."""
        c = self.config
        n, r = c.d_state, c.rank
        proj = conv_out @ p["x_proj"]["w"].astype(conv_out.dtype)
        dt, b_mat, c_mat = jnp.split(
            proj.astype(jnp.float32), [r, r + n], axis=-1)
        dt = jax.nn.softplus(dt @ p["dt_proj"]["w"] + p["dt_proj"]["b"])
        a = -jnp.exp(p["A_log"])                       # [d_inner, n]
        da = jnp.exp(dt[..., None] * a)                # [.., d_inner, n]
        db = dt[..., None] * b_mat[..., None, :]       # [.., d_inner, n]
        return da, db, c_mat

    def _mixer(self, p, x, return_state=False):
        c = self.config
        k = c.d_conv
        w = p["in_proj"]["w"].astype(x.dtype)
        xr, z = jnp.split(x @ w, 2, axis=-1)           # [b, L, d_inner] x2
        pad = jnp.zeros_like(xr[:, :k - 1])
        xp = jnp.concatenate([pad, xr], axis=1)        # causal left-pad
        conv = p["conv_b"].astype(x.dtype)
        for j in range(k):                             # k=4 shifted adds
            conv = conv + p["conv_w"][j].astype(x.dtype) * jax.lax.\
                dynamic_slice_in_dim(xp, j, xr.shape[1], axis=1)
        conv = ops.silu(conv)
        da, db, c_mat = self._ssm_params(p, conv)
        h = ops.selective_scan(da, db * conv.astype(jnp.float32)[..., None])
        y = jnp.einsum("bldn,bln->bld", h, c_mat)
        y = y + p["D"] * conv.astype(jnp.float32)
        y = (y.astype(x.dtype)) * ops.silu(z)
        out = y @ p["out_proj"]["w"].astype(x.dtype)
        if return_state:
            # Decode state: the last k-1 conv inputs + the final SSM state.
            return out, {"conv": xp[:, xr.shape[1]:], "ssm": h[:, -1]}
        return out

    def _mixer_step(self, p, x_t, state):
        """One token: x_t [b, d]; state {conv [b, k-1, d_inner],
        ssm [b, d_inner, n]} -> (y_t, new state)."""
        c = self.config
        w = p["in_proj"]["w"].astype(x_t.dtype)
        xr, z = jnp.split(x_t @ w, 2, axis=-1)         # [b, d_inner] x2
        window = jnp.concatenate([state["conv"], xr[:, None]], axis=1)
        conv = p["conv_b"].astype(x_t.dtype)
        for j in range(c.d_conv):
            conv = conv + p["conv_w"][j].astype(x_t.dtype) * window[:, j]
        conv = ops.silu(conv)
        da, db, c_mat = self._ssm_params(p, conv)
        h = ops.selective_scan_step(
            state["ssm"], da, db * conv.astype(jnp.float32)[..., None])
        y = jnp.einsum("bdn,bn->bd", h, c_mat)
        y = y + p["D"] * conv.astype(jnp.float32)
        y = y.astype(x_t.dtype) * ops.silu(z)
        out = y @ p["out_proj"]["w"].astype(x_t.dtype)
        return out, {"conv": window[:, 1:], "ssm": h}

    # ---- model ----------------------------------------------------------

    def _embed(self, params, tokens):
        c = self.config
        # jnp.asarray: imported tables may be host numpy arrays, which
        # reject traced-index lookups inside the decode scan.
        x = jnp.asarray(params["embedding"]["table"])[tokens]
        return x.astype(c.dtype) if c.dtype is not None else x

    def _logits(self, params, x):
        c = self.config
        x = ops.rms_norm(x.astype(jnp.float32),
                         params["final_norm"]["gamma"], eps=c.ln_eps)
        if c.dtype is not None:
            x = x.astype(c.dtype)
        if c.tie_embeddings:
            table = params["embedding"]["table"].astype(x.dtype)
            return jnp.einsum("...d,vd->...v", x, table,
                              preferred_element_type=jnp.float32
                              ).astype(jnp.float32)
        return (x @ params["lm_head"]["w"].astype(x.dtype)
                ).astype(jnp.float32)

    def _block(self, params, i, x, step_state=None):
        c = self.config
        ln = ops.rms_norm(x.astype(jnp.float32),
                          params[f"layer_{i}"]["norm"]["gamma"],
                          eps=c.ln_eps).astype(x.dtype)
        mix = params[f"layer_{i}"]["mixer"]
        if step_state is not None:
            y, st = self._mixer_step(mix, ln, step_state)
            return x + y, st
        return x + self._mixer(mix, ln)

    def apply(self, params, tokens, training=False, rngs=None):
        """[b, L] int tokens -> fp32 logits [b, L, vocab]."""
        x = self._embed(params, tokens)
        for i in range(self.config.num_layers):
            x = self._block(params, i, x)
        return self._logits(params, x)

    def loss(self, params, tokens, training=False, rngs=None):
        logits = self.apply(params, tokens[:, :-1], training=training)
        ce = ops.softmax_cross_entropy_with_integer_labels(
            logits, tokens[:, 1:])
        return jnp.mean(ce)

    def prefill(self, params, tokens):
        """Forward returning (last-position logits, per-layer decode
        states) — the RNN-mode handoff."""
        x = self._embed(params, tokens)
        states = []
        for i in range(self.config.num_layers):
            ln = ops.rms_norm(x.astype(jnp.float32),
                              params[f"layer_{i}"]["norm"]["gamma"],
                              eps=self.config.ln_eps).astype(x.dtype)
            y, st = self._mixer(params[f"layer_{i}"]["mixer"], ln,
                                return_state=True)
            x = x + y
            states.append(st)
        return self._logits(params, x[:, -1:])[:, 0], states

    def step(self, params, token_t, states):
        """One decode step: [b] tokens -> ([b, vocab] logits, states)."""
        x = self._embed(params, token_t)
        new_states = []
        for i in range(self.config.num_layers):
            x, st = self._block(params, i, x, step_state=states[i])
            new_states.append(st)
        return self._logits(params, x), new_states

    def generate(self, params, prompt_tokens, steps: int, key=None,
                 temperature: float = 0.0, top_k: int | None = None,
                 top_p: float | None = None):
        """Autoregressive decode in RNN mode (jittable scan): parallel
        prefill via the associative scan, then O(1)-state steps."""
        logits, states = self.prefill(params, prompt_tokens)
        next_tok = GPT._sample(logits, key, temperature, 0, top_k, top_p)

        def body(carry, i):
            tok, states = carry
            logits, states = self.step(params, tok, states)
            nxt = GPT._sample(logits, key, temperature, i + 1, top_k, top_p)
            return (nxt, states), tok

        (_, _), toks = jax.lax.scan(body, (next_tok, states),
                                    jnp.arange(steps))
        return jnp.moveaxis(toks, 0, 1)                # [b, steps]
