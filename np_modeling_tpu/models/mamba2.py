"""Mamba-2: the state-space-dual (SSD) LM (Dao & Gu, "Transformers are
SSMs").

Architecturally vs Mamba-1: the SSM decay is a SCALAR per head (A [h],
not [d_inner, d_state]), dt/B/C come out of the same input projection
as x (B/C grouped GQA-style over ``n_groups``), x/B/C share one causal
depthwise conv, and the pre-out_proj norm is a GATED RMSNorm
(``norm(y * silu(z))``). The payoff is the SSD form: the whole
recurrence computes as chunked attention-like matmuls (``ops.ssd``) —
the MXU-friendly formulation this framework targets — instead of
Mamba-1's elementwise-heavy selective scan.

TPU-first: training/prefill runs ``ops.ssd`` (chunked einsums + a
log-depth inter-chunk prefix with a hand-written VJP); decode carries
O(1) per-layer state (conv window + [h, p, n] SSM state) through
``ops.ssd_step`` — no KV cache. SSM statistics stay fp32; projections
run in the module ``dtype`` (bf16 on the MXU).

HF parity surface: ``transformers.Mamba2ForCausalLM`` (torch_forward
path); see ``utils.hf_compat.import_mamba2``. Reference lineage: the
reference is transformer-only (SURVEY.md §2); this extends the model
zoo the same way models/mamba.py did.
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
class Mamba2Config:
    vocab_size: int = 32768
    d_model: int = 768
    num_layers: int = 24
    d_state: int = 128              # SSM state size N (Mamba-2 default)
    d_conv: int = 4                 # causal depthwise conv width
    expand: int = 2                 # d_inner = expand * d_model
    head_dim: int = 64              # P; num_heads = d_inner // head_dim
    n_groups: int = 1               # B/C groups (GQA-style broadcast)
    chunk_size: int = 256           # SSD chunk length
    dt_limit: tuple = (0.0, float("inf"))   # clamp on softplus(dt)
    ln_eps: float = 1e-5
    tie_embeddings: bool = True
    dtype: object = None            # matmul compute dtype (SSD stays fp32)

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def num_heads(self) -> int:
        return self.d_inner // self.head_dim

    @property
    def conv_dim(self) -> int:
        return self.d_inner + 2 * self.n_groups * self.d_state


@dataclasses.dataclass
class Mamba2(Module):
    config: Mamba2Config

    def init(self, key, tokens):
        c = self.config
        di, nh, cd = c.d_inner, c.num_heads, c.conv_dim
        assert di % c.head_dim == 0 and nh % c.n_groups == 0
        ks = jax.random.split(key, c.num_layers + 2)
        params = {
            "embedding": {"table": 0.02 * jax.random.normal(
                ks[0], (c.vocab_size, c.d_model), jnp.float32)},
            "final_norm": {"gamma": jnp.ones((c.d_model,), jnp.float32)},
        }
        if not c.tie_embeddings:
            params["lm_head"] = {"w": 0.02 * jax.random.normal(
                ks[1], (c.d_model, c.vocab_size), jnp.float32)}
        for i in range(c.num_layers):
            k1, k2, k3, k4 = jax.random.split(ks[2 + i], 4)
            # Mamba-2 structured init: A = -[1..nh] (scalar per head);
            # dt_bias the inverse-softplus of uniform-log [1e-3, 0.1].
            dt = jnp.exp(jax.random.uniform(k4, (nh,),
                                            minval=math.log(1e-3),
                                            maxval=math.log(0.1)))
            params[f"layer_{i}"] = {
                "norm": {"gamma": jnp.ones((c.d_model,), jnp.float32)},
                "mixer": {
                    "in_proj": {"w": 0.02 * jax.random.normal(
                        k1, (c.d_model, di + cd + nh), jnp.float32)},
                    "conv_w": 0.5 * jax.random.normal(
                        k2, (c.d_conv, cd), jnp.float32) / c.d_conv,
                    "conv_b": jnp.zeros((cd,), jnp.float32),
                    "dt_bias": dt + jnp.log(-jnp.expm1(-dt)),
                    "A_log": jnp.log(jnp.arange(1, nh + 1,
                                                dtype=jnp.float32)),
                    "D": jnp.ones((nh,), jnp.float32),
                    "norm": {"gamma": jnp.ones((di,), jnp.float32)},
                    "out_proj": {"w": 0.02 * jax.random.normal(
                        k3, (di, c.d_model), jnp.float32)},
                },
            }
        return params

    # ---- one mixer -------------------------------------------------------

    def _split_proj(self, p, x):
        c = self.config
        proj = x @ p["in_proj"]["w"].astype(x.dtype)
        return jnp.split(proj, [c.d_inner, c.d_inner + c.conv_dim], axis=-1)

    def _dt(self, p, dt_raw):
        c = self.config
        dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + p["dt_bias"])
        if c.dt_limit != (0.0, float("inf")):
            dt = jnp.clip(dt, c.dt_limit[0], c.dt_limit[1])
        return dt

    def _gate_out(self, p, y_flat, z, x_dtype):
        y = ops.rms_norm(y_flat * ops.silu(z.astype(jnp.float32)),
                         p["norm"]["gamma"], eps=self.config.ln_eps)
        return y.astype(x_dtype) @ p["out_proj"]["w"].astype(x_dtype)

    def _mixer(self, p, x, return_state=False):
        c = self.config
        b, L, _ = x.shape
        nh, g, n, hp = c.num_heads, c.n_groups, c.d_state, c.head_dim
        z, xbc, dt_raw = self._split_proj(p, x)
        k = c.d_conv
        xp = jnp.concatenate([jnp.zeros_like(xbc[:, :k - 1]), xbc], axis=1)
        conv = p["conv_b"].astype(x.dtype)
        for j in range(k):                              # k=4 shifted adds
            conv = conv + p["conv_w"][j].astype(x.dtype) * jax.lax.\
                dynamic_slice_in_dim(xp, j, L, axis=1)
        conv = ops.silu(conv)
        xs, B, C = jnp.split(conv, [c.d_inner, c.d_inner + g * n], axis=-1)
        xs = xs.reshape(b, L, nh, hp)
        dt = self._dt(p, dt_raw)
        A = -jnp.exp(p["A_log"])
        y, final = ops.ssd(xs, dt, A, B.reshape(b, L, g, n),
                           C.reshape(b, L, g, n), chunk_size=c.chunk_size,
                           return_final_state=True)
        y = y + p["D"][:, None] * xs.astype(jnp.float32)   # pre-dt skip
        out = self._gate_out(p, y.reshape(b, L, c.d_inner), z, x.dtype)
        if return_state:
            return out, {"conv": xp[:, L:], "ssm": final}
        return out

    def _mixer_step(self, p, x_t, state):
        """One token: x_t [b, d]; state {conv [b, k-1, conv_dim],
        ssm [b, h, p, n]} -> (y_t, new state)."""
        c = self.config
        b = x_t.shape[0]
        nh, g, n, hp = c.num_heads, c.n_groups, c.d_state, c.head_dim
        z, xbc, dt_raw = self._split_proj(p, x_t)
        window = jnp.concatenate([state["conv"], xbc[:, None]], axis=1)
        conv = p["conv_b"].astype(x_t.dtype)
        for j in range(c.d_conv):
            conv = conv + p["conv_w"][j].astype(x_t.dtype) * window[:, j]
        conv = ops.silu(conv)
        xs, B, C = jnp.split(conv, [c.d_inner, c.d_inner + g * n], axis=-1)
        y, ssm = ops.ssd_step(state["ssm"], xs.reshape(b, nh, hp),
                              self._dt(p, dt_raw), -jnp.exp(p["A_log"]),
                              B.reshape(b, g, n), C.reshape(b, g, n))
        y = y + p["D"][:, None] * xs.reshape(b, nh, hp).astype(jnp.float32)
        out = self._gate_out(p, y.reshape(b, c.d_inner), z, x_t.dtype)
        return out, {"conv": window[:, 1:], "ssm": ssm}

    # ---- model ------------------------------------------------------------

    def _embed(self, params, tokens):
        c = self.config
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

    def init_state(self, batch: int):
        """Zeroed per-layer decode states (the slot template serving
        engines allocate; see serving/ssm_engine.py)."""
        c = self.config
        return [{"conv": jnp.zeros((batch, c.d_conv - 1, c.conv_dim),
                                   jnp.float32),
                 "ssm": jnp.zeros((batch, c.num_heads, c.head_dim,
                                   c.d_state), jnp.float32)}
                for _ in range(c.num_layers)]

    def prefill(self, params, tokens):
        """Forward returning (last-position logits, per-layer decode
        states) — the SSD→RNN-mode handoff."""
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
        """Autoregressive decode in RNN mode (jittable scan): chunked
        SSD prefill, then O(1)-state steps."""
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
