"""Ablation-profile the flash attention forward kernel on the real TPU.

Strips suspected-expensive pieces out of a COPY of the fwd tile (results
are numerically wrong for the stripped variants — this measures cost, not
correctness) and times each against a same-run chip probe, then isolates
the backward kernels by consuming only dq / only dk+dv (XLA DCEs the
other kernel).

MEASURED so far (2026-08-17, probe 154-162 TF/s, b4 h8 s4096 d128 causal
bf16): base 4.91 ms; no causal mask 4.84; row-sum via MXU ones-matmul
5.18 (slower); no max bookkeeping 4.64 — the online-softmax VPU work is
NOT the bottleneck (<6% each), consistent with jax flash_attention
(4.57 ms) and splash (4.87 ms) landing at the same speed: the bound is
the d=128-contraction score-matmul pipeline itself. The dq kernel's
marginal cost measured ~2.2 ms (fwd+dq 7.0 vs fwd 4.8) — see
bench_attention_compare.py for the cross-implementation table.
"""
import functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import bench_probe
from np_modeling_tpu.ops.attention import (
    _tile_mask, _should_run, _band_ok, _pad4, DEFAULT_MASK_VALUE, NUM_LANES)
from np_modeling_tpu.ops.matmul import round_up

b, h, s, d = 4, 8, 4096, 128
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32)
                         ).astype(jnp.bfloat16)
q, k, v = mk(), mk(), mk()
FL = 4 * b * h * s * s * d * 0.5


def fwd_tile(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
             causal, kv_len, block_q, block_kv, n_kv, mode):
    q_idx, kv_idx = pl.program_id(2), pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = _should_run(q_idx, kv_idx, causal, None, block_q, block_kv)

    @pl.when(should_run)
    def _run():
        qt, kt = q_ref[0, 0], k_ref[0, 0]
        st = jax.lax.dot_general(qt, kt, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if "nomask" not in mode:
            st = _tile_mask(st, q_idx, kv_idx, causal, None, kv_len, block_q,
                            block_kv, n_kv, None, None)
        m_prev, l_prev = m_scr[...], l_scr[...]
        if "nomax" in mode:
            # fixed m: no running max, no rescale
            p = jnp.exp(st) if "noexp" not in mode else st
            if "mxusum" in mode:
                ones = jnp.ones((block_kv, NUM_LANES), p.dtype)
                lsum = jax.lax.dot_general(
                    p, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                lsum = jnp.sum(p, axis=1)[:, None]
            l_scr[...] = l_prev + lsum
            vt = v_ref[0, 0]
            pv = jax.lax.dot_general(p.astype(vt.dtype), vt,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_scr[...] += pv
        else:
            m_curr = jnp.max(st, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(st - m_next[:, 0:1]) if "noexp" not in mode \
                else (st - m_next[:, 0:1])
            if "mxusum" in mode:
                ones = jnp.ones((block_kv, NUM_LANES), jnp.float32)
                lsum = jax.lax.dot_general(
                    p, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                lsum = jnp.sum(p, axis=1)[:, None]
            l_next = alpha * l_prev + lsum
            m_scr[...], l_scr[...] = m_next, l_next
            vt = v_ref[0, 0]
            pv = jax.lax.dot_general(p.astype(vt.dtype), vt,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + pv

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv[:, 0:1]).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[...] + jnp.log(jnp.where(l == 0., 1., l)))


def run_fwd(q, k, v, mode, block=1024, causal=True):
    bq = bkv = block
    bb, hh, sq, dd = q.shape
    skv = k.shape[2]
    sq_p, skv_p, d_p = round_up(sq, bq), round_up(skv, bkv), round_up(dd, 128)
    qp, kp, vp = _pad4(q, sq_p, d_p), _pad4(k, skv_p, d_p), _pad4(v, skv_p, d_p)
    n_kv = skv_p // bkv
    grid = (bb, hh, sq_p // bq, n_kv)
    tile = functools.partial(fwd_tile, causal=causal, kv_len=skv, block_q=bq,
                             block_kv=bkv, n_kv=n_kv, mode=mode)

    def kv_map(ib, ih, iq, ik):
        ok = _band_ok(iq, ik, causal, None, bq, bkv)
        if ok is not None:
            ik = jax.lax.select(ok, ik, 0)
        return (ib, ih, ik, 0)

    o, lse = pl.pallas_call(
        tile, grid=grid,
        in_specs=[pl.BlockSpec((1, 1, bq, d_p), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
                  pl.BlockSpec((1, 1, bkv, d_p), kv_map),
                  pl.BlockSpec((1, 1, bkv, d_p), kv_map)],
        out_specs=[pl.BlockSpec((1, 1, bq, d_p), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
                   pl.BlockSpec((1, 1, bq, NUM_LANES), lambda ib, ih, iq, ik: (ib, ih, iq, 0))],
        out_shape=[jax.ShapeDtypeStruct((bb, hh, sq_p, d_p), q.dtype),
                   jax.ShapeDtypeStruct((bb, hh, sq_p, NUM_LANES), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bq, NUM_LANES), jnp.float32),
                        pltpu.VMEM((bq, NUM_LANES), jnp.float32),
                        pltpu.VMEM((bq, d_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
    )(qp, kp, vp)
    return o[:, :, :sq, :dd]


MODES = ["base", "noexp", "nomask+nomax+mxusum",
         "nomask+noexp+nomax+mxusum"]

p0 = bench_probe.probe()
print(f"probe {p0:.0f}", flush=True)
for mode in MODES:
    f = lambda qc: run_fwd(qc, k, v, mode)
    t = bench_probe._timed_scan(f, q, n=8)
    print(f"{mode:30s} {t*1e3:6.2f}ms {FL/t/1e12:5.0f}TF", flush=True)
p1 = bench_probe.probe()
print(f"probe {p1:.0f}")


# ---- isolate backward kernels: dq-only vs dkv-only (via consumed grads) ----
from np_modeling_tpu import ops

def g_dq(qc):
    g = jax.grad(lambda q2: jnp.sum(
        ops.flash_attention(q2, k, v, causal=True).astype(jnp.float32) ** 2
    ))(qc)
    return (qc + 1e-4 * g).astype(jnp.bfloat16)

def g_dkv(qc):
    g = jax.grad(lambda t: jnp.sum(
        ops.flash_attention(qc, t[0], t[1], causal=True).astype(jnp.float32)
        ** 2))((k, v))
    return (qc + 1e-4 * (g[0] + g[1])).astype(jnp.bfloat16)

def g_all(qc):
    g = jax.grad(lambda t: jnp.sum(
        ops.flash_attention(t[0], t[1], t[2], causal=True
                            ).astype(jnp.float32) ** 2))((qc, k, v))
    return (qc + 1e-4 * (g[0] + g[1] + g[2])).astype(jnp.bfloat16)

t_f = bench_probe._timed_scan(lambda qc: ops.flash_attention(
    qc, k, v, causal=True), q, n=8)
t_dq = bench_probe._timed_scan(g_dq, q, n=8)
t_dkv = bench_probe._timed_scan(g_dkv, q, n=8)
t_all = bench_probe._timed_scan(g_all, q, n=8)
print(f"fwd kernel          {t_f*1e3:6.2f}ms", flush=True)
print(f"fwd+dq              {t_dq*1e3:6.2f}ms  (dq ~ {(t_dq-t_f)*1e3:.2f})",
      flush=True)
print(f"fwd+dkv             {t_dkv*1e3:6.2f}ms  (dkv ~ {(t_dkv-t_f)*1e3:.2f})",
      flush=True)
print(f"fwd+dq+dkv          {t_all*1e3:6.2f}ms", flush=True)
print(f"probe {bench_probe.probe():.0f}", flush=True)
