"""Round-4 fwd-gap hunt, with the FIXED slope-timed harness.

lib (now with in-kernel scale + no-LSE primal) vs jax, plus standalone
variants probing the remaining difference: m-broadcast style, block
sizes, cost_estimate, grid order.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench_probe
from np_modeling_tpu import ops

MASK = -0.7 * float(np.finfo(np.float32).max)
b, h, s, d = 4, 8, 4096, 128
scale = 1.0 / (d ** 0.5)
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32)
                         ).astype(jnp.bfloat16)
q, k, v = mk(), mk(), mk()
attn_flops = 4 * b * h * s * s * d * 0.5

from jax.experimental.pallas.ops.tpu import flash_attention as jfa
jfa_bs = jfa.BlockSizes(block_q=1024, block_k_major=1024, block_k=1024,
                        block_b=1)


def make_fwd(bq, bkv, m_style="lane0", cost=True, emit_lse=False):
    """Standalone fwd kernel, in-kernel scale, no LSE (primal form).

    m_style: 'lane0' = subtract m_next[:, 0:1] (our kernel);
             'tile'  = subtract jnp.tile(m_next, bkv//128) (jax's kernel).
    """
    n_kv = s // bkv

    def tile(q_ref, k_ref, v_ref, o_ref, *rest):
        if emit_lse:
            lse_ref, m_scr, l_scr, acc_scr = rest
        else:
            m_scr, l_scr, acc_scr = rest
        q_idx, kv_idx = pl.program_id(2), pl.program_id(3)

        @pl.when(kv_idx == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, MASK)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        should_run = (q_idx + 1) * bq - 1 >= kv_idx * bkv

        @pl.when(should_run)
        def _run():
            qt = q_ref[0, 0]
            kt = k_ref[0, 0]
            st = jax.lax.dot_general(qt, kt, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            st = st * scale
            col = (jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
                   + kv_idx * bkv)
            row = (jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
                   + q_idx * bq)
            st = jnp.where(col <= row, st, MASK)
            m_prev, l_prev = m_scr[...], l_scr[...]
            m_curr = jnp.max(st, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            if m_style == "lane0":
                p = jnp.exp(st - m_next[:, 0:1])
            else:
                p = jnp.exp(st - jnp.tile(m_next, (1, bkv // 128)))
            l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
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
            if emit_lse:
                safe_l = jnp.where(l == 0.0, 1.0, l)
                rest[0][0, 0] = m_scr[...] + jnp.log(safe_l)

    def kv_map(ib, ih, iq, ik):
        return (ib, ih, jnp.minimum(ik, ((iq + 1) * bq - 1) // bkv), 0)

    out_shape = [jax.ShapeDtypeStruct((b, h, s, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, bq, d),
                              lambda ib, ih, iq, ik: (ib, ih, iq, 0))]
    if emit_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, h, s, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, bq, 128),
                                      lambda ib, ih, iq, ik: (ib, ih, iq, 0)))
    kw = {}
    if cost:
        kw["cost_estimate"] = pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=4 * q.size * 2,
            transcendentals=b * h * s * s)

    def fwd(qx):
        outs = pl.pallas_call(
            tile,
            grid=(b, h, s // bq, n_kv),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d),
                             lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
                pl.BlockSpec((1, 1, bkv, d), kv_map),
                pl.BlockSpec((1, 1, bkv, d), kv_map),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
            **kw,
        )(qx, k, v)
        return outs[0]
    return fwd


variants = {
    "lib": lambda qc: ops.flash_attention(qc, k, v, causal=True),
    "jax": lambda qc: jfa.flash_attention(qc, k, v, causal=True,
                                          sm_scale=scale,
                                          block_sizes=jfa_bs),
    "sa_1024": make_fwd(1024, 1024),
    "sa_1024_tile_m": make_fwd(1024, 1024, m_style="tile"),
    "sa_1024_nocost": make_fwd(1024, 1024, cost=False),
    "sa_512x1024": make_fwd(512, 1024),
    "sa_1024x512": make_fwd(1024, 512),
    "sa_512x512": make_fwd(512, 512),
    "sa_2048x1024": make_fwd(2048, 1024),
    "sa_256x1024": make_fwd(256, 1024),
}

if __name__ == "__main__":
    probe = bench_probe.probe()
    print(f"probe: {probe:.1f} TF/s")
    res = {}
    for name, f in variants.items():
        res[name] = bench_probe._timed_scan(f, q, n=4, n2=12)
        rj = f"jax/this: {res['jax']/res[name]:.3f}" if "jax" in res else ""
        print(f"{name:16s} {res[name]*1e6:7.0f} us  "
              f"{attn_flops/res[name]/1e12:6.1f} TF/s "
              f"({attn_flops/res[name]/1e12/probe:.3f} of probe)  " + rj)
    print(f"probe after: {bench_probe.probe():.1f} TF/s")
