"""Ablation study of the flash fwd kernel at the headline shape.

Standalone parametrized copies of the fwd tile so pieces can be removed /
replaced for TIMING (some variants are numerically wrong on purpose).
Everything compiled ONCE, then timed interleaved with probes in one process.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = -0.7 * float(np.finfo(np.float32).max)

b, h, s, d = 4, 8, 4096, 128
scale = 1.0 / (d ** 0.5)
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32)
                         ).astype(jnp.bfloat16)
q, k, v = mk(), mk(), mk()
attn_flops = 4 * b * h * s * s * d * 0.5


def make_fwd(bq, bkv, mask_mode="iota", do_exp=True, emit_lse=True,
             defer_norm=True):
    """mask_mode: 'iota' (current), 'cheap' (const base-iota vs scalar),
    'none' (WRONG math for timing)."""
    n_q, n_kv = s // bq, s // bkv

    def tile(q_ref, k_ref, v_ref, o_ref, *rest, **_):
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
            if mask_mode == "iota":
                col = (jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
                       + kv_idx * bkv)
                row = (jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
                       + q_idx * bq)
                st = jnp.where(col <= row, st, MASK)
            elif mask_mode == "cheap":
                # base = col - row is a compile-time-constant tile; the
                # per-tile threshold is a scalar. col<=row  <=>
                # base <= q_idx*bq - kv_idx*bkv.
                base = (jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
                        - jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0))
                st = jnp.where(base <= q_idx * bq - kv_idx * bkv, st, MASK)
            m_prev, l_prev = m_scr[...], l_scr[...]
            m_curr = jnp.max(st, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            if do_exp:
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(st - m_next[:, 0:1])
            else:                      # timing-only: exp -> add
                alpha = (m_prev - m_next) + 1.0
                p = st - m_next[:, 0:1]
            l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
            m_scr[...], l_scr[...] = m_next, l_next
            vt = v_ref[0, 0]
            if defer_norm:
                pv = jax.lax.dot_general(p.astype(vt.dtype), vt,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + pv
            else:
                l_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
                acc_scr[...] *= (alpha * l_prev * l_inv)[:, 0:1]
                pv = jax.lax.dot_general(p.astype(vt.dtype), vt,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                acc_scr[...] += pv * l_inv[:, 0:1]

        @pl.when(kv_idx == n_kv - 1)
        def _store():
            if defer_norm:
                l = l_scr[...]
                l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
                o_ref[0, 0] = (acc_scr[...] * l_inv[:, 0:1]).astype(o_ref.dtype)
            else:
                o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)
            if emit_lse:
                safe_l = jnp.where(l_scr[...] == 0.0, 1.0, l_scr[...])
                lse_ref[0, 0] = m_scr[...] + jnp.log(safe_l)

    def kv_map(ib, ih, iq, ik):
        return (ib, ih, jnp.minimum(ik, ((iq + 1) * bq - 1) // bkv), 0)

    out_shape = [jax.ShapeDtypeStruct((b, h, s, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, bq, d),
                              lambda ib, ih, iq, ik: (ib, ih, iq, 0))]
    if emit_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, h, s, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, bq, 128),
                                      lambda ib, ih, iq, ik: (ib, ih, iq, 0)))

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
        )((qx * scale).astype(qx.dtype), k, v)
        return outs[0]
    return fwd


def compile_timer(f, *args, n=8):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = f(*((a[0] + (c * 0).astype(a[0].dtype),) + a[1:]))
            return jnp.sum(out[..., 0, 0].astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return out

    float(run(*args))          # compile + warm

    def timed():
        t0 = time.perf_counter()
        float(run(*args))
        return (time.perf_counter() - t0) / n
    return timed


A = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.bfloat16)
probe_t = compile_timer(lambda x: x @ A, A, n=4)


def main():
    from np_modeling_tpu import ops
    variants = {
        "lib_current": compile_timer(
            lambda qc: ops.flash_attention(qc, k, v, causal=True), q),
        "standalone_iota": compile_timer(make_fwd(1024, 1024), q),
        "cheap_mask": compile_timer(make_fwd(1024, 1024, mask_mode="cheap"),
                                    q),
        "no_mask_TIMING": compile_timer(make_fwd(1024, 1024,
                                                 mask_mode="none"), q),
        "no_exp_TIMING": compile_timer(make_fwd(1024, 1024, do_exp=False), q),
        "no_lse": compile_timer(make_fwd(1024, 1024, emit_lse=False), q),
        "bq2048": compile_timer(make_fwd(2048, 1024), q),
        "bq512_bkv4096": compile_timer(make_fwd(512, 4096), q),
    }
    import statistics
    times = {name: [] for name in variants}
    probes = []
    for _ in range(3):
        probes.append(2 * 8192 ** 3 / probe_t() / 1e12)
        for name, t in variants.items():
            times[name].append(t())
    probes.append(2 * 8192 ** 3 / probe_t() / 1e12)
    pr = statistics.median(probes)
    print(f"probe: {pr:.1f} TF/s  (all {len(probes)} probes: "
          + " ".join(f"{x:.0f}" for x in probes) + ")")
    base = statistics.median(times["standalone_iota"])
    for name in variants:
        t = statistics.median(times[name])
        print(f"{name:22s} {t*1e6:7.0f} us  {attn_flops/t/1e12:6.1f} TF/s "
              f"({attn_flops/t/1e12/pr:.3f} of probe)  "
              f"vs standalone: {base/t:.3f}x")


if __name__ == "__main__":
    main()
