"""True (RTT-corrected, unhoisted) state of the attention kernels.

Validates the fixed harness (matmul chain must now scale with n), then
measures: probe, ours-vs-jax flash fwd and fwd+bwd, and the attention-
shaped einsum ceilings — all in one process.
"""
import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from np_modeling_tpu import ops

b, h, s, d = 4, 8, 4096, 128
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32)
                         ).astype(jnp.bfloat16)
q, k, v = mk(), mk(), mk()
sc = 1.0 / (d ** 0.5)
attn_flops = 4 * b * h * s * s * d * 0.5

print(f"rtt: {bench_probe.rtt()*1e3:.1f} ms")

# Harness validation: unfoldable carry => the pure-matmul body must not
# hoist; slope equals the chained-harness truth (~6.3ms for 8192^3).
A8 = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.bfloat16)
t = bench_probe._timed_scan(lambda x: x @ A8, A8, n=2, n2=6)
print(f"8k matmul slope: {t*1e3:.2f} ms  ({2*8192**3/t/1e12:.1f} TF/s)")

probe = bench_probe.probe()
print(f"probe: {probe:.1f} TF/s")

from jax.experimental.pallas.ops.tpu import flash_attention as jfa
jfa_bs = jfa.BlockSizes(block_q=1024, block_k_major=1024, block_k=1024,
                        block_b=1)


def grad_of(fn):
    def run(qc):
        g = jax.grad(lambda t: jnp.sum(
            fn(t[0], t[1], t[2]).astype(jnp.float32) ** 2))((qc, k, v))
        return (qc + 0.0001 * (g[0] + g[1] + g[2])).astype(jnp.bfloat16)
    return run


cases = {
    "ours_fwd": lambda qc: ops.flash_attention(qc, k, v, causal=True),
    "jax_fwd": lambda qc: jfa.flash_attention(qc, k, v, causal=True,
                                              sm_scale=sc,
                                              block_sizes=jfa_bs),
    "ours_bwd": grad_of(lambda qc, kc, vc: ops.flash_attention(
        qc, kc, vc, causal=True)),
    "jax_bwd_def": grad_of(lambda qc, kc, vc: jfa.flash_attention(
        qc, kc, vc, causal=True, sm_scale=sc,
        block_sizes=jfa.BlockSizes.get_default(b, h, s, s, d))),
    "jax_bwd_1024": grad_of(lambda qc, kc, vc: jfa.flash_attention(
        qc, kc, vc, causal=True, sm_scale=sc,
        block_sizes=jfa.BlockSizes(
            block_q=1024, block_k_major=1024, block_k=1024, block_b=1,
            block_q_major_dkv=1024, block_k_major_dkv=1024,
            block_k_dkv=1024, block_q_dkv=1024, block_k_major_dq=1024,
            block_k_dq=1024, block_q_dq=1024))),
    "jax_bwd_512": grad_of(lambda qc, kc, vc: jfa.flash_attention(
        qc, kc, vc, causal=True, sm_scale=sc,
        block_sizes=jfa.BlockSizes(
            block_q=1024, block_k_major=1024, block_k=1024, block_b=1,
            block_q_major_dkv=512, block_k_major_dkv=512,
            block_k_dkv=512, block_q_dkv=512, block_k_major_dq=512,
            block_k_dq=512, block_q_dq=512))),
}

res = {}
for name, f in cases.items():
    res[name] = bench_probe._timed_scan(f, q, n=4, n2=12)
    flops = attn_flops if "fwd" in name else 3.5 * attn_flops
    print(f"{name:14s} {res[name]*1e6:7.0f} us  "
          f"{flops/res[name]/1e12:6.1f} TF/s eff "
          f"({flops/res[name]/1e12/probe:.3f} of probe)")

print(f"fwd ratio jax/ours: {res['jax_fwd']/res['ours_fwd']:.3f}")
best_jax_bwd = min(res["jax_bwd_def"], res["jax_bwd_1024"],
                   res["jax_bwd_512"])
print(f"bwd ratio best-jax/ours: {best_jax_bwd/res['ours_bwd']:.3f}")

# Attention-shaped einsum ceilings (now honest).
B32 = 32
for name, a_, b_, f in (
    ("qk 1024x1024x128", (B32, 1024, 128), (B32, 1024, 128),
     lambda a, c: jnp.einsum("bmk,bnk->bmn", a, c,
                             preferred_element_type=jnp.float32)),
    ("pv 1024x1024->128", (B32, 1024, 1024), (B32, 1024, 128),
     lambda a, c: jnp.einsum("bmk,bkn->bmn", a, c,
                             preferred_element_type=jnp.float32)),
):
    aa = jnp.asarray(rng.standard_normal(a_, dtype=np.float32)).astype(jnp.bfloat16)
    bb = jnp.asarray(rng.standard_normal(b_, dtype=np.float32)).astype(jnp.bfloat16)
    t = bench_probe._timed_scan(f, aa, bb, n=8, n2=24)
    fl = 2 * B32 * 1024 * 1024 * 128
    print(f"einsum {name:20s} {t*1e6:7.0f} us  {fl/t/1e12:6.1f} TF/s")

print(f"probe after: {bench_probe.probe():.1f} TF/s")
