"""Library (tiled stats + in-kernel scale + no-LSE primal) vs jax FA:
fwd and fwd+bwd, slope-timed, plus GQA and windowed shapes."""
import jax
import jax.numpy as jnp
import numpy as np

import bench_probe
from np_modeling_tpu import ops

b, h, s, d = 4, 8, 4096, 128
rng = np.random.default_rng(0)
mk = lambda hh=h: jnp.asarray(
    rng.standard_normal((b, hh, s, d), dtype=np.float32)).astype(jnp.bfloat16)
q, k, v = mk(), mk(), mk()
sc = 1.0 / (d ** 0.5)
attn_flops = 4 * b * h * s * s * d * 0.5

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
    "ours_fb": grad_of(lambda qc, kc, vc: ops.flash_attention(
        qc, kc, vc, causal=True)),
    "jax_fb_1024": grad_of(lambda qc, kc, vc: jfa.flash_attention(
        qc, kc, vc, causal=True, sm_scale=sc,
        block_sizes=jfa.BlockSizes(
            block_q=1024, block_k_major=1024, block_k=1024, block_b=1,
            block_q_major_dkv=1024, block_k_major_dkv=1024,
            block_k_dkv=1024, block_q_dkv=1024, block_k_major_dq=1024,
            block_k_dq=1024, block_q_dq=1024))),
}

probe = bench_probe.probe()
print(f"probe: {probe:.1f} TF/s")
res = {}
for name, f in cases.items():
    res[name] = bench_probe._timed_scan(f, q, n=4, n2=12)
    fl = attn_flops if "fwd" in name else 3.5 * attn_flops
    print(f"{name:12s} {res[name]*1e6:7.0f} us  {fl/res[name]/1e12:6.1f} "
          f"TF/s eff ({fl/res[name]/1e12/probe:.3f} of probe)")
print(f"fwd ratio jax/ours:    {res['jax_fwd']/res['ours_fwd']:.3f}")
print(f"fwdbwd ratio jax/ours: {res['jax_fb_1024']/res['ours_fb']:.3f}")
print(f"probe after: {bench_probe.probe():.1f} TF/s")
